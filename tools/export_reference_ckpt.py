#!/usr/bin/env python
"""Export one of this framework's orbax checkpoints to the reference's
``*.pth.tar`` format (``{'idx', 'model_state_dict', 'optimizer_state_dict'}``,
reference train.py:105-114), loadable by the reference's resume path
(reference main.py:111-116) or any torch tooling built around it.

Usage:
  python tools/export_reference_ckpt.py --log_dir logs --exp_name lego \
      --step 200000 [--out lego_200000.pth.tar]
"""
from __future__ import annotations

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--log_dir", default="logs")
    ap.add_argument("--exp_name", required=True)
    ap.add_argument("--step", type=int, required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax
    # checkpoint conversion is pure host work — don't touch (or wait on)
    # the TPU backend; a later restore device_puts onto whatever is live
    jax.config.update("jax_platforms", "cpu")
    import torch

    from nerf_pytorch_paeng_tpu.config import NerfConfig, config_from_file
    from nerf_pytorch_paeng_tpu.models import init_nerf
    from nerf_pytorch_paeng_tpu.train.checkpoint import restore_checkpoint
    from nerf_pytorch_paeng_tpu.train.state import TrainState, make_optimizer
    from nerf_pytorch_paeng_tpu.utils.interop import (
        reference_checkpoint_from_train_state)

    cfg = (config_from_file(args.config) if args.config
           else NerfConfig(near=2.0, far=6.0))
    _, params0 = init_nerf(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg)
    template = TrainState(jax.numpy.zeros((), jax.numpy.int32), params0,
                          tx.init(params0))
    state = restore_checkpoint(args.log_dir, args.exp_name, args.step,
                               template)

    ckpt = reference_checkpoint_from_train_state(state, cfg)
    tensorify = lambda d: {k: torch.from_numpy(v) for k, v in d.items()}
    out_ckpt = {
        "idx": ckpt["idx"],
        "model_state_dict": tensorify(ckpt["model_state_dict"]),
    }
    osd = ckpt["optimizer_state_dict"]
    if osd:
        out_ckpt["optimizer_state_dict"] = {
            "state": {i: {"step": torch.from_numpy(s["step"].reshape(())),
                          "exp_avg": torch.from_numpy(s["exp_avg"]),
                          "exp_avg_sq": torch.from_numpy(s["exp_avg_sq"])}
                      for i, s in osd["state"].items()},
            "param_groups": osd["param_groups"],
        }

    out = args.out or f"{args.exp_name}_{args.step}.pth.tar"
    torch.save(out_ckpt, out)
    print(f"exported step={ckpt['idx']} -> {out}")
    return out


if __name__ == "__main__":
    main()
