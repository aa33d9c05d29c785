#!/usr/bin/env python
"""Import a reference-format checkpoint (``*.pth.tar``) into this
framework's orbax checkpoint layout.

The reference saves ``{'idx', 'model_state_dict', 'optimizer_state_dict'}``
(reference train.py:105-114).  This converts it — Adam moments included,
so training continues exactly where the torch run stopped — and writes
``<log_dir>/<exp_name>/<exp_name>_<idx>.ckpt``, ready for
``main.py --config ... --iter_start <idx>`` or ``--eval_only/--render_only
--testing_idx <idx>``.

Usage:
  python tools/import_reference_ckpt.py ckpt.pth.tar \
      --config configs/blender/lego.txt --log_dir logs --exp_name lego
"""
from __future__ import annotations

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", help="reference *.pth.tar checkpoint")
    ap.add_argument("--config", default=None,
                    help="config file (sets the optimizer/schedule the "
                         "imported Adam state continues under)")
    ap.add_argument("--log_dir", default="logs")
    ap.add_argument("--exp_name", required=True)
    args = ap.parse_args(argv)

    import jax
    # checkpoint conversion is pure host work — don't touch (or wait on)
    # the TPU backend; a later restore device_puts onto whatever is live
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import torch

    from nerf_pytorch_paeng_tpu.config import NerfConfig, config_from_file
    from nerf_pytorch_paeng_tpu.train.checkpoint import save_checkpoint
    from nerf_pytorch_paeng_tpu.utils.interop import (
        train_state_from_reference_checkpoint)

    cfg = (config_from_file(args.config) if args.config
           else NerfConfig(near=2.0, far=6.0))

    raw = torch.load(args.ckpt, map_location="cpu")
    to_np = lambda t: (t.detach().numpy() if torch.is_tensor(t) else t)
    ckpt = {
        "idx": int(raw.get("idx", 0)),
        "model_state_dict": {k: to_np(v)
                             for k, v in raw["model_state_dict"].items()},
    }
    opt_sd = raw.get("optimizer_state_dict")
    if opt_sd:
        ckpt["optimizer_state_dict"] = {
            "state": {i: {k: to_np(v) for k, v in s.items()}
                      for i, s in opt_sd.get("state", {}).items()},
            "param_groups": opt_sd.get("param_groups", []),
        }

    state = train_state_from_reference_checkpoint(ckpt, cfg)
    path = save_checkpoint(args.log_dir, args.exp_name, state)
    n = sum(np.asarray(p).size
            for p in jax.tree_util.tree_leaves(state.params))
    print(f"imported step={int(state.step)} ({n/1e6:.2f}M params, "
          f"adam moments: {'yes' if opt_sd else 'no'}) -> {path}")
    return path


if __name__ == "__main__":
    main()
