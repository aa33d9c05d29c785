#!/usr/bin/env python
"""A/B the FINE-phase support-row gating (cfg.render_gate_fine;
eval/frame._gated_fine_rays) on the bench render scenes (real TPU):
production culled renderer (render_precull auto in BOTH arms) with
render_gate_fine on vs off, per scene — isolating the phase-2 gate.

Timing per CLAUDE.md: pipelined dispatch, hard sync via value fetch,
best-of-reps, warm with the exact keys the timed reps use.
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _note(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def _sync(x):
    return float(jnp.asarray(x).ravel()[0])


def main():
    sys.path.insert(0, "/root/repo")
    from nerf_pytorch_paeng_tpu.utils.compile_cache import (
        enable_persistent_compile_cache)
    enable_persistent_compile_cache()
    from bench import _train_blob_model
    from nerf_pytorch_paeng_tpu.config import NerfConfig
    from nerf_pytorch_paeng_tpu.eval.frame import (_pack_for_eval,
                                                   _support_for_eval,
                                                   get_frame_renderer)

    H = W = 800
    reps = 3
    cfg = NerfConfig(near=2.0, far=6.0)
    focal = 0.9 * W
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])

    scenes = {}
    model, params, poses, fl = _train_blob_model(cfg)
    scenes["std"] = (model, params)
    _, params_hi, _, fl_hi = _train_blob_model(cfg, blob_r=0.54,
                                               blob_cutoff=1.62)
    scenes["hi"] = (model, params_hi)
    _, params_hard, _, fl_hard = _train_blob_model(
        cfg, n_steps=1500, blob_amp=60.0, blob_hard_w=0.08)
    scenes["hard"] = (model, params_hard)
    _note(f"fits: std={fl:.4f} hi={fl_hi:.4f} hard={fl_hard:.4f}")
    c2w = jnp.asarray(poses[0][:3, :4])

    for name, (model, prm) in scenes.items():
        frames = {}
        for gf in ("off", "auto"):
            r = get_frame_renderer(
                model, dataclasses.replace(cfg, render_gate_fine=gf),
                H, W, K)
            for i in range(reps):
                rgb, disp = r(prm, c2w, jax.random.PRNGKey(2 + i))
            _sync(rgb)
            times = []
            for i in range(reps):
                t0 = time.perf_counter()
                rgb, disp = r(prm, c2w, jax.random.PRNGKey(2 + i))
                _sync(rgb)
                times.append(time.perf_counter() - t0)
            frames[gf] = np.asarray(rgb)
            print(f"{name} gate_fine={gf:4s}: {min(times)*1e3:7.1f} ms "
                  f"(mean rgb {float(jnp.mean(rgb)):.4f})", flush=True)
        mse = float(np.mean((frames["off"] - frames["auto"]) ** 2))
        psnr = -10 * np.log10(max(mse, 1e-12))
        packed = _pack_for_eval(prm, cfg)
        _, fvalid = _support_for_eval(model, packed, cfg, module="fine")
        print(f"{name} agreement(auto vs off) {psnr:.1f} dB, "
              f"fine bounds valid={fvalid}", flush=True)


if __name__ == "__main__":
    main()
