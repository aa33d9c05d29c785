#!/usr/bin/env python
"""A/B the phase-0 support-bounds pre-cull on the bench render scenes
(real TPU): culled renderer with render_precull on vs off, per scene.

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
    from nerf_pytorch_paeng_tpu.eval.frame import (_support_for_eval,
                                                   get_frame_renderer)
    from nerf_pytorch_paeng_tpu.ops.occupancy import ray_hits_bounds
    from nerf_pytorch_paeng_tpu.ops.rays import get_rays

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
        for pre in (False, True):
            r = get_frame_renderer(
                model, dataclasses.replace(cfg, render_precull=pre), H, W, K)
            for i in range(reps):
                rgb, disp = r(prm, c2w, jax.random.PRNGKey(2 + i))
            _sync(rgb)
            times = []
            for i in range(reps):
                t0 = time.perf_counter()
                rgb, disp = r(prm, c2w, jax.random.PRNGKey(2 + i))
                _sync(rgb)
                times.append(time.perf_counter() - t0)
            print(f"{name} precull={int(pre)}: {min(times)*1e3:7.1f} ms "
                  f"(mean rgb {float(jnp.mean(rgb)):.4f})", flush=True)
        # miss fraction + guard: precull frame vs tau-cull frame PSNR
        # delta.  stratified=False for the comparison renderers — the two
        # paths draw coarse jitter from different fold_in streams, so a
        # stratified comparison would only measure Monte-Carlo noise.
        from nerf_pytorch_paeng_tpu.eval.frame import (_pack_for_eval,
                                                       _precull_half)
        from nerf_pytorch_paeng_tpu.ops.occupancy import segment_in_cube
        packed = _pack_for_eval(prm, cfg)
        bounds, valid = _support_for_eval(model, packed, cfg)
        ro, rd = get_rays(H, W, jnp.asarray(K, jnp.float32), c2w)
        ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
        hit = np.asarray(ray_hits_bounds(ro, rd, *bounds, 2.0, 6.0)
                         | ~segment_in_cube(ro, rd, _precull_half(cfg),
                                            2.0, 6.0))
        r_off = get_frame_renderer(
            model, dataclasses.replace(cfg, render_precull=False), H, W, K,
            stratified=False)
        r_on = get_frame_renderer(
            model, dataclasses.replace(cfg, render_precull=True), H, W, K,
            stratified=False)
        k = jax.random.PRNGKey(2)
        a = np.asarray(r_off(prm, c2w, k)[0])
        b = np.asarray(r_on(prm, c2w, k)[0])
        mse = float(np.mean((a - b) ** 2))
        d_db = -10 * np.log10(max(mse, 1e-12))

        # replicate the gated phase-1 gate construction host-side to
        # report the fraction of (ray-tile, sample-row) coarse MLP grid
        # steps the row-granular gate skips (eval/frame._gated_sigma_t)
        from nerf_pytorch_paeng_tpu.eval.frame import (_GATE_S_ROWS,
                                                       _rays_tiling,
                                                       _row_envelopes)
        from nerf_pytorch_paeng_tpu.ops.occupancy import ray_support_interval
        s = cfg.N_samples_c
        n_rows = s // _GATE_S_ROWS
        t_lo, t_hi = ray_support_interval(ro, rd, *bounds, cfg.near, cfg.far)
        inside = segment_in_cube(ro, rd, _precull_half(cfg),
                                 cfg.near, cfg.far)
        t_lo = jnp.where(inside, t_lo, cfg.near)
        t_hi = jnp.where(inside, t_hi, cfg.far)
        row_lo, row_hi = _row_envelopes(cfg.near, cfg.far, s, _GATE_S_ROWS)
        act = np.asarray((t_lo[:, None] <= row_hi[None])
                         & (t_hi[:, None] >= row_lo[None]))
        any_act = act.any(1)
        first = act.argmax(1)
        last = (n_rows - 1) - act[:, ::-1].argmax(1)
        span = np.where(any_act, first * (n_rows + 1) + last,
                        n_rows * (n_rows + 2))
        order = np.argsort(span, kind="stable")
        m = act.shape[0]
        tile, pm = _rays_tiling(m)
        act_s = np.zeros((pm, n_rows), bool)
        act_s[:m] = act[order]
        gate = act_s.reshape(pm // tile, tile, n_rows).any(1)
        print(f"{name}: valid={valid} "
              f"miss={float((~hit).mean()):.3f} "
              f"row-steps gated {float(1 - gate.mean()):.3f} "
              f"(per-ray rows active {float(act.mean()):.3f}) "
              f"precull-vs-cull agreement {d_db:.1f} dB", flush=True)


if __name__ == "__main__":
    main()
