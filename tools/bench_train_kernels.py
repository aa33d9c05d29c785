#!/usr/bin/env python
"""Tile sweep for the ray-major training kernels (fwd eval_rays, bwd).

The trace shows fwd at ~160-162 TF/s (tile_rays=2048) vs bwd at 177-179;
the eval path reaches ~164 at tile 8192 — so the fwd tile is suspect.
Times fwd-only and bwd-only per tile with a long pipelined loop (inner=50)
so the one hard sync amortises to ~0.5 ms.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FLOPS_PER_PT = 2 * (64 * 256 + 6 * 256 * 256 + (64 + 256) * 256
                    + 8 * 256 + 256 * 256 + (256 + 32) * 128 + 8 * 128)


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timeit(fn, *args, reps=3, inner=50):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        sync(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) / inner


def main():
    from nerf_pytorch_paeng_tpu.config import NerfConfig
    from nerf_pytorch_paeng_tpu.kernels.fused_mlp import (
        fused_mlp_eval_rays, pack_nerf_mlp_params)
    from nerf_pytorch_paeng_tpu.kernels.fused_mlp_vjp import _bwd_rays_call
    from nerf_pytorch_paeng_tpu.models import init_nerf

    cfg = NerfConfig(near=2.0, far=6.0)
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))
    packed = pack_nerf_mlp_params(params["fine"], L_x=10, L_d=4)
    N, S = 4096, 192
    rng = np.random.default_rng(0)
    od = jnp.asarray(rng.normal(size=(8, N)), jnp.float32)
    z = jnp.sort(jnp.asarray(
        rng.uniform(2.0, 6.0, size=(S, N)).astype(np.float32)), 0)
    g = [jnp.asarray(rng.normal(size=(S, N)), jnp.float32) for _ in range(4)]
    flop_f = FLOPS_PER_PT * N * S
    flop_b = 3 * flop_f

    for tile in (1024, 2048, 4096):
        for s_rows in ((8, 16) if tile <= 4096 else (8,)):
            if S % s_rows:
                continue
            f = jax.jit(lambda od, z, t=tile, sr=s_rows: fused_mlp_eval_rays(
                od, z, packed, L_x=10, L_d=4, tile_rays=t, s_rows=sr))
            try:
                t_f = timeit(f, od, z)
                print(f"fwd  tile={tile:5d} s_rows={s_rows:2d}: "
                      f"{t_f*1e3:6.2f} ms  {flop_f/t_f/1e12:6.1f} TF/s",
                      flush=True)
            except Exception as e:
                print(f"fwd  tile={tile} s_rows={s_rows}: FAILED "
                      f"{type(e).__name__}", flush=True)

    for tile in (1024, 2048, 4096):
        b = jax.jit(lambda od, z, gr, gg, gb, gs, t=tile: _bwd_rays_call(
            od, z, gr, gg, gb, gs, packed, 10, 4, t))
        try:
            t_b = timeit(b, od, z, *g)
            print(f"bwd  tile={tile:5d}:            "
                  f"{t_b*1e3:6.2f} ms  {flop_b/t_b/1e12:6.1f} TF/s",
                  flush=True)
        except Exception as e:
            print(f"bwd  tile={tile}: FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
