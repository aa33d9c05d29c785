#!/usr/bin/env python
"""Sweep sample-row unroll (s_rows) and ray-tile for the EVAL ray-major
kernels (kernels/fused_mlp.fused_mlp_sigma_rays / fused_mlp_eval_rays).

Context: the training forward kernels measured 16-row unrolls faster than
8 (tools/bench_train_kernels.py: 6.09 vs 6.39 ms at 192x4096); the eval
kernels were left at 8.  This sweep checks whether the win transfers at
frame-render shapes (131072 rays per block).

Timing per CLAUDE.md: pipelined dispatches, ONE hard sync (device->host
value fetch) per rep, best of reps.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from nerf_pytorch_paeng_tpu.kernels.fused_mlp import (
    fused_mlp_eval_rays, fused_mlp_sigma_rays, pack_nerf_mlp_params)
from nerf_pytorch_paeng_tpu.config import NerfConfig
from nerf_pytorch_paeng_tpu.models import init_nerf

N = 131072          # frame-renderer block size
REPS = 20


def _sync(x):
    return float(jnp.asarray(x).ravel()[0])


def bench(fn, *args, **kw):
    f = jax.jit(lambda *a: fn(*a, **kw))
    out = f(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = f(*args)
        _sync(out[0] if isinstance(out, tuple) else out)
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best * 1e3  # ms


def main():
    cfg = NerfConfig(near=2.0, far=6.0)
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))
    packed = pack_nerf_mlp_params(params["coarse"])
    packed = {k: jnp.asarray(v) for k, v in packed.items()}

    rng = np.random.default_rng(0)
    od = jnp.asarray(rng.normal(size=(8, N)), jnp.float32)

    for s in (64, 192):
        z = jnp.asarray(np.sort(rng.uniform(2, 6, size=(s, N)), 0),
                        jnp.float32)
        for tile in (4096, 8192):
            for s_rows in (8, 16, 32):
                if s % s_rows:
                    continue
                try:
                    t_sig = bench(fused_mlp_sigma_rays, od, z, packed,
                                  tile_rays=tile, s_rows=s_rows,
                                  out_dtype=jnp.bfloat16)
                except Exception as e:
                    print(f"S={s} tile={tile} rows={s_rows} sigma FAILED "
                          f"{type(e).__name__}", flush=True)
                    t_sig = float("nan")
                try:
                    t_ev = bench(fused_mlp_eval_rays, od, z, packed,
                                 tile_rays=tile, s_rows=s_rows,
                                 out_dtype=jnp.bfloat16)
                except Exception as e:
                    print(f"S={s} tile={tile} rows={s_rows} eval FAILED "
                          f"{type(e).__name__}", flush=True)
                    t_ev = float("nan")
                print(f"S={s:3d} tile={tile:5d} rows={s_rows:2d}  "
                      f"sigma {t_sig:7.2f} ms   eval {t_ev:7.2f} ms",
                      flush=True)


if __name__ == "__main__":
    main()
