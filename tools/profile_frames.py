#!/usr/bin/env python
"""Frame-level profile: fine MLP kernel + dense/culled 800x800 paths on a
fitted (trained-with-empties) model."""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timeit(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
        sync(out if not isinstance(out, (tuple, list)) else out[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out if not isinstance(out, (tuple, list)) else out[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def log(m):
    print(m, flush=True)


def main():
    from nerf_pytorch_paeng_tpu.config import NerfConfig
    from nerf_pytorch_paeng_tpu.eval.frame import make_frame_renderer
    from nerf_pytorch_paeng_tpu.kernels.fused_mlp import (fused_mlp_eval,
                                                          pack_nerf_mlp_params)
    from nerf_pytorch_paeng_tpu.models import init_nerf
    from nerf_pytorch_paeng_tpu.utils.synth import (fit_field_to_blob,
                                                    make_synth_scene)

    cfg = NerfConfig(near=2.0, far=6.0, chunk_rays=16384)
    model, p0 = init_nerf(cfg, jax.random.PRNGKey(0))
    t0 = time.time()
    params, fl = fit_field_to_blob(model, p0, jax.random.PRNGKey(1),
                                   n_steps=300, n_pts=8192)
    log(f"fit loss {fl:.4f} in {time.time()-t0:.0f}s")

    # fine MLP kernel alone at frame size
    N, SM = 640 * 1024, 192
    packed_f = jax.tree_util.tree_map(
        jnp.asarray, pack_nerf_mlp_params(params["fine"]))
    rng = np.random.default_rng(0)
    Pf = N * SM
    xp = jnp.asarray(rng.normal(size=(3, Pf)).astype(np.float32))
    dp = jnp.asarray(rng.normal(size=(3, Pf)).astype(np.float32))
    f_fine = jax.jit(lambda xp, dp: fused_mlp_eval(
        xp, dp, packed_f, tile=8192, out_dtype=jnp.bfloat16))
    t = timeit(f_fine, xp, dp)
    log(f"fine full MLP ({Pf/1e6:.0f}M pts): {t:.3f}s "
        f"({Pf*1.194e6/t/1e12:.0f} TFLOP/s)")
    del xp, dp

    # full frames on the fitted model
    H = W = 800
    focal = 0.9 * W
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])
    _, _, poses = make_synth_scene(n_views=1, H=8, W=8)
    c2w = jnp.asarray(poses[0][:3, :4])
    for rc in ("none", "auto"):
        r = make_frame_renderer(model, dataclasses.replace(cfg, render_cull=rc),
                                H, W, K, block_rays=16384)
        t = timeit(lambda: r(params, c2w, jax.random.PRNGKey(2)), reps=3)
        log(f"full frame 800x800 [{rc}] (fitted model): {t:.3f}s")


if __name__ == "__main__":
    main()
