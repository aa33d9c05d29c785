#!/usr/bin/env python
"""Break down the 800x800 frame render cost on the real TPU.

Phases measured at production sizes (640k rays, 64 coarse + 192 merged
fine samples, fused Pallas kernels).  All timings hard-sync via a
device->host transfer (block_until_ready returns early on this backend —
see CLAUDE.md).  Prints are unbuffered-friendly (flush=True) so partial
results survive a timeout.
"""
from __future__ import annotations

import os
import sys
import time

# repo root on sys.path (do NOT use PYTHONPATH — it breaks the container's
# sitecustomize that registers the remote-TPU backend)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timeit(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
        sync(out if not isinstance(out, tuple) else out[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out if not isinstance(out, tuple) else out[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def log(msg):
    print(msg, flush=True)


def main():
    from nerf_pytorch_paeng_tpu.config import NerfConfig
    from nerf_pytorch_paeng_tpu.kernels.fused_mlp import (fused_mlp_eval,
                                                          fused_mlp_sigma,
                                                          pack_nerf_mlp_params)
    from nerf_pytorch_paeng_tpu.models import init_nerf
    from nerf_pytorch_paeng_tpu.ops.sampling import sample_pdf

    log(f"backend: {jax.default_backend()}")
    cfg = NerfConfig(near=2.0, far=6.0)
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))
    packed_c = jax.tree_util.tree_map(jnp.asarray, pack_nerf_mlp_params(
        params["coarse"]))
    packed_f = jax.tree_util.tree_map(jnp.asarray, pack_nerf_mlp_params(
        params["fine"]))

    N = 640 * 1024            # ~800x800
    SC, SF = 64, 128
    SM = SC + SF

    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)

    # ---- sampling glue variants (cheap compiles first) --------------------
    z_vals = jnp.sort(jnp.asarray(
        rng.uniform(2.0, 6.0, size=(N, SC)).astype(np.float32)), -1)
    w = jnp.asarray(rng.uniform(size=(N, SC)).astype(np.float32))

    def glue_old(z_vals, w, key):
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sample_pdf(key, z_mid, w[..., 1:-1], SF)
        return jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)

    t = timeit(jax.jit(glue_old), z_vals, w, key)
    log(f"glue OLD (sample_pdf + sort): {t*1e3:.1f} ms")

    # ---- composite + planes ------------------------------------------------
    from nerf_pytorch_paeng_tpu.ops.volume import volume_render_planar
    raw = jnp.asarray(rng.normal(size=(4, N, SM)).astype(np.float32))
    z_all = jnp.sort(jnp.asarray(
        rng.uniform(2.0, 6.0, size=(N, SM)).astype(np.float32)), -1)
    rays_d = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    t = timeit(jax.jit(lambda r, z, d: volume_render_planar(r, z, d).rgb),
               raw, z_all, rays_d)
    log(f"planar composite ({N/1e3:.0f}k x {SM}): {t*1e3:.1f} ms")
    del raw

    o_t = jnp.asarray(rng.normal(size=(3, N)).astype(np.float32))
    d_t = jnp.asarray(rng.normal(size=(3, N)).astype(np.float32))

    def planes(o_t, d_t, z):
        xp = (o_t[:, :, None] + d_t[:, :, None] * z[None]).reshape(3, -1)
        dp = jnp.broadcast_to(d_t[:, :, None],
                              (3, N, z.shape[-1])).reshape(3, -1)
        return xp, dp

    t = timeit(jax.jit(planes), o_t, d_t, z_all)
    log(f"plane construction ({N*SM/1e6:.0f}M pts): {t*1e3:.1f} ms")
    del z_all

    # ---- MLP kernels -------------------------------------------------------
    Pc = N * SC
    xp_c = jnp.asarray(rng.normal(size=(3, Pc)).astype(np.float32))
    f_sigma = jax.jit(lambda xp: fused_mlp_sigma(xp, packed_c, tile=8192,
                                                 out_dtype=jnp.bfloat16))
    t = timeit(f_sigma, xp_c)
    log(f"coarse sigma-only ({Pc/1e6:.0f}M pts): {t:.3f}s "
        f"({Pc*0.987e6/t/1e12:.0f} TFLOP/s)")
    del xp_c

    Pf = N * SM
    xp_f = jnp.asarray(rng.normal(size=(3, Pf)).astype(np.float32))
    dp_f = jnp.asarray(rng.normal(size=(3, Pf)).astype(np.float32))
    f_fine = jax.jit(lambda xp, dp: fused_mlp_eval(
        xp, dp, packed_f, tile=8192, out_dtype=jnp.bfloat16))
    t = timeit(f_fine, xp_f, dp_f)
    log(f"fine full MLP ({Pf/1e6:.0f}M pts): {t:.3f}s "
        f"({Pf*1.194e6/t/1e12:.0f} TFLOP/s)")
    del xp_f, dp_f

    # ---- full frame paths --------------------------------------------------
    from nerf_pytorch_paeng_tpu.eval.frame import make_frame_renderer
    H = W = 800
    K = np.array([[0.7 * W, 0, W / 2], [0, 0.7 * W, H / 2], [0, 0, 1]])
    c2w = jnp.asarray(np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.0]]),
                      jnp.float32)

    cfg_d = NerfConfig(near=2.0, far=6.0, chunk_rays=16384,
                       render_cull="none")
    render_d = make_frame_renderer(model, cfg_d, H, W, K, block_rays=16384)
    t = timeit(lambda: render_d(params, c2w, jax.random.PRNGKey(2)), reps=3)
    log(f"full frame DENSE (block 16384): {t:.3f}s")

    cfg_a = NerfConfig(near=2.0, far=6.0, chunk_rays=16384,
                       render_cull="auto")
    render_a = make_frame_renderer(model, cfg_a, H, W, K, block_rays=16384)
    t = timeit(lambda: render_a(params, c2w, jax.random.PRNGKey(2)), reps=3)
    log(f"full frame CULLED-auto (untrained model!): {t:.3f}s")


if __name__ == "__main__":
    main()
