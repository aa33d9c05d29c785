#!/usr/bin/env python
"""Micro-profile: plane construction variants + sample_pdf reformulation.

Findings feed ops/render.py + ops/sampling.py; see tools/profile_render.py
for the end-to-end frame breakdown.
"""
from __future__ import annotations

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
    N, S = 640 * 1024, 192
    rng = np.random.default_rng(0)
    o_t = jnp.asarray(rng.normal(size=(3, N)).astype(np.float32))
    d_t = jnp.asarray(rng.normal(size=(3, N)).astype(np.float32))
    z = jnp.sort(jnp.asarray(
        rng.uniform(2.0, 6.0, size=(N, S)).astype(np.float32)), -1)

    def planes_current(o_t, d_t, z):
        xp = (o_t[:, :, None] + d_t[:, :, None] * z[None]).reshape(3, -1)
        dp = jnp.broadcast_to(d_t[:, :, None], (3, N, S)).reshape(3, -1)
        return xp, dp

    t = timeit(jax.jit(planes_current), o_t, d_t, z)
    log(f"planes current (xp+dp): {t*1e3:.1f} ms")

    def xp_only(o_t, d_t, z):
        return (o_t[:, :, None] + d_t[:, :, None] * z[None]).reshape(3, -1)

    t = timeit(jax.jit(xp_only), o_t, d_t, z)
    log(f"xp only: {t*1e3:.1f} ms")

    def dp_only(d_t):
        return jnp.broadcast_to(d_t[:, :, None], (3, N, S)).reshape(3, -1)

    t = timeit(jax.jit(dp_only), d_t)
    log(f"dp only (broadcast+reshape): {t*1e3:.1f} ms")

    def dp_rep(d_t):
        return jnp.repeat(d_t, S, axis=1)

    t = timeit(jax.jit(dp_rep), d_t)
    log(f"dp via repeat: {t*1e3:.1f} ms")

    # row-planes: three separate [N, S] outputs per coordinate
    def planes_rows(o_t, d_t, z):
        return tuple(o_t[c][:, None] + d_t[c][:, None] * z for c in range(3))

    t = timeit(jax.jit(planes_rows), o_t, d_t, z)
    log(f"xp as 3x[N,S] rows: {t*1e3:.1f} ms")

    # ray-major [N, S] per coord, then one stack+reshape
    def planes_stack(o_t, d_t, z):
        rows = [o_t[c][:, None] + d_t[c][:, None] * z for c in range(3)]
        return jnp.stack(rows, 0).reshape(3, -1)

    t = timeit(jax.jit(planes_stack), o_t, d_t, z)
    log(f"xp rows+stack: {t*1e3:.1f} ms")

    # sort for reference
    t = timeit(jax.jit(lambda z: jnp.sort(z, -1)), z)
    log(f"jnp.sort [640k,{S}]: {t*1e3:.1f} ms")

    # ---- sample_pdf: current vs Abel-contraction reformulation ----------
    from nerf_pytorch_paeng_tpu.ops.sampling import sample_pdf_from_u
    SC, SF = 64, 128
    zc = jnp.sort(jnp.asarray(
        rng.uniform(2.0, 6.0, size=(N, SC)).astype(np.float32)), -1)
    w = jnp.asarray(rng.uniform(size=(N, SC - 2)).astype(np.float32))
    bins = 0.5 * (zc[:, 1:] + zc[:, :-1])
    u = jax.random.uniform(jax.random.PRNGKey(0), (N, SF), jnp.float32)

    t = timeit(jax.jit(sample_pdf_from_u), bins, w, u)
    log(f"sample_pdf_from_u current: {t*1e3:.1f} ms")

    def sample_pdf_abel(bins, weights, u):
        weights = weights + 1e-5
        pdf = weights / jnp.sum(weights, -1, keepdims=True)
        cdf = jnp.cumsum(pdf, -1)
        cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)
        B = cdf.shape[-1]
        le = (cdf[..., None, :] <= u[..., :, None])        # [N, SF, B] bool
        # Abel summation over the SHARED compare tensor: with below =
        # (#j: le_j) - 1, Σ_{j<=below} x_j picks values by telescoping:
        #   v[below] via x = [v_0, diff(v)]
        #   v[above] via x = [v_1, diff(v)[1:], 0]  (above = min(below+1, B-1))
        dv = lambda v: jnp.concatenate([v[..., :1], jnp.diff(v, axis=-1)], -1)
        av = lambda v: jnp.concatenate([v[..., 1:2],
                                        jnp.diff(v, axis=-1)[..., 1:],
                                        jnp.zeros_like(v[..., :1])], -1)
        D = jnp.stack([dv(cdf), av(cdf), dv(bins), av(bins)], -1)  # [N,B,4]
        picks = jnp.einsum("nsb,nbk->nsk", le.astype(jnp.float32), D)
        cdf_b, cdf_a, bins_b, bins_a = (picks[..., 0], picks[..., 1],
                                        picks[..., 2], picks[..., 3])
        denom = cdf_a - cdf_b
        denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
        tt = (u - cdf_b) / denom
        return bins_b + tt * (bins_a - bins_b)

    t = timeit(jax.jit(sample_pdf_abel), bins, w, u)
    log(f"sample_pdf ABEL einsum: {t*1e3:.1f} ms")

    a = jax.jit(sample_pdf_abel)(bins[:2048], w[:2048], u[:2048])
    b = jax.jit(sample_pdf_from_u)(bins[:2048], w[:2048], u[:2048])
    log(f"abel-vs-current max err: {float(jnp.max(jnp.abs(a - b))):.2e}")


if __name__ == "__main__":
    main()
