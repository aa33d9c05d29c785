"""Stratified and hierarchical (inverse-CDF) z-sampling along rays.

Math parity targets:
- stratified: reference nerf_process.py:51-60 — 64 uniform bins in
  [near, far], each jittered uniformly (the reference jitters coarse samples
  unconditionally; `perturb` only controls the fine pass).
- hierarchical: reference nerf_process.py:144-182 (sample_pdf) — piecewise-
  linear inverse-CDF over detached coarse weights, `searchsorted` right.

All shapes are static; randomness is explicit via PRNG keys.  The batched
searchsorted lowers to a fully-vectorised binary search on TPU (no gather
loops), and everything here fuses into the surrounding jit program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_z_vals(key: jax.Array, n_rays: int, near: float, far: float,
                      n_samples: int, perturb: bool = True) -> jnp.ndarray:
    """[n_rays, n_samples] jittered (or uniform) depths in [near, far]."""
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
    z = near * (1.0 - t) + far * t                          # [S]
    z = jnp.broadcast_to(z, (n_rays, n_samples))
    if not perturb:
        return z
    mids = 0.5 * (z[..., 1:] + z[..., :-1])
    upper = jnp.concatenate([mids, z[..., -1:]], -1)
    lower = jnp.concatenate([z[..., :1], mids], -1)
    u = jax.random.uniform(key, (n_rays, n_samples), dtype=jnp.float32)
    return lower + (upper - lower) * u


def sample_pdf(key: jax.Array, bins: jnp.ndarray, weights: jnp.ndarray,
               n_samples: int, det: bool = False) -> jnp.ndarray:
    """Inverse-CDF sample ``n_samples`` depths from a per-ray histogram.

    Args:
      bins:    [N, B] bin edge positions (coarse z midpoints).
      weights: [N, B-1] unnormalised bin masses (coarse weights[1:-1]).
      det:     deterministic linspace u's instead of uniform randoms.
    Returns:
      [N, n_samples] sampled depths.
    """
    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
        u = jnp.broadcast_to(u, (*weights.shape[:-1], n_samples))
    else:
        u = jax.random.uniform(key, (*weights.shape[:-1], n_samples),
                               dtype=jnp.float32)
    return sample_pdf_from_u(bins, weights, u)


def sample_pdf_from_u(bins: jnp.ndarray, weights: jnp.ndarray,
                      u: jnp.ndarray) -> jnp.ndarray:
    """Inverse-CDF transform of caller-supplied u's."""
    weights = weights + 1e-5                                 # avoid nans
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [N, B]

    # CDF inversion without gathers.  TPU gathers (take_along_axis) cost
    # ~100ms at [16k, 128] and a vmapped binary search is worse; instead,
    # since the bin count B = N_samples_c+1 is small, do everything as
    # broadcast compares + reductions over a [N, S_f, B] tensor:
    #   inds  = #{j : cdf[j] <= u}          (searchsorted right)
    #   x_b   = Σ_j x[j]·[j == below]        (one-hot contraction)
    # This is pure VPU work (~1ms at the same size).
    B = cdf.shape[-1]
    le = (cdf[..., None, :] <= u[..., :, None])          # [N, S_f, B]
    inds = jnp.sum(le.astype(jnp.int32), axis=-1)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(B - 1, inds)

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, B), 2)
    oh_b = (below[..., None] == iota)                     # [N, S_f, B]
    oh_a = (above[..., None] == iota)

    def pick(vals, onehot):
        return jnp.sum(jnp.where(onehot, vals[..., None, :], 0.0), axis=-1)

    cdf_b = pick(cdf, oh_b)
    cdf_a = pick(cdf, oh_a)
    bins_b = pick(bins, oh_b)
    bins_a = pick(bins, oh_a)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)
