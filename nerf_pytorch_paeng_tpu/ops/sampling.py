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


def sorted_uniform(key: jax.Array, shape) -> jnp.ndarray:
    """Sorted-uniform order statistics via normalised exponential spacings:
    u_k = (E_1+..+E_k) / (E_1+..+E_{n+1}), E ~ Exp(1).

    Distributionally identical to sorting iid uniforms, in O(S) work with
    no sort.  Feeding these to the monotone inverse-CDF in ``sample_pdf``
    yields *sorted* fine depths, which turns the coarse+fine depth merge
    (reference nerf_process.py:67's full sort) into a linear-time
    ``merge_sorted`` — the fine-sampling glue drops from a [N,192] bitonic
    sort to compare-count ranks."""
    n = shape[-1]
    e = jax.random.exponential(key, (*shape[:-1], n + 1), jnp.float32)
    s = jnp.cumsum(e, -1)
    return s[..., :-1] / s[..., -1:]


def merge_sorted(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Merge per-row sorted sequences: [N, SA] + [N, SB] -> [N, SA+SB].

    A bitonic *merge network*: [a‖+inf-pad, reverse(b) with +inf-pad in
    front] is a bitonic sequence, so log2(n) compare-exchange stages of
    elementwise min/max sort it — ~n·log(n) VPU work versus the full
    bitonic sort's n·log²(n) (XLA lowers jnp.sort to the full network; at
    [640k, 192] the merge is several times cheaper).  No gathers, no
    scatters, fixed shapes."""
    sa, sb = a.shape[-1], b.shape[-1]
    half = max(sa, sb)
    half = 1 << (half - 1).bit_length()              # next power of two
    n = 2 * half
    inf = jnp.full((*a.shape[:-1], 1), jnp.inf, a.dtype)
    asc = jnp.concatenate(
        [a, jnp.broadcast_to(inf, (*a.shape[:-1], half - sa))], -1)
    desc = jnp.concatenate(
        [jnp.broadcast_to(inf, (*b.shape[:-1], half - sb)),
         b[..., ::-1]], -1)
    x = jnp.concatenate([asc, desc], -1)             # bitonic, [N, n]
    lead = x.shape[:-1]
    d = half
    while d >= 1:
        y = x.reshape(*lead, n // (2 * d), 2, d)
        lo = jnp.minimum(y[..., 0, :], y[..., 1, :])
        hi = jnp.maximum(y[..., 0, :], y[..., 1, :])
        x = jnp.stack([lo, hi], -2).reshape(*lead, n)
        d //= 2
    return x[..., : sa + sb]


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
    """Inverse-CDF transform of caller-supplied u's (monotone in u, so
    sorted u -> sorted depths; see ``sorted_uniform``)."""
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
