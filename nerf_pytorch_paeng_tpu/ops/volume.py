"""Volume rendering (alpha compositing) of raw network outputs.

Math parity target: reference nerf_process.py:89-140 (post_process):
- dists = Δz with a 1e10 cap for the last bin, scaled by ||ray_d||,
- α = 1 - exp(-relu(σ)·dist),
- transmittance = exclusive cumprod of (1-α+1e-10),
- rgb = Σ w·sigmoid(c); the white-background composite ``rgb + (1-acc)``
  is unconditional in the reference, so it is unconditional here too,
- disparity = 1/max(1e-10, depth/acc) with NaN→0 and a clamp at 5.0; we
  compute it NaN-free by construction (_disp_from guards the acc==0
  division) and reproduce the reference exactly for every acc > 0 —
  including denormal-small acc, where flooring acc before the divide
  (an earlier refactor) silently clamped instead.

The compositing pipeline is shared across the ray-major ([N, S], scan on
the last axis) and sample-major ([S, N], scan on axis 0 — the ray-major
kernels' native layout) variants via axis-parametric helpers, so a
numerical fix lands once.

The transmittance scan is available in two forms: ``cumprod`` (default,
what XLA fuses best on a single chip) and a log-space
``jax.lax.associative_scan`` (``scan_impl='associative'``) which parallelises
over the sample axis — the TPU-native analog of sequence parallelism when
the sample axis itself is sharded across a mesh axis.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

DISP_CLAMP = 5.0


class RenderOutputs(NamedTuple):
    rgb: jnp.ndarray       # [N, 3]
    disp: jnp.ndarray      # [N]
    acc: jnp.ndarray       # [N]
    weights: jnp.ndarray   # [N, S]
    depth: jnp.ndarray     # [N]


class RenderOutputsT(NamedTuple):
    """RenderOutputs with sample-major ``weights`` — the ray-major kernels'
    native layout (everything else matches RenderOutputs)."""
    rgb: jnp.ndarray       # [N, 3]
    disp: jnp.ndarray      # [N]
    acc: jnp.ndarray       # [N]
    weights: jnp.ndarray   # [S, N] (transposed!)
    depth: jnp.ndarray     # [N]


def exclusive_cumprod(x: jnp.ndarray, scan_impl: str = "cumprod",
                      axis: int = -1) -> jnp.ndarray:
    """Exclusive product along ``axis``: out[i] = prod(x[:i]), out[0]=1."""
    if scan_impl == "associative":
        # log-space associative scan: shards cleanly over the sample axis.
        # Clamp before the log: callers pass x = 1 - alpha + 1e-10, which
        # XLA may reassociate into exactly 0 at alpha == 1 (log(0) = -inf).
        logs = jnp.log(jnp.maximum(x, 1e-10))
        inc = jax.lax.associative_scan(jnp.add, logs, axis=axis)
        return jnp.exp(inc - logs)
    ones = jnp.ones_like(jax.lax.slice_in_dim(x, 0, 1, axis=axis))
    prod = jnp.cumprod(jnp.concatenate([ones, x], axis), axis)
    return jax.lax.slice_in_dim(prod, 0, x.shape[axis], axis=axis)


def _dists(z_vals: jnp.ndarray, rays_d: jnp.ndarray,
           axis: int) -> jnp.ndarray:
    """Δz with the 1e10 last-bin cap, scaled by ||ray_d|| (reference
    nerf_process.py:93-101).  ``axis`` is the sample axis of z_vals:
    -1 for [N, S], 0 for the sample-major [S, N]."""
    n = z_vals.shape[axis]
    d = (jax.lax.slice_in_dim(z_vals, 1, n, axis=axis)
         - jax.lax.slice_in_dim(z_vals, 0, n - 1, axis=axis))
    last = jnp.full_like(jax.lax.slice_in_dim(d, 0, 1, axis=axis), 1e10)
    d = jnp.concatenate([d, last], axis)
    norm = jnp.linalg.norm(rays_d, axis=-1)
    return d * (norm[None] if axis == 0 else norm[..., None])


def _weights(sigma: jnp.ndarray, z_vals: jnp.ndarray, rays_d: jnp.ndarray,
             scan_impl: str, axis: int) -> jnp.ndarray:
    """alpha compositing weights from density logits (pre-relu)."""
    dists = _dists(z_vals, rays_d, axis)
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma.astype(jnp.float32)) * dists)
    return alpha * exclusive_cumprod(1.0 - alpha + 1e-10, scan_impl, axis)


def _disp_from(depth_map: jnp.ndarray, acc_map: jnp.ndarray) -> jnp.ndarray:
    """Reference-exact disparity: 1/max(1e-10, depth/acc), clamped at
    DISP_CLAMP, with the reference's acc==0 NaN patched to 0 (computed
    NaN-free here by substituting a safe denominator before the select).
    The divide uses acc itself — flooring acc first would clamp
    near-empty rays (0 < acc << 1e-10) to DISP_CLAMP where the reference
    returns the true 1/mean-depth."""
    safe_acc = jnp.where(acc_map > 0.0, acc_map, 1.0)
    disp = 1.0 / jnp.maximum(1e-10, depth_map / safe_acc)
    disp = jnp.minimum(disp, DISP_CLAMP)
    return jnp.where(acc_map == 0.0, 0.0, disp)


def weights_from_sigma(sigma: jnp.ndarray, z_vals: jnp.ndarray,
                       rays_d: jnp.ndarray,
                       scan_impl: str = "cumprod") -> jnp.ndarray:
    """Compositing weights from density logits alone: [N, S] -> [N, S].

    Used by the sigma-only coarse pass during evaluation, where only the
    hierarchical-sampling weights matter (the fine rgb is what gets shown,
    reference test.py:42-47)."""
    return _weights(sigma, z_vals, rays_d, scan_impl, axis=-1)


def weights_from_sigma_t(sigma_t: jnp.ndarray, z_t: jnp.ndarray,
                         rays_d: jnp.ndarray,
                         scan_impl: str = "cumprod") -> jnp.ndarray:
    """weights_from_sigma in the sample-major layout: sigma_t/z_t [S, N]
    -> weights [S, N]."""
    return _weights(sigma_t, z_t, rays_d, scan_impl, axis=0)


def volume_render_planar(raw: jnp.ndarray, z_vals: jnp.ndarray,
                         rays_d: jnp.ndarray,
                         scan_impl: str = "cumprod") -> RenderOutputs:
    """Same compositing math with channel-planar raw: [4, N, S] (rgb rows
    0..2, sigma row 3).  This is the zero-relayout consumer of the fused
    Pallas kernels' [4, P] outputs — a [4,P]→[P,4] transpose costs ~4ms
    per 3M points on TPU and is pure waste."""
    raw = raw.astype(jnp.float32)
    weights = _weights(raw[3], z_vals, rays_d, scan_impl, axis=-1)  # [N, S]
    rgb = jax.nn.sigmoid(raw[0:3])                                  # [3,N,S]

    rgb_map = jnp.sum(weights[None] * rgb, -1).T                    # [N, 3]
    depth_map = jnp.sum(weights * z_vals, -1)
    acc_map = jnp.sum(weights, -1)
    disp_map = _disp_from(depth_map, acc_map)
    rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return RenderOutputs(rgb_map, disp_map, acc_map, weights, depth_map)


def volume_render_rays_t(r: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray,
                         sigma: jnp.ndarray, z_t: jnp.ndarray,
                         rays_d: jnp.ndarray,
                         scan_impl: str = "cumprod") -> RenderOutputsT:
    """Same compositing math in the sample-major layout: r/g/b/sigma and
    z_t are [S, N] (the ray-major kernels' native outputs,
    kernels/fused_mlp.fused_mlp_eval_rays) — the scan runs along axis 0.
    Returns RenderOutputsT, whose ``weights`` is [S, N] (transposed)."""
    weights = _weights(sigma, z_t, rays_d, scan_impl, axis=0)       # [S, N]

    rgb_map = jnp.stack(
        [jnp.sum(weights * jax.nn.sigmoid(c.astype(jnp.float32)), 0)
         for c in (r, g, b)], -1)                                   # [N, 3]
    depth_map = jnp.sum(weights * z_t, 0)
    acc_map = jnp.sum(weights, 0)
    disp_map = _disp_from(depth_map, acc_map)
    rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return RenderOutputsT(rgb_map, disp_map, acc_map, weights, depth_map)


def volume_render(raw: jnp.ndarray, z_vals: jnp.ndarray, rays_d: jnp.ndarray,
                  scan_impl: str = "cumprod") -> RenderOutputs:
    """Composite raw MLP outputs along each ray.

    Args:
      raw:    [N, S, 4] network outputs (rgb logits ‖ density logit).
      z_vals: [N, S] sample depths.
      rays_d: [N, 3] (unnormalised) ray directions.
    """
    raw = raw.astype(jnp.float32)
    weights = _weights(raw[..., 3], z_vals, rays_d, scan_impl, axis=-1)
    rgb = jax.nn.sigmoid(raw[..., :3])                             # [N, S, 3]

    rgb_map = jnp.sum(weights[..., None] * rgb, -2)                # [N, 3]
    depth_map = jnp.sum(weights * z_vals, -1)
    acc_map = jnp.sum(weights, -1)
    disp_map = _disp_from(depth_map, acc_map)

    # Unconditional white-background composite (reference nerf_process.py:138).
    rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return RenderOutputs(rgb_map, disp_map, acc_map, weights, depth_map)
