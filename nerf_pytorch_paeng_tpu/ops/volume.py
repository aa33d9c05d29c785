"""Volume rendering (alpha compositing) of raw network outputs.

Math parity target: reference nerf_process.py:89-140 (post_process):
- dists = Δz with a 1e10 cap for the last bin, scaled by ||ray_d||,
- α = 1 - exp(-relu(σ)·dist),
- transmittance = exclusive cumprod of (1-α+1e-10),
- rgb = Σ w·sigmoid(c); the white-background composite ``rgb + (1-acc)``
  is unconditional in the reference, so it is unconditional here too,
- disparity = 1/max(1e-10, depth/acc) with NaN→0 and a clamp at 5.0; we
  compute it NaN-free by construction (acc can be 0 → guard the division)
  and keep the clamp for output parity.

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


def exclusive_cumprod(x: jnp.ndarray, scan_impl: str = "cumprod") -> jnp.ndarray:
    """Exclusive product along the last axis: out[i] = prod(x[:i]), out[0]=1."""
    if scan_impl == "associative":
        # log-space associative scan: shards cleanly over the sample axis.
        # Clamp before the log: callers pass x = 1 - alpha + 1e-10, which
        # XLA may reassociate into exactly 0 at alpha == 1 (log(0) = -inf).
        logs = jnp.log(jnp.maximum(x, 1e-10))
        inc = jax.lax.associative_scan(jnp.add, logs, axis=-1)
        exc = inc - logs
        return jnp.exp(exc)
    ones = jnp.ones_like(x[..., :1])
    return jnp.cumprod(jnp.concatenate([ones, x], -1), -1)[..., :-1]


def weights_from_sigma(sigma: jnp.ndarray, z_vals: jnp.ndarray,
                       rays_d: jnp.ndarray,
                       scan_impl: str = "cumprod") -> jnp.ndarray:
    """Compositing weights from density logits alone: [N, S] -> [N, S].

    Used by the sigma-only coarse pass during evaluation, where only the
    hierarchical-sampling weights matter (the fine rgb is what gets shown,
    reference test.py:42-47)."""
    sigma = sigma.astype(jnp.float32)
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    return alpha * exclusive_cumprod(1.0 - alpha + 1e-10, scan_impl)


def volume_render_planar(raw: jnp.ndarray, z_vals: jnp.ndarray,
                         rays_d: jnp.ndarray,
                         scan_impl: str = "cumprod") -> RenderOutputs:
    """Same compositing math with channel-planar raw: [4, N, S] (rgb rows
    0..2, sigma row 3).  This is the zero-relayout consumer of the fused
    Pallas kernels' [4, P] outputs — a [4,P]→[P,4] transpose costs ~4ms
    per 3M points on TPU and is pure waste."""
    raw = raw.astype(jnp.float32)
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], -1)          # [N, S]
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[0:3])                                 # [3, N, S]
    alpha = 1.0 - jnp.exp(-jax.nn.relu(raw[3]) * dists)            # [N, S]

    transmittance = exclusive_cumprod(1.0 - alpha + 1e-10, scan_impl)
    weights = alpha * transmittance                                # [N, S]

    rgb_map = jnp.sum(weights[None] * rgb, -1).T                   # [N, 3]
    depth_map = jnp.sum(weights * z_vals, -1)
    acc_map = jnp.sum(weights, -1)

    mean_depth = depth_map / jnp.maximum(acc_map, 1e-10)
    disp_map = 1.0 / jnp.maximum(1e-10, mean_depth)
    disp_map = jnp.minimum(disp_map, DISP_CLAMP)
    disp_map = jnp.where(acc_map == 0.0, 0.0, disp_map)

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
    sigma = sigma.astype(jnp.float32)
    dists = z_t[1:] - z_t[:-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[:1], 1e10)], 0)
    dists = dists * jnp.linalg.norm(rays_d, axis=-1)[None]      # [S, N]

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)          # [S, N]
    x = 1.0 - alpha + 1e-10
    if scan_impl == "associative":
        logs = jnp.log(jnp.maximum(x, 1e-10))
        inc = jax.lax.associative_scan(jnp.add, logs, axis=0)
        transmittance = jnp.exp(inc - logs)
    else:
        ones = jnp.ones_like(x[:1])
        transmittance = jnp.cumprod(
            jnp.concatenate([ones, x], 0), 0)[:-1]
    weights = alpha * transmittance                             # [S, N]

    rgb_map = jnp.stack(
        [jnp.sum(weights * jax.nn.sigmoid(c.astype(jnp.float32)), 0)
         for c in (r, g, b)], -1)                               # [N, 3]
    depth_map = jnp.sum(weights * z_t, 0)
    acc_map = jnp.sum(weights, 0)

    mean_depth = depth_map / jnp.maximum(acc_map, 1e-10)
    disp_map = 1.0 / jnp.maximum(1e-10, mean_depth)
    disp_map = jnp.minimum(disp_map, DISP_CLAMP)
    disp_map = jnp.where(acc_map == 0.0, 0.0, disp_map)

    rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return RenderOutputsT(rgb_map, disp_map, acc_map, weights, depth_map)


def weights_from_sigma_t(sigma_t: jnp.ndarray, z_t: jnp.ndarray,
                         rays_d: jnp.ndarray,
                         scan_impl: str = "cumprod") -> jnp.ndarray:
    """weights_from_sigma in the sample-major layout: sigma_t/z_t [S, N]
    -> weights [S, N]."""
    sigma_t = sigma_t.astype(jnp.float32)
    dists = z_t[1:] - z_t[:-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[:1], 1e10)], 0)
    dists = dists * jnp.linalg.norm(rays_d, axis=-1)[None]
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma_t) * dists)
    x = 1.0 - alpha + 1e-10
    if scan_impl == "associative":
        logs = jnp.log(jnp.maximum(x, 1e-10))
        inc = jax.lax.associative_scan(jnp.add, logs, axis=0)
        transmittance = jnp.exp(inc - logs)
    else:
        ones = jnp.ones_like(x[:1])
        transmittance = jnp.cumprod(jnp.concatenate([ones, x], 0), 0)[:-1]
    return alpha * transmittance


def volume_render(raw: jnp.ndarray, z_vals: jnp.ndarray, rays_d: jnp.ndarray,
                  scan_impl: str = "cumprod") -> RenderOutputs:
    """Composite raw MLP outputs along each ray.

    Args:
      raw:    [N, S, 4] network outputs (rgb logits ‖ density logit).
      z_vals: [N, S] sample depths.
      rays_d: [N, 3] (unnormalised) ray directions.
    """
    raw = raw.astype(jnp.float32)
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], -1)          # [N, S]
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])                             # [N, S, 3]
    alpha = 1.0 - jnp.exp(-jax.nn.relu(raw[..., 3]) * dists)       # [N, S]

    transmittance = exclusive_cumprod(1.0 - alpha + 1e-10, scan_impl)
    weights = alpha * transmittance                                # [N, S]

    rgb_map = jnp.sum(weights[..., None] * rgb, -2)                # [N, 3]
    depth_map = jnp.sum(weights * z_vals, -1)
    acc_map = jnp.sum(weights, -1)

    # NaN-free disparity: guard acc=0 before dividing (reference patches the
    # NaNs after the fact, nerf_process.py:124-134; the clamp at 5.0 and the
    # 1e-10 floor reproduce its output exactly on the non-NaN path).
    mean_depth = depth_map / jnp.maximum(acc_map, 1e-10)
    disp_map = 1.0 / jnp.maximum(1e-10, mean_depth)
    disp_map = jnp.minimum(disp_map, DISP_CLAMP)
    # empty ray (acc==0): the reference's 0/0 NaN is patched to 0 there.
    disp_map = jnp.where(acc_map == 0.0, 0.0, disp_map)

    # Unconditional white-background composite (reference nerf_process.py:138).
    rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return RenderOutputs(rgb_map, disp_map, acc_map, weights, depth_map)
