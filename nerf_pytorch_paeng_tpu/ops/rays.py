"""Ray geometry: camera rays, NDC projection, pixel sampling.

Math parity targets:
- camera rays: reference rays.py:7-34 (get_rays_np / make_o_d): pinhole dirs
  ``[(i-cx)/fx, -(j-cy)/fy, -1]`` rotated by the camera-to-world rotation.
- NDC: reference nerf_process.py:8-28.
- training pixel sampling with precrop: reference rays.py:37-64.

Everything is functional and shape-static so it lives happily under jit;
pixel selection uses an explicit PRNG key instead of global RNG state.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def get_rays(H: int, W: int, K: jnp.ndarray, c2w: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel world-space ray origins/directions for one camera.

    Args:
      H, W: image size (static).
      K: [3,3] intrinsics.
      c2w: [3,4] (or [4,4]) camera-to-world extrinsics.
    Returns:
      rays_o, rays_d: each [H, W, 3].
    """
    c2w = c2w[:3, :4]
    i = jnp.arange(W, dtype=jnp.float32)
    j = jnp.arange(H, dtype=jnp.float32)
    ii, jj = jnp.meshgrid(i, j, indexing="xy")              # [H, W]
    dirs = jnp.stack(
        [(ii - K[0, 2]) / K[0, 0], -(jj - K[1, 2]) / K[1, 1], -jnp.ones_like(ii)],
        axis=-1,
    )                                                        # [H, W, 3]
    rays_d = dirs @ c2w[:3, :3].T                            # rotate to world
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_batched(H: int, W: int, K: jnp.ndarray, c2ws: jnp.ndarray):
    """Rays for a stack of poses: c2ws [N,3,4] -> ([N,H,W,3], [N,H,W,3])."""
    return jax.vmap(lambda p: get_rays(H, W, K, p))(c2ws)


def ndc_rays(H: int, W: int, focal: jnp.ndarray, near: float,
             rays_o: jnp.ndarray, rays_d: jnp.ndarray):
    """Shift origins to the near plane and project into NDC space.

    Applied to all rays iff the dataset is LLFF forward-facing
    (reference nerf_process.py:224-226 with near=1).
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def sample_pixels(key: jax.Array, H: int, W: int, n_rays: int,
                  precrop: bool = False, precrop_frac: float = 0.5
                  ) -> jnp.ndarray:
    """Choose ``n_rays`` pixel (row, col) coords without replacement.

    With ``precrop`` the candidate set is the center crop of fractional size
    ``precrop_frac`` (reference rays.py:40-50).  ``precrop`` must be a static
    Python bool — the train loop compiles one variant per phase.
    Returns int32 [n_rays, 2] (row, col).
    """
    if precrop:
        dH = int(H // 2 * precrop_frac)
        dW = int(W // 2 * precrop_frac)
        rows0, cols0 = H // 2 - dH, W // 2 - dW
        nH, nW = 2 * dH, 2 * dW
    else:
        rows0 = cols0 = 0
        nH, nW = H, W
    n_px = nH * nW
    flat = jax.random.choice(key, n_px, shape=(n_rays,), replace=False)
    rows = rows0 + flat // nW
    cols = cols0 + flat % nW
    return jnp.stack([rows, cols], axis=-1).astype(jnp.int32)


def gather_rays(rays_o: jnp.ndarray, rays_d: jnp.ndarray, img: jnp.ndarray,
                coords: jnp.ndarray):
    """Index [H,W,3] fields by [N,2] (row,col) coords -> three [N,3] arrays."""
    r, c = coords[:, 0], coords[:, 1]
    return rays_o[r, c], rays_d[r, c], img[r, c]
