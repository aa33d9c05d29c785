"""Compiled full-frame renderer shared by test/render/bench paths.

One jit program renders an entire pose: ray generation, optional NDC, and
the blocked coarse+fine render all stay on device (the reference loops
4096-ray chunks on the host per frame, test.py:40 / nerf_process.py:236).
Optionally sharded over the mesh 'data' axis for multi-chip rendering.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.nerf import NeRF
from ..ops.rays import get_rays
from ..ops.render import maybe_ndc, render_frame


def make_frame_renderer(model: NeRF, cfg, H: int, W: int, K,
                        mesh: Optional[object] = None,
                        block_rays: Optional[int] = None,
                        stratified: bool = True):
    """Returns render(params, c2w [3,4], key) -> (rgb [H,W,3], disp [H,W])."""
    K = jnp.asarray(K, jnp.float32)
    focal = float(K[0, 0])
    n_fine = cfg.N_samples_f

    def _render(params, c2w, key):
        coarse = lambda x: model.apply({"params": params}, x,
                                       method=NeRF.coarse_fwd)
        fine = lambda x: model.apply({"params": params}, x,
                                     method=NeRF.fine_fwd)
        rays_o, rays_d = get_rays(H, W, K, c2w)
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        rays_o, rays_d = maybe_ndc(rays_o, rays_d, H, W, focal, cfg.data_type)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            bs = NamedSharding(mesh, P("data"))
            rays_o = jax.lax.with_sharding_constraint(rays_o, bs)
            rays_d = jax.lax.with_sharding_constraint(rays_d, bs)
        out = render_frame(coarse, fine, rays_o, rays_d, key, cfg,
                           block_rays=block_rays, stratified=stratified)
        rgb = out.rgb_f if n_fine > 0 else out.rgb_c
        disp = out.disp_f if n_fine > 0 else out.disp_c
        return rgb.reshape(H, W, 3), disp.reshape(H, W)

    return jax.jit(_render)
