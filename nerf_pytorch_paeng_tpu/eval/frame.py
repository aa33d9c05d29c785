"""Compiled full-frame renderer shared by test/render/bench paths.

One jit program renders an entire pose: ray generation, optional NDC, and
the blocked coarse+fine render all stay on device (the reference loops
4096-ray chunks on the host per frame, test.py:40 / nerf_process.py:236).
Optionally sharded over the mesh 'data' axis for multi-chip rendering.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

import numpy as np

from ..models.nerf import NeRF
from ..ops.rays import get_rays
from ..ops.render import (make_pallas_field_fns, make_xla_field_fns,
                          maybe_ndc, render_frame)


def _supports_pallas(cfg) -> bool:
    """The fused kernel implements exactly the reference architecture."""
    return (cfg.use_pallas and cfg.netDepth == 8 and cfg.netWidth == 256
            and cfg.L_x <= 10 and cfg.L_d <= 4)


def make_frame_renderer(model: NeRF, cfg, H: int, W: int, K,
                        mesh: Optional[object] = None,
                        block_rays: Optional[int] = None,
                        stratified: bool = True):
    """Returns render(params, c2w [3,4], key) -> (rgb [H,W,3], disp [H,W]).

    With cfg.use_pallas (and the reference architecture), the MLP runs in
    the fused Pallas kernel; params are re-packed per call on the host
    (a ~2.4 MB transfer — irrelevant next to a frame's compute).
    """
    K = jnp.asarray(K, jnp.float32)
    focal = float(K[0, 0])
    n_fine = cfg.N_samples_f
    use_pallas = _supports_pallas(cfg)
    n_mesh = 1 if mesh is None else int(np.prod(list(dict(mesh.shape).values())))

    def _field_fns(params):
        if use_pallas:
            return make_pallas_field_fns(
                params["packed_coarse"], params["packed_fine"], cfg)
        return make_xla_field_fns(model, params, cfg)

    def _render_rays_flat(params, rays_o, rays_d, key):
        coarse, fine = _field_fns(params)
        out = render_frame(coarse, fine, rays_o, rays_d, key, cfg,
                           block_rays=block_rays, stratified=stratified)
        rgb = out.rgb_f if n_fine > 0 else out.rgb_c
        disp = out.disp_f if n_fine > 0 else out.disp_c
        return rgb, disp

    def _render(params, c2w, key):
        rays_o, rays_d = get_rays(H, W, K, c2w)
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        rays_o, rays_d = maybe_ndc(rays_o, rays_d, H, W, focal, cfg.data_type)
        if n_mesh > 1:
            # shard rays over the full mesh: shard_map runs the (possibly
            # Pallas) render per-shard — GSPMD cannot slice a pallas_call.
            from jax.sharding import PartitionSpec as P
            n_pad = (-rays_o.shape[0]) % n_mesh
            if n_pad:
                rays_o = jnp.concatenate(
                    [rays_o, jnp.ones((n_pad, 3), rays_o.dtype)], 0)
                rays_d = jnp.concatenate(
                    [rays_d, jnp.ones((n_pad, 3), rays_d.dtype)], 0)
            axes = tuple(mesh.axis_names)
            rgb, disp = jax.shard_map(
                _render_rays_flat,
                mesh=mesh,
                in_specs=(P(), P(axes), P(axes), P()),
                out_specs=P(axes),
                check_vma=False,
            )(params, rays_o, rays_d, key)
            rgb, disp = rgb[: H * W], disp[: H * W]
        else:
            rgb, disp = _render_rays_flat(params, rays_o, rays_d, key)
        return rgb.reshape(H, W, 3), disp.reshape(H, W)

    jitted = jax.jit(_render)
    if not use_pallas:
        return jitted

    from ..kernels.fused_mlp import pack_nerf_mlp_params

    def render_with_packing(params, c2w, key):
        packed = {
            "packed_coarse": pack_nerf_mlp_params(
                jax.tree_util.tree_map(np.asarray, params["coarse"]),
                L_x=cfg.L_x, L_d=cfg.L_d),
            "packed_fine": pack_nerf_mlp_params(
                jax.tree_util.tree_map(np.asarray, params["fine"]),
                L_x=cfg.L_x, L_d=cfg.L_d),
        }
        return jitted(packed, c2w, key)

    return render_with_packing
