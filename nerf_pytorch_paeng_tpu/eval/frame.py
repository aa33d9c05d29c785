"""Compiled full-frame renderer shared by test/render/bench paths.

One jitted program renders a fixed-size block of rays through the whole
coarse+fine pipeline; a frame is a pipelined sequence of block dispatches
(async — the host never blocks between launches).  The reference's
per-frame host loop did the same shape of work but with per-chunk
host<->device copies (test.py:40 / nerf_process.py:236); here each block
is one device program and only the final frame crosses back.

Note: the blocks are a host loop rather than a ``lax.map`` on purpose —
embedding the two fused Pallas kernels in a scanned loop body trips a TPU
runtime fault (worker crash), and pipelined dispatch costs nothing at
these block sizes.

With a >1-device mesh, each block additionally shard_maps its rays over
the whole mesh (pallas_call runs per-shard; GSPMD cannot slice it).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.nerf import NeRF
from ..ops.rays import get_rays
from ..ops.render import (make_pallas_field_fns, make_pallas_sigma_fn,
                          make_xla_field_fns, maybe_ndc,
                          render_rays_from_cfg)


def _supports_pallas(cfg) -> bool:
    """The fused kernel implements exactly the reference architecture.
    L >= 1 because the kernels always emit one sin/cos band (so L=0
    configs fall back to the XLA path, which handles them)."""
    return (cfg.use_pallas and cfg.netDepth == 8 and cfg.netWidth == 256
            and 1 <= cfg.L_x <= 10 and 1 <= cfg.L_d <= 4)


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
    block = block_rays or cfg.chunk_rays
    n_mesh = 1 if mesh is None else int(
        np.prod(list(dict(mesh.shape).values())))

    def _field_fns(params):
        if use_pallas:
            coarse, fine = make_pallas_field_fns(
                params["packed_coarse"], params["packed_fine"], cfg)
            sigma = (make_pallas_sigma_fn(params["packed_coarse"], cfg)
                     if n_fine > 0 else None)
            return coarse, fine, sigma
        coarse, fine = make_xla_field_fns(model, params, cfg)
        return coarse, fine, None

    @jax.jit
    def gen_rays(c2w):
        rays_o, rays_d = get_rays(H, W, K, c2w)
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        return maybe_ndc(rays_o, rays_d, H, W, focal, cfg.data_type)

    def _block_body(params, rays_o, rays_d, key):
        coarse, fine, sigma = _field_fns(params)
        out = render_rays_from_cfg(coarse, fine, rays_o, rays_d, key, cfg,
                                   stratified=stratified,
                                   coarse_sigma_fn=sigma,
                                   cull_frac=float(cfg.cull_frac))
        rgb = out.rgb_f if n_fine > 0 else out.rgb_c
        disp = out.disp_f if n_fine > 0 else out.disp_c
        return rgb, disp

    if n_mesh > 1:
        from jax.sharding import PartitionSpec as P
        axes = tuple(mesh.axis_names)
        render_block = jax.jit(jax.shard_map(
            _block_body, mesh=mesh,
            in_specs=(P(), P(axes), P(axes), P()),
            out_specs=P(axes), check_vma=False))
    else:
        render_block = jax.jit(_block_body)

    def _render(params, c2w, key):
        rays_o, rays_d = gen_rays(c2w)
        n = rays_o.shape[0]
        n_pad = (-n) % block
        if n_pad:
            rays_o = jnp.concatenate(
                [rays_o, jnp.ones((n_pad, 3), rays_o.dtype)], 0)
            rays_d = jnp.concatenate(
                [rays_d, jnp.ones((n_pad, 3), rays_d.dtype)], 0)
        n_blocks = rays_o.shape[0] // block
        keys = jax.random.split(key, n_blocks)
        outs = [render_block(params,
                             jax.lax.dynamic_slice_in_dim(rays_o, i * block,
                                                          block, 0),
                             jax.lax.dynamic_slice_in_dim(rays_d, i * block,
                                                          block, 0),
                             keys[i])
                for i in range(n_blocks)]          # pipelined dispatches
        rgb = jnp.concatenate([o[0] for o in outs], 0)[:n]
        disp = jnp.concatenate([o[1] for o in outs], 0)[:n]
        return rgb.reshape(H, W, 3), disp.reshape(H, W)

    if not use_pallas:
        return _render

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
        return _render(packed, c2w, key)

    return render_with_packing
