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

Occupancy-culled rendering (``cfg.render_cull == "auto"``, the default):
the frame is rendered in two phases.  Phase 1 runs the sigma-only coarse
pass for every ray and keeps the per-ray sampling stats (z_vals, weights)
in HBM.  Rays whose coarse occupancy ``acc = Σ weights`` is ≤ tau are
*culled*: their exact composite lies within tau of the white background
(rgb = Σ w·sigmoid(c) + (1-acc) ∈ [1-acc, 1] per channel), so they are
composited directly without ever touching the fine MLP.  Phase 2 compacts
the surviving rays (a device argsort by occupancy), runs the fine pass on
just ⌈n_active/block⌉ blocks, and scatters the results back.  On trained
scenes most background rays cull, so the dominant fine-MLP cost scales
with scene content instead of pixel count — this is the early-ray-
termination analog that gets 800×800 frames under a second.  The error is
bounded by tau on the coarse estimate and guard-tested end-to-end
(tests/test_render_culled.py: PSNR delta vs the exact render < 0.05 dB on
a trained scene).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.nerf import NeRF
from ..ops.rays import get_rays
from ..ops.render import (hierarchical_fine_pass, make_pallas_field_fns,
                          make_pallas_sigma_fn, make_xla_field_fns,
                          maybe_ndc, render_rays_from_cfg)
from ..ops.sampling import stratified_z_vals
from ..ops.volume import DISP_CLAMP, weights_from_sigma


def _supports_pallas(cfg) -> bool:
    """The fused kernel implements exactly the reference architecture.
    L >= 1 because the kernels always emit one sin/cos band (so L=0
    configs fall back to the XLA path, which handles them)."""
    return (cfg.use_pallas and cfg.netDepth == 8 and cfg.netWidth == 256
            and 1 <= cfg.L_x <= 10 and 1 <= cfg.L_d <= 4)


def _mesh_size(mesh) -> int:
    return 1 if mesh is None else int(np.prod(list(dict(mesh.shape).values())))


def _shard_over_rays(body, mesh, n_ray_args: int, n_rep_args: int = 1):
    """shard_map ``body(params, *ray_args, key)`` with ray args split over
    every mesh axis and params/key replicated."""
    from jax.sharding import PartitionSpec as P
    axes = tuple(mesh.axis_names)
    in_specs = (P(),) * n_rep_args + (P(axes),) * n_ray_args + (P(),)
    return jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=P(axes), check_vma=False)


def _pack_for_eval(params, cfg):
    from ..kernels.fused_mlp import pack_nerf_mlp_params
    return {
        "packed_coarse": pack_nerf_mlp_params(
            jax.tree_util.tree_map(np.asarray, params["coarse"]),
            L_x=cfg.L_x, L_d=cfg.L_d),
        "packed_fine": pack_nerf_mlp_params(
            jax.tree_util.tree_map(np.asarray, params["fine"]),
            L_x=cfg.L_x, L_d=cfg.L_d),
    }


def make_frame_renderer(model: NeRF, cfg, H: int, W: int, K,
                        mesh: Optional[object] = None,
                        block_rays: Optional[int] = None,
                        stratified: bool = True):
    """Returns render(params, c2w [3,4], key) -> (rgb [H,W,3], disp [H,W]).

    With cfg.use_pallas (and the reference architecture), the MLP runs in
    the fused Pallas kernel; params are re-packed per call on the host
    (a ~2.4 MB transfer — irrelevant next to a frame's compute).

    ``cfg.render_cull == "auto"`` (default) routes to the occupancy-culled
    two-phase renderer (see module docstring); "none" renders every ray
    densely through coarse+fine.
    """
    if getattr(cfg, "render_cull", "none") == "auto" and cfg.N_samples_f > 0:
        return _make_culled_frame_renderer(model, cfg, H, W, K, mesh=mesh,
                                           block_rays=block_rays,
                                           stratified=stratified)
    return _make_dense_frame_renderer(model, cfg, H, W, K, mesh=mesh,
                                      block_rays=block_rays,
                                      stratified=stratified)


def _make_ray_gen(cfg, H, W, K):
    K = jnp.asarray(K, jnp.float32)
    focal = float(K[0, 0])

    @jax.jit
    def gen_rays(c2w):
        rays_o, rays_d = get_rays(H, W, K, c2w)
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        return maybe_ndc(rays_o, rays_d, H, W, focal, cfg.data_type)

    return gen_rays


def _pad_rays(rays_o, rays_d, block):
    n = rays_o.shape[0]
    n_pad = (-n) % block
    if n_pad:
        rays_o = jnp.concatenate(
            [rays_o, jnp.ones((n_pad, 3), rays_o.dtype)], 0)
        rays_d = jnp.concatenate(
            [rays_d, jnp.ones((n_pad, 3), rays_d.dtype)], 0)
    return rays_o, rays_d, n


def _make_dense_frame_renderer(model: NeRF, cfg, H: int, W: int, K,
                               mesh=None, block_rays=None,
                               stratified: bool = True):
    """Every ray through the full coarse(+fine) pipeline (exact path)."""
    n_fine = cfg.N_samples_f
    use_pallas = _supports_pallas(cfg)
    block = block_rays or cfg.chunk_rays
    gen_rays = _make_ray_gen(cfg, H, W, K)

    def _field_fns(params):
        if use_pallas:
            coarse, fine = make_pallas_field_fns(
                params["packed_coarse"], params["packed_fine"], cfg)
            sigma = (make_pallas_sigma_fn(params["packed_coarse"], cfg)
                     if n_fine > 0 else None)
            return coarse, fine, sigma
        coarse, fine = make_xla_field_fns(model, params, cfg)
        return coarse, fine, None

    def _block_body(params, rays_o, rays_d, key):
        coarse, fine, sigma = _field_fns(params)
        out = render_rays_from_cfg(coarse, fine, rays_o, rays_d, key, cfg,
                                   stratified=stratified,
                                   coarse_sigma_fn=sigma)
        rgb = out.rgb_f if n_fine > 0 else out.rgb_c
        disp = out.disp_f if n_fine > 0 else out.disp_c
        return rgb, disp

    if _mesh_size(mesh) > 1:
        render_block = jax.jit(_shard_over_rays(_block_body, mesh, 2))
    else:
        render_block = jax.jit(_block_body)

    def _render(params, c2w, key):
        rays_o, rays_d = gen_rays(c2w)
        rays_o, rays_d, n = _pad_rays(rays_o, rays_d, block)
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

    def render_with_packing(params, c2w, key):
        return _render(_pack_for_eval(params, cfg), c2w, key)

    return render_with_packing


def _make_culled_frame_renderer(model: NeRF, cfg, H: int, W: int, K,
                                mesh=None, block_rays=None,
                                stratified: bool = True):
    """Two-phase occupancy-culled frame renderer (module docstring)."""
    n_coarse, n_fine = cfg.N_samples_c, cfg.N_samples_f
    near, far = float(cfg.near), float(cfg.far)
    tau = float(cfg.render_cull_tau)
    perturb = float(cfg.perturb)
    use_pallas = _supports_pallas(cfg)
    block = block_rays or cfg.chunk_rays
    gen_rays = _make_ray_gen(cfg, H, W, K)
    n_total = H * W
    n_padded = n_total + ((-n_total) % block)

    # ---- phase-1 body: sigma-only coarse -> per-ray sampling stats -------
    def _coarse_body(params, rays_o, rays_d, key):
        m = rays_o.shape[0]
        z_vals = stratified_z_vals(key, m, near, far, n_coarse,
                                   perturb=stratified)
        xp = (rays_o.T[:, :, None]
              + rays_d.T[:, :, None] * z_vals[None]).reshape(3, -1)
        if use_pallas:
            sigma = make_pallas_sigma_fn(params["packed_coarse"], cfg)(xp)
        else:
            coarse_fn, _ = make_xla_field_fns(model, params, cfg)
            # sigma is direction-independent; feed unit dirs for the (dead)
            # color branch
            sigma = coarse_fn(xp, jnp.ones_like(xp))[3]
        sigma = sigma.reshape(m, n_coarse)
        weights = weights_from_sigma(sigma, z_vals, rays_d)
        return z_vals, weights

    # ---- phase-2 body: fine pass on a compacted ray block ----------------
    def _fine_body(params, rays_o, rays_d, z_vals, weights, key):
        if use_pallas:
            _, fine_fn = make_pallas_field_fns(
                params["packed_coarse"], params["packed_fine"], cfg)
        else:
            _, fine_fn = make_xla_field_fns(model, params, cfg)
        out = hierarchical_fine_pass(fine_fn, rays_o, rays_d, z_vals,
                                     weights, key, n_fine=n_fine,
                                     perturb=perturb)
        return out.rgb, out.disp

    if _mesh_size(mesh) > 1:
        coarse_block = jax.jit(_shard_over_rays(_coarse_body, mesh, 2))
        fine_block = _shard_over_rays(_fine_body, mesh, 4)
    else:
        coarse_block = jax.jit(_coarse_body)
        fine_block = _fine_body

    @jax.jit
    def _order_and_count(weights):
        """Cull decision over the whole (padded) frame: occupancy, ray
        order by descending occupancy, number of surviving rays."""
        acc = jnp.sum(weights, -1)
        # padding rays never survive
        acc = jnp.where(jnp.arange(acc.shape[0]) < n_total, acc, -1.0)
        order = jnp.argsort(-acc)
        n_active = jnp.sum(acc > tau)
        return acc, order, n_active

    @jax.jit
    def _background(z_vals, weights, acc):
        """Composite for culled rays from coarse stats alone: the white-
        background term dominates (rgb within tau/2 of the exact coarse
        composite); disp follows the reference formula on coarse stats."""
        rgb = jnp.broadcast_to((1.0 - 0.5 * acc)[:, None],
                               (acc.shape[0], 3))
        depth = jnp.sum(weights * z_vals, -1)
        mean_depth = depth / jnp.maximum(acc, 1e-10)
        disp = jnp.minimum(1.0 / jnp.maximum(1e-10, mean_depth), DISP_CLAMP)
        disp = jnp.where(acc <= 0.0, 0.0, disp)
        return rgb, disp

    @jax.jit
    def _fine_dispatch(params, rays_o, rays_d, z_all, w_all, order, start,
                       key):
        """Gather one compacted block of surviving rays and fine-render it.
        ``start`` is a traced scalar so every block reuses one program."""
        idx = jax.lax.dynamic_slice_in_dim(order, start, block, 0)
        rgb, disp = fine_block(params, rays_o[idx], rays_d[idx], z_all[idx],
                               w_all[idx], key)
        return idx, rgb, disp

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _scatter(rgb_frame, disp_frame, idx, rgb, disp):
        return rgb_frame.at[idx].set(rgb), disp_frame.at[idx].set(disp)

    def _render(params, c2w, key):
        rays_o, rays_d = gen_rays(c2w)
        rays_o, rays_d, n = _pad_rays(rays_o, rays_d, block)
        n_blocks = rays_o.shape[0] // block
        keys = jax.random.split(key, 2 * n_blocks)

        # phase 1: pipelined coarse-occupancy blocks
        outs = [coarse_block(params,
                             jax.lax.dynamic_slice_in_dim(rays_o, i * block,
                                                          block, 0),
                             jax.lax.dynamic_slice_in_dim(rays_d, i * block,
                                                          block, 0),
                             keys[i])
                for i in range(n_blocks)]
        z_all = jnp.concatenate([o[0] for o in outs], 0)
        w_all = jnp.concatenate([o[1] for o in outs], 0)

        acc, order, n_active = _order_and_count(w_all)
        n_act = int(n_active)                       # one host sync per frame
        k_blocks = -(-n_act // block) if n_act else 0

        # culled rays composite straight to (near-)background
        rgb_frame, disp_frame = _background(z_all, w_all, acc)

        # phase 2: fine pass over compacted blocks only
        for b in range(k_blocks):
            idx, rgb, disp = _fine_dispatch(
                params, rays_o, rays_d, z_all, w_all, order,
                jnp.int32(b * block), keys[n_blocks + b])
            rgb_frame, disp_frame = _scatter(rgb_frame, disp_frame,
                                             idx, rgb, disp)
        return (rgb_frame[:n].reshape(H, W, 3),
                disp_frame[:n].reshape(H, W))

    if not use_pallas:
        return _render

    def render_with_packing(params, c2w, key):
        return _render(_pack_for_eval(params, cfg), c2w, key)

    return render_with_packing
