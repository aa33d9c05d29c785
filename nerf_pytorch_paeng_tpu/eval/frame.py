"""Compiled full-frame renderer shared by test/render/bench paths.

Dispatch economics drive this design: on the remote-TPU backend every
program dispatch costs ~20 ms of tunnel latency and every device->host
sync ~25 ms (see CLAUDE.md), so a frame must be a handful of *large*
programs, not a loop of small ones.  The reference renders a frame as 157
host-loop chunks with per-chunk device copies (test.py:40 /
nerf_process.py:236); here a dense 800x800 frame is ~5 dispatches and the
culled path is 2 programs + 1 scalar sync + <=3 fine blocks.

Multiple pallas_calls in one *straight-line* program are fine on this
backend; embedding them in a lax.map/scan body is the known worker-crash
(CLAUDE.md), which is why blocks are unrolled host dispatches rather than
a scanned loop.

With a >1-device mesh, the per-block bodies shard_map their rays over the
whole mesh (pallas_call runs per-shard; GSPMD cannot slice it); the
frame-global argsort/scatter glue stays in plain jit (GSPMD).

Occupancy-culled rendering (``cfg.render_cull == "auto"``, the default):
  Phase 1 (one program): sigma-only coarse pass for EVERY ray, keeping the
  per-ray sampling stats (z_vals, weights), plus the cull decision — rays
  whose coarse occupancy ``acc = Σ weights`` is <= tau composite straight
  to the white background (their exact composite lies within tau of it:
  rgb = Σ w·sigmoid(c) + (1-acc) ∈ [1-acc, 1] per channel).  Surviving
  rays are ordered by their per-ray sample requirement ``s_req = n_fine +
  k_need - k_start``: the coarse samples between the leading-mass cut
  (cumulative coarse weight reaches ``render_trunc_eps``) and the
  transmittance collapse (remaining T <= eps), each widened by a one-bin
  safety margin (ops/render.truncation_bounds — fine samples of the
  boundary bins can land past the unwidened cuts), plus every fine
  sample.
  One host sync reads a tiny cumulative histogram of s_req classes (its
  last entry is the surviving-ray count).
  Phase 2 (<= ceil(n_active/block) programs): gather a compacted block of
  surviving rays, hierarchical fine pass TRUNCATED to a per-ray WINDOW of
  the sorted merged depths at the block's quantized sample count
  (ops/render.truncation_window: skip merged samples below the leading-
  mass cut, stop at the window end — each drop is O(eps) on the coarse
  estimate), composite, and scatter into the (donated) frame buffers —
  all in the same program.
  Phase-1 pre-cull (``cfg.render_precull``, default "auto" = rays-kernel
  path only): support bounds of the coarse field (one cached grid
  program per params, ops/occupancy.py) give every ray a conservative
  support interval [t_lo, t_hi]; samples provably outside it skip the
  coarse MLP *inside* the phase-1 program, at (ray-tile, 8-sample-row)
  granularity — rays are sorted by interval row span so tiles share
  spans, and the sigma kernel's per-(tile, row) gate stores exact zeros
  for the skipped grid steps (_gated_sigma_t).  Provable misses (empty
  interval) gate every row, which is the whole-ray cull; support-hitting
  rays still skip the depth rows outside their interval.  Zero extra
  dispatches or syncs; gated-off samples get the identical (exactly
  zero) weights their real evaluation yields.
On trained scenes most background rays cull and most surface rays
truncate, so the dominant fine-MLP cost scales with scene content instead
of pixel count x sample count.  The error is bounded by tau (cull) and
trunc_eps (truncation) on the coarse estimate and guard-tested end-to-end
(tests/test_render_culled.py: PSNR delta vs the exact render < 0.05 dB on
a trained scene, for both mechanisms).

PIPELINE MAP — who builds what, and every cached program family
===============================================================

    get_frame_renderer(model, cfg, H, W, K, mesh)     <- the ONE entry
      | cache key: (params-independent) cfg knobs + HWK + mesh axes
      |            (_cfg_cache_key/_mesh_cache_key); eval hooks across a
      |            training run reuse the same compiled renderer
      +-> cfg.sp_shards > 1 ---> _make_sp_frame_renderer
      +-> render_cull == "none" -> _make_dense_frame_renderer
      +-> render_cull == "auto" -> _make_culled_frame_renderer

    per-frame params packing (all three families):
      _pack_for_eval -> _pack_program(L_x, L_d)   [lru by arch]
        one jitted repack of the param pytree into the kernels' fused
        layouts, cached by params *identity* — per-frame eager packing
        was ~50 tunnel dispatches (~300 ms/frame) before round 3.

    _make_dense_frame_renderer: ray gen (_make_ray_gen) + per-block
      coarse+fine render; blocks are unrolled host dispatches (lax.map
      over pallas_call is the known worker crash).  Program families:
      one per (block size, tail block size).

    _make_sp_frame_renderer: same structure, but each block renders via
      parallel/sp.make_sample_sharded_render_full (sample-axis sharding;
      coarse+fine at full width, distributed log-space transmittance).

    _make_culled_frame_renderer: the production path.
      phase 1  _sigma_program: sigma-only coarse for ALL rays in one
               program -> per-ray acc, truncation stats, s_req class;
               with _use_precull, miss rays are argsorted into trailing
               tiles the gated kernel skips (_gated_sigma_t; zero extra
               dispatches).  ONE host sync reads the s_req histogram.
      phase 2  _fine_program family, keyed by (block size, quantized
               sample count): gather compacted survivors, truncated
               hierarchical fine pass, composite, scatter into donated
               frame buffers.  With _use_gate_fine, the fine module's
               OWN support bounds row-gate the fine kernel
               (_gated_fine_rays) — still zero extra dispatches.
      support bounds: _support_for_eval(module="coarse"|"fine") — one
               cached grid program per (params identity, module)
               (ops/occupancy.support_bounds_from_sigma); invalid bounds
               or segments leaving the cube route to the UNGATED
               programs (correctness never depends on the bounds).

    Adding a knob?  If it changes compiled shapes it must enter
    _cfg_cache_key, or stale renderers will serve the old shapes.
    Anything executed per frame belongs INSIDE one of these programs —
    an eager jnp op on the frame path is a ~20 ms tunnel dispatch.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.nerf import NeRF
from ..ops.occupancy import (ray_hits_bounds, ray_support_interval,
                             segment_in_cube, support_bounds_from_sigma)
from ..ops.rays import get_rays
from ..ops.render import (_pallas_interpret, hierarchical_fine_pass,
                          hierarchical_z_vals, span_sort, tile_row_gate,
                          truncation_bounds, truncation_window,
                          make_pallas_field_fns,
                          make_pallas_sigma_fn, make_xla_field_fns,
                          maybe_ndc, render_rays_from_cfg)
from ..ops.sampling import stratified_z_vals
from ..ops.volume import (_disp_from, volume_render_rays_t,
                          weights_from_sigma, weights_from_sigma_t)

# default ray-block: big enough that a frame is a few (pipelined)
# dispatches, small enough to bound buffer sizes; the culled fine phase
# additionally covers the surviving rays with {block, block/2, block/4}
# programs so last-block waste is bounded by block/4
_DEFAULT_BLOCK = 131072


def _supports_pallas(cfg) -> bool:
    """The fused kernel implements exactly the reference architecture.
    L >= 1 because the kernels always emit one sin/cos band (so L=0
    configs fall back to the XLA path, which handles them)."""
    return (cfg.use_pallas and cfg.netDepth == 8 and cfg.netWidth == 256
            and 1 <= cfg.L_x <= 10 and 1 <= cfg.L_d <= 4)


def _use_rays_kernels(cfg) -> bool:
    """The ray-major kernels (positions built in-kernel, no plane
    materialisation) sweep 8 sample rows per grid step."""
    return (_supports_pallas(cfg) and cfg.N_samples_c % 8 == 0
            and (cfg.N_samples_c + cfg.N_samples_f) % 8 == 0)


def _pack_od(rays_o, rays_d):
    """[M, 3]+[M, 3] -> the ray-major kernels' [8, M] packed layout."""
    return jnp.concatenate(
        [rays_o.T, rays_d.T,
         jnp.zeros((2, rays_o.shape[0]), rays_o.dtype)], 0)


def _rays_tiling(m: int):
    """(tile_rays, padded_m) for the ray-major kernels.  Tiles are capped
    at 8192 lanes — larger tiles oversubscribe VMEM (the documented
    16384-crash, ops/render.py) — and the ray count is padded up to a tile
    multiple instead."""
    if m <= 8192:
        return m, m
    return 8192, -(-m // 8192) * 8192


def _pad_rays_z(od, z_t, padded_m: int):
    """Pad [8, m] rays and [S, m] depths to padded_m columns (dummy rays
    with unit directions; outputs are sliced back before use)."""
    m = od.shape[1]
    if padded_m == m:
        return od, z_t
    pad = padded_m - m
    od = jnp.concatenate([od, jnp.ones((8, pad), od.dtype)], 1)
    z_t = jnp.concatenate([z_t, jnp.broadcast_to(z_t[:, -1:],
                                                 (z_t.shape[0], pad))], 1)
    return od, z_t


def _mesh_size(mesh) -> int:
    return 1 if mesh is None else int(np.prod(list(dict(mesh.shape).values())))


_GATE_S_ROWS = 8   # the rays-kernel sample-row sweep (fused_mlp_sigma_rays)


def _row_envelopes(near: float, far: float, s: int, s_rows: int):
    """Static per-row depth envelopes of stratified_z_vals' bins: row k
    (samples k*s_rows .. (k+1)*s_rows - 1) lies in [row_lo[k], row_hi[k]]
    for EVERY jitter draw (sample j is jittered within
    [mid(z_{j-1}, z_j), mid(z_j, z_{j+1})], edges clamped to near/far).
    Widened by 1e-4*(far-near) so fp32 z rounding can never escape."""
    zs = np.linspace(near, far, s, dtype=np.float64)
    if s > 1:
        mids = 0.5 * (zs[1:] + zs[:-1])
        lower = np.concatenate([zs[:1], mids])
        upper = np.concatenate([mids, zs[-1:]])
    else:
        lower = upper = zs
    margin = 1e-4 * (far - near)
    k = np.arange(s // s_rows)
    return (jnp.asarray(lower[k * s_rows] - margin, jnp.float32),
            jnp.asarray(upper[k * s_rows + s_rows - 1] + margin,
                        jnp.float32))


def _gated_sigma_t(packed_coarse, rays_o, rays_d, z_vals, pc, tile, pm,
                   half, near, far, L_x, interpret):
    """Coarse sigma for every ray with the dispatch-free pre-cull, at
    (ray-tile, sample-row) granularity: each ray gets a conservative
    support interval [t_lo, t_hi] (ops/occupancy.ray_support_interval —
    empty for provable misses, [near, far] for rays whose segment leaves
    the estimation cube), rays are sorted by which 8-sample depth rows
    that interval touches, and the gated sigma kernel skips every
    (ray-tile, row) grid step no ray in the tile needs
    (kernels/fused_mlp._sigma_rays_kernel_gated).  Gated-off samples get
    sigma == 0 — exactly the zero compositing weights their real
    (<= 0 logit) evaluation yields — so downstream (tau-cull ordering,
    fine phase) sees identical weights; same trust model and safety
    rails as the block-structured phase 0, at zero extra programs or
    host syncs.  Whole-ray culling is the span-empty special case, and
    rays that DO hit the support still skip the depth rows outside
    their interval (most of a thin object's [near, far] range).

    Returns [S, m] sigma logits in the ORIGINAL ray order: bit-equal to
    the ungated kernel on active (tile, row) blocks, exact zeros on
    gated ones — relu makes the compositing weights identical either
    way.
    """
    from ..kernels.fused_mlp import fused_mlp_sigma_rays
    m, s = z_vals.shape
    n_rows = s // _GATE_S_ROWS
    t_lo, t_hi = ray_support_interval(rays_o, rays_d, *pc, near, far)
    inside = segment_in_cube(rays_o, rays_d, half, near, far)
    # outside the estimation cube the grid certifies nothing: full span
    t_lo = jnp.where(inside, t_lo, near)
    t_hi = jnp.where(inside, t_hi, far)
    row_lo, row_hi = _row_envelopes(near, far, s, _GATE_S_ROWS)
    act = ((t_lo[:, None] <= row_hi[None])
           & (t_hi[:, None] >= row_lo[None]))        # [m, n_rows]
    # span sort + per-(tile, row) gate: the one shared implementation of
    # the gate contract (ops/render.span_sort / tile_row_gate) — empty
    # spans (provable misses) sort last, so whole-ray culling falls out
    order0, inv0 = span_sort(act)
    od_s = _pack_od(rays_o, rays_d)[:, order0]
    z_s = z_vals.T[:, order0]
    od_p, z_p = _pad_rays_z(od_s, z_s, pm)
    act_s = act[order0]
    if pm != m:                                       # padding rays: gated
        act_s = jnp.concatenate(
            [act_s, jnp.zeros((pm - m, n_rows), bool)], 0)
    gate, _ = tile_row_gate(act_s, tile)
    sigma_s = fused_mlp_sigma_rays(
        od_p, z_p, packed_coarse, L_x=L_x, tile_rays=tile,
        s_rows=_GATE_S_ROWS, interpret=interpret, out_dtype=jnp.bfloat16,
        gate=gate)[:, :m]
    return sigma_s[:, inv0]


def _gated_fine_rays(packed_fine, rays_o, rays_d, z_all, fb, tile, pm,
                     half, near, far, L_x, L_d, interpret):
    """Fine-module MLP along rays with per-(ray-tile, 8-sample-row)
    support gating — the phase-2 analog of _gated_sigma_t, attacking the
    fine rows INSIDE each surviving ray's truncation window (the window
    is a cumulative-mass bound on the coarse estimate; the FINE module's
    own support bounds certify more rows, e.g. the empty depth rows
    between near plane and a hard front that the quantized s_keep classes
    cannot cut).  Unlike the coarse phase the depths are data-dependent
    (hierarchical + truncated), so row activity comes from the actual
    sample depths against the ray's conservative support interval, not
    static row envelopes.  Same trust model and safety rails: a gated-off
    sample provably carries a <= 0 density logit, so storing zeros yields
    the identical zero compositing weight (relu), and rays whose segment
    leaves the estimation cube are never gated.

    z_all [m, S] merged fine depths; fb = the FINE module's
    (lo, hi, radius, valid) bounds.  Returns (r, g, b, sigma) [S, m]
    logits in the ORIGINAL ray order.
    """
    from ..kernels.fused_mlp import fused_mlp_eval_rays
    m, s = z_all.shape
    n_rows = s // _GATE_S_ROWS
    t_lo, t_hi = ray_support_interval(rays_o, rays_d, *fb, near, far)
    inside = segment_in_cube(rays_o, rays_d, half, near, far)
    t_lo = jnp.where(inside, t_lo, near)
    t_hi = jnp.where(inside, t_hi, far)
    # widen by the same fp margin the coarse row envelopes use
    # (_row_envelopes): ulp-level z/interval rounding must never shrink
    # coverage — the one-cell AABB dilation is the semantic safety
    # margin, this epsilon is the numeric one
    margin = 1e-4 * (far - near)
    act = ((z_all >= t_lo[:, None] - margin)
           & (z_all <= t_hi[:, None] + margin))                 # [m, S]
    act = act.reshape(m, n_rows, _GATE_S_ROWS).any(-1)          # [m, R]
    order0, inv0 = span_sort(act)
    od_s = _pack_od(rays_o, rays_d)[:, order0]
    z_s = z_all.T[:, order0]
    od_p, z_p = _pad_rays_z(od_s, z_s, pm)
    act_s = act[order0]
    if pm != m:                                       # padding rays: gated
        act_s = jnp.concatenate(
            [act_s, jnp.zeros((pm - m, n_rows), bool)], 0)
    gate, _ = tile_row_gate(act_s, tile)
    r, g, b, sg = fused_mlp_eval_rays(
        od_p, z_p, packed_fine, L_x=L_x, L_d=L_d, tile_rays=tile,
        s_rows=_GATE_S_ROWS, interpret=interpret, out_dtype=jnp.bfloat16,
        gate=gate)
    return (r[:, :m][:, inv0], g[:, :m][:, inv0],
            b[:, :m][:, inv0], sg[:, :m][:, inv0])


def _shard_over_rays(body, mesh, n_ray_args: int, n_rep_args: int = 1):
    """shard_map ``body(params, *ray_args, key)`` with ray args split over
    every mesh axis and params/key replicated."""
    from jax.sharding import PartitionSpec as P
    axes = tuple(mesh.axis_names)
    in_specs = (P(),) * n_rep_args + (P(axes),) * n_ray_args + (P(),)
    return jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=P(axes), check_vma=False)


@functools.lru_cache(maxsize=8)
def _pack_program(L_x: int, L_d: int):
    from ..kernels.fused_mlp import pack_nerf_mlp_params

    def pack(params):
        return {
            "packed_coarse": pack_nerf_mlp_params(params["coarse"],
                                                  L_x=L_x, L_d=L_d),
            "packed_fine": pack_nerf_mlp_params(params["fine"],
                                                L_x=L_x, L_d=L_d),
        }

    return jax.jit(pack)


# id(params) -> (params, packed).  The strong ref to params pins its id
# (no reuse-after-GC aliasing); bounded so training-loop eval hooks with
# fresh params per hook don't grow it.
_PACK_CACHE: dict = {}


def _pack_for_eval(params, cfg):
    """Kernel-layout packed weights for the eval kernels, as ONE jitted
    device program, cached by params identity.

    The round-2 version packed eagerly per *frame* call — ~50 small jnp
    ops, each a ~ms-level dispatch through the remote tunnel, measured as
    a large share of the 0.88 s culled frame (306 ms wall-vs-busy gap in
    the xplane trace).  Eval loops reuse one params tree across frames, so
    packing now happens once per params change."""
    hit = _PACK_CACHE.get(id(params))
    if hit is not None and hit[0] is params:
        return hit[1]
    packed = _pack_program(cfg.L_x, cfg.L_d)(params)
    if len(_PACK_CACHE) >= 8:
        _PACK_CACHE.pop(next(iter(_PACK_CACHE)))
    _PACK_CACHE[id(params)] = (params, packed)
    return packed


# id(params) -> (params, bounds) like _PACK_CACHE; bounds additionally
# keyed by the cfg scalars they depend on (one params tree can serve
# several renderer configs in one process — tests do this)
_SUPPORT_CACHE: dict = {}


def _precull_grid(cfg) -> int:
    """Support-grid resolution; cfg 0 = auto (128 on a real TPU, disabled
    off-TPU where the grid MLP would run in Pallas interpret mode)."""
    g = int(getattr(cfg, "render_precull_grid", 0))
    if g:
        return g
    return 128 if jax.default_backend() == "tpu" else 0


def _use_precull(cfg) -> bool:
    """Support-bounds ray pre-culling (ops/occupancy.py): blender orbit
    scenes only — the support cube is centered at the origin.  The
    default "auto" enables it only where it is dispatch-free (the gated
    rays-kernel coarse program); explicit on also engages the
    block-structured phase 0 on the XLA-fallback path (a measured net
    loss on the remote backend — config.py render_precull notes)."""
    mode = str(getattr(cfg, "render_precull", "auto")).lower()
    if mode in ("off", "false", "f", "no", "n", "0"):
        return False
    if mode == "auto" and not _use_rays_kernels(cfg):
        return False
    return cfg.data_type == "blender" and _precull_grid(cfg) > 0


def _use_gate_fine(cfg) -> bool:
    """Fine-phase row gating by the FINE module's own support bounds
    (cfg.render_gate_fine; _gated_fine_rays) — the culled renderer's
    phase-2 counterpart of the dispatch-free coarse pre-cull.  Same
    preconditions: blender origin-centered scenes and a usable support
    grid; the rays-kernel requirement is checked by the caller."""
    mode = str(getattr(cfg, "render_gate_fine", "auto")).lower()
    if mode in ("off", "false", "f", "no", "n", "0"):
        return False
    return cfg.data_type == "blender" and _precull_grid(cfg) > 0


def _precull_half(cfg) -> float:
    """Estimation-cube half-extent: cfg override, else ``far`` (contains
    blender-orbit sample segments — ops/occupancy.py half_side notes)."""
    return (float(getattr(cfg, "render_precull_halfside", 0.0))
            or float(cfg.far))


# compiled grid programs, shared across params (a fresh params tree per
# eval hook must NOT recompile the grid program — remote compiles cost
# 20-60 s, CLAUDE.md)
_SUPPORT_PROGS: dict = {}


def _support_for_eval(model, params, cfg, module: str = "coarse"):
    """((lo, hi, radius, valid), valid_host) support bounds of one
    module's density field (the coarse and fine MLPs are independent
    networks — reference model/NeRF.py:55-66 — so each needs its own
    bounds).  The grid program is compiled once per config (cached on the
    cfg scalars, like get_frame_renderer) and run once per params change
    (result cached by params identity, like _pack_for_eval); ``params``
    is the packed tree on the Pallas path and the raw flax tree on the
    XLA path — either way its identity is stable across frames.
    ``valid_host`` is a python bool (one device fetch per params change)
    so the renderer can skip the whole phase-0 structure when the bounds
    are unusable."""
    half = _precull_half(cfg)
    grid = _precull_grid(cfg)
    use_pallas = _supports_pallas(cfg)
    pk = (_cfg_cache_key(cfg), half, grid, use_pallas, module)
    ck = (id(params),) + pk
    hit = _SUPPORT_CACHE.get(ck)
    if hit is not None and hit[0] is params:
        return hit[1], hit[2]

    prog = _SUPPORT_PROGS.get(pk)
    if prog is None:
        def _prog(p):
            if use_pallas:
                sigma_fn = make_pallas_sigma_fn(p[f"packed_{module}"], cfg)
            else:
                coarse_fn, fine_fn = make_xla_field_fns(model, p, cfg)
                field = coarse_fn if module == "coarse" else fine_fn
                sigma_fn = lambda xp: field(xp, jnp.ones_like(xp))[3]
            return support_bounds_from_sigma(sigma_fn, half, grid=grid)

        prog = jax.jit(_prog)
        _SUPPORT_PROGS[pk] = prog

    bounds = prog(params)
    valid = bool(np.asarray(bounds[3][0]))
    if len(_SUPPORT_CACHE) >= 16:
        _SUPPORT_CACHE.pop(next(iter(_SUPPORT_CACHE)))
    _SUPPORT_CACHE[ck] = (params, bounds, valid)
    return bounds, valid


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

    Ray-block precedence: explicit ``block_rays`` arg > user-set
    ``cfg.chunk_rays`` (reference knob, nerf_process.py:236; 0 = auto) >
    the auto-picked dispatch-economic block (_pick_block).
    """
    if block_rays is None and getattr(cfg, "chunk_rays", 0):
        block_rays = cfg.chunk_rays
    if getattr(cfg, "sp_shards", 0) > 1:
        return _make_sp_frame_renderer(model, cfg, H, W, K, mesh=mesh,
                                       block_rays=block_rays,
                                       stratified=stratified)
    if getattr(cfg, "render_cull", "none") == "auto" and cfg.N_samples_f > 0:
        return _make_culled_frame_renderer(model, cfg, H, W, K, mesh=mesh,
                                           block_rays=block_rays,
                                           stratified=stratified)
    return _make_dense_frame_renderer(model, cfg, H, W, K, mesh=mesh,
                                      block_rays=block_rays,
                                      stratified=stratified)


# -- compiled-renderer cache -------------------------------------------------
# The training loop's periodic test/render hooks (driver.py) and repeated
# run_test/run_render calls would otherwise build fresh jit closures each
# time — on the remote backend that is a 20-60 s recompile per program per
# hook.  Renderers are pure functions of (cfg scalars, H, W, K, mesh,
# block_rays, stratified): the model argument only supplies `apply`, which
# is itself determined by cfg (netDepth/netWidth/L_x/L_d), so it is safe to
# leave it out of the key.
_RENDERER_CACHE: dict = {}


def _mesh_cache_key(mesh):
    if mesh is None:
        return None
    return (tuple(mesh.axis_names), tuple(dict(mesh.shape).items()),
            tuple(d.id for d in mesh.devices.flat))


def _cfg_cache_key(cfg):
    return tuple(sorted(
        (k, v) for k, v in dataclasses.asdict(cfg).items()
        if isinstance(v, (bool, int, float, str, type(None)))))


def get_frame_renderer(model: NeRF, cfg, H: int, W: int, K,
                       mesh: Optional[object] = None,
                       block_rays: Optional[int] = None,
                       stratified: bool = True):
    """make_frame_renderer with caching across calls (same signature)."""
    ck = (_cfg_cache_key(cfg), int(H), int(W),
          np.asarray(K, np.float64).tobytes(), _mesh_cache_key(mesh),
          block_rays, stratified)
    renderer = _RENDERER_CACHE.get(ck)
    if renderer is None:
        renderer = make_frame_renderer(model, cfg, H, W, K, mesh=mesh,
                                       block_rays=block_rays,
                                       stratified=stratified)
        _RENDERER_CACHE[ck] = renderer
    return renderer


def _make_ray_gen(cfg, H, W, K, n_padded: int):
    """Traced ray generation for one camera, padded to the block multiple.
    Called INSIDE the jitted frame programs — on this backend every eager
    op is a ~20 ms dispatch, so nothing runs outside jit."""
    K = jnp.asarray(K, jnp.float32)
    focal = float(K[0, 0])

    def gen_rays(c2w):
        rays_o, rays_d = get_rays(H, W, K, c2w)
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        rays_o, rays_d = maybe_ndc(rays_o, rays_d, H, W, focal,
                                   cfg.data_type)
        n_pad = n_padded - H * W
        if n_pad:
            rays_o = jnp.concatenate(
                [rays_o, jnp.ones((n_pad, 3), rays_o.dtype)], 0)
            rays_d = jnp.concatenate(
                [rays_d, jnp.ones((n_pad, 3), rays_d.dtype)], 0)
        return rays_o, rays_d

    return gen_rays


def _pick_block(block_rays, n_mesh: int, n_padded_hint: int,
                default: int = _DEFAULT_BLOCK) -> int:
    """Ray-block size for the frame programs when no override is given
    (make_frame_renderer routes a user-set cfg.chunk_rays in as
    block_rays): on this backend small blocks mean many dispatches, and
    kernels tile internally, so big blocks are free."""
    block = block_rays or min(default, n_padded_hint)
    block = max(n_mesh, block - block % n_mesh) if n_mesh > 1 else block
    return block


def _make_dense_frame_renderer(model: NeRF, cfg, H: int, W: int, K,
                               mesh=None, block_rays=None,
                               stratified: bool = True):
    """Every ray through the full coarse(+fine) pipeline (exact path).
    One dispatch per ray block; block ~128k rays => an 800x800 frame is
    ~5 dispatches."""
    n_fine = cfg.N_samples_f
    use_pallas = _supports_pallas(cfg)
    n_mesh = _mesh_size(mesh)
    block = _pick_block(block_rays, n_mesh, H * W)
    n_total = H * W
    n_padded = n_total + ((-n_total) % block)
    gen_rays = _make_ray_gen(cfg, H, W, K, n_padded)

    def _field_fns(params):
        if use_pallas:
            coarse, fine = make_pallas_field_fns(
                params["packed_coarse"], params["packed_fine"], cfg)
            sigma = (make_pallas_sigma_fn(params["packed_coarse"], cfg)
                     if n_fine > 0 else None)
            return coarse, fine, sigma
        coarse, fine = make_xla_field_fns(model, params, cfg)
        return coarse, fine, None

    use_rays = _use_rays_kernels(cfg) and n_fine > 0
    interpret = _pallas_interpret()
    n_coarse = cfg.N_samples_c
    near, far = float(cfg.near), float(cfg.far)
    perturb = float(cfg.perturb)

    def _block_body(params, rays_o, rays_d, key):
        if use_rays:
            # ray-major kernels end-to-end: sigma-only coarse for weights,
            # hierarchical resample, full fine pass — no [3, P] planes
            from ..kernels.fused_mlp import (fused_mlp_eval_rays,
                                             fused_mlp_sigma_rays)
            m = rays_o.shape[0]
            key_c, key_f = jax.random.split(key)
            z_vals = stratified_z_vals(key_c, m, near, far, n_coarse,
                                       perturb=stratified)
            od = _pack_od(rays_o, rays_d)
            tile, pm = _rays_tiling(m)
            od_p, z_p = _pad_rays_z(od, z_vals.T, pm)
            sigma_t = fused_mlp_sigma_rays(
                od_p, z_p, params["packed_coarse"], L_x=cfg.L_x,
                tile_rays=tile, interpret=interpret,
                out_dtype=jnp.bfloat16)[:, :m]
            weights = weights_from_sigma_t(sigma_t, z_vals.T, rays_d).T
            z_all = hierarchical_z_vals(z_vals, weights, key_f,
                                        n_fine=n_fine, perturb=perturb)
            z_t = z_all.T
            od_p, z_p = _pad_rays_z(od, z_t, pm)
            r, g, b, sg = fused_mlp_eval_rays(
                od_p, z_p, params["packed_fine"], L_x=cfg.L_x, L_d=cfg.L_d,
                tile_rays=tile, interpret=interpret,
                out_dtype=jnp.bfloat16)
            out = volume_render_rays_t(r[:, :m], g[:, :m], b[:, :m],
                                       sg[:, :m], z_t, rays_d)
            return out.rgb, out.disp
        coarse, fine, sigma = _field_fns(params)
        out = render_rays_from_cfg(coarse, fine, rays_o, rays_d, key, cfg,
                                   stratified=stratified,
                                   coarse_sigma_fn=sigma)
        rgb = out.rgb_f if n_fine > 0 else out.rgb_c
        disp = out.disp_f if n_fine > 0 else out.disp_c
        return rgb, disp

    if n_mesh > 1:
        block_fn = _shard_over_rays(_block_body, mesh, 2)
    else:
        block_fn = _block_body

    @jax.jit
    def render_block(params, c2w, start, key):
        rays_o, rays_d = gen_rays(c2w)
        o = jax.lax.dynamic_slice_in_dim(rays_o, start, block, 0)
        d = jax.lax.dynamic_slice_in_dim(rays_d, start, block, 0)
        key = jax.random.fold_in(key, start)
        return block_fn(params, o, d, key)

    @jax.jit
    def _finalize(parts_rgb, parts_disp):
        rgb = jnp.concatenate(parts_rgb, 0)[:n_total]
        disp = jnp.concatenate(parts_disp, 0)[:n_total]
        return rgb.reshape(H, W, 3), disp.reshape(H, W)

    def _render(params, c2w, key):
        c2w = jnp.asarray(c2w)
        n_blocks = n_padded // block
        outs = [render_block(params, c2w, i * block, key)
                for i in range(n_blocks)]          # pipelined dispatches
        return _finalize([o[0] for o in outs], [o[1] for o in outs])

    if not use_pallas:
        return _render

    def render_with_packing(params, c2w, key):
        return _render(_pack_for_eval(params, cfg), c2w, key)

    return render_with_packing


def _make_sp_frame_renderer(model: NeRF, cfg, H: int, W: int, K,
                            mesh=None, block_rays=None,
                            stratified: bool = True):
    """Full-frame renderer with the SAMPLE axis sharded over the mesh
    'model' axis (``cfg.sp_shards``) — the SP/context-parallel analog wired
    into the production surface (round-2 VERDICT item 7).

    Per ray block: stratified coarse depths are built replicated, then a
    shard_map splits rays over 'data' (if present) x samples over 'model';
    each shard runs the field MLP only on its sample slice and the
    distributed log-space transmittance scan (parallel/sp.py) stitches the
    composite.  The hierarchical fine pass is included: coarse weights are
    all_gathered per ray (S_c floats), the inverse-CDF resample runs
    replicated, and the merged depths re-shard for the fine MLP.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
    from ..parallel.sp import sp_coarse_fine

    n_sp = int(cfg.sp_shards)
    assert mesh is not None and MODEL_AXIS in mesh.axis_names, (
        "sp_shards needs a mesh with a 'model' axis; set n_model_shards")
    assert dict(mesh.shape)[MODEL_AXIS] == n_sp, (dict(mesh.shape), n_sp)
    n_coarse, n_fine = cfg.N_samples_c, cfg.N_samples_f
    assert n_coarse % n_sp == 0, (n_coarse, n_sp)
    assert (n_coarse + n_fine) % n_sp == 0, (n_coarse, n_fine, n_sp)
    n_data = dict(mesh.shape).get(DATA_AXIS, 1)
    near, far = float(cfg.near), float(cfg.far)
    perturb = float(cfg.perturb)
    use_pallas = _supports_pallas(cfg)
    n_total = H * W
    block = _pick_block(block_rays, n_data, n_total)
    n_padded = n_total + ((-n_total) % block)
    gen_rays = _make_ray_gen(cfg, H, W, K, n_padded)

    def _field_fns(params):
        if use_pallas:
            return make_pallas_field_fns(
                params["packed_coarse"], params["packed_fine"], cfg)
        return make_xla_field_fns(model, params, cfg)

    def _sp_body(params, rays_o, rays_d, z_local, key):
        # shared SP coarse+fine body (parallel/sp.sp_coarse_fine) — one
        # implementation for the demo API and this production path
        coarse_fn, fine_fn = _field_fns(params)
        out_c, out_f = sp_coarse_fine(
            coarse_fn, fine_fn, rays_o, rays_d, z_local, key,
            n_fine=n_fine, perturb=perturb, axis_name=MODEL_AXIS)
        out = out_c if out_f is None else out_f
        return out.rgb, out.disp

    ray_spec = P(DATA_AXIS) if n_data > 1 else P()
    z_spec = (P(DATA_AXIS, MODEL_AXIS) if n_data > 1
              else P(None, MODEL_AXIS))
    sp_fn = jax.shard_map(
        _sp_body, mesh=mesh,
        in_specs=(P(), ray_spec, ray_spec, z_spec, P()),
        out_specs=(ray_spec, ray_spec), check_vma=False)

    @jax.jit
    def render_block(params, c2w, start, key):
        rays_o, rays_d = gen_rays(c2w)
        o = jax.lax.dynamic_slice_in_dim(rays_o, start, block, 0)
        d = jax.lax.dynamic_slice_in_dim(rays_d, start, block, 0)
        key = jax.random.fold_in(key, start)
        key_c, key_f = jax.random.split(key)
        z_vals = stratified_z_vals(key_c, block, near, far, n_coarse,
                                   perturb=stratified)
        return sp_fn(params, o, d, z_vals, key_f)

    @jax.jit
    def _finalize(parts_rgb, parts_disp):
        rgb = jnp.concatenate(parts_rgb, 0)[:n_total]
        disp = jnp.concatenate(parts_disp, 0)[:n_total]
        return rgb.reshape(H, W, 3), disp.reshape(H, W)

    def _render(params, c2w, key):
        c2w = jnp.asarray(c2w)
        outs = [render_block(params, c2w, i * block, key)
                for i in range(n_padded // block)]
        return _finalize([o[0] for o in outs], [o[1] for o in outs])

    if not use_pallas:
        return _render

    def render_with_packing(params, c2w, key):
        return _render(_pack_for_eval(params, cfg), c2w, key)

    return render_with_packing


def _trunc_classes(s_full: int, n_fine: int, trunc_eps: float):
    """Quantized truncated sample counts for the culled fine phase.
    {3/4, 7/8, 1}·S rounded up to the kernels' 8-row granularity — few
    enough that the per-(block, S) program set stays small."""
    if trunc_eps <= 0:
        return [s_full]
    cand = sorted({int(np.ceil(s_full * f / 8)) * 8 for f in (0.75, 0.875)})
    classes = [c for c in cand if n_fine < c < s_full]
    return classes + [s_full]


def _make_culled_frame_renderer(model: NeRF, cfg, H: int, W: int, K,
                                mesh=None, block_rays=None,
                                stratified: bool = True):
    """Two-phase occupancy-culled frame renderer (module docstring)."""
    n_coarse, n_fine = cfg.N_samples_c, cfg.N_samples_f
    near, far = float(cfg.near), float(cfg.far)
    tau = float(cfg.render_cull_tau)
    trunc_eps = float(getattr(cfg, "render_trunc_eps", 0.0))
    perturb = float(cfg.perturb)
    use_pallas = _supports_pallas(cfg)
    n_mesh = _mesh_size(mesh)
    n_total = H * W
    block = _pick_block(block_rays, n_mesh, n_total)
    n_padded = n_total + ((-n_total) % block)
    gen_rays = _make_ray_gen(cfg, H, W, K, n_padded)

    s_full = n_coarse + n_fine
    s_classes = _trunc_classes(s_full, n_fine, trunc_eps)

    use_rays = _use_rays_kernels(cfg)
    interpret = _pallas_interpret()

    # ---- phase-1 body: sigma-only coarse -> per-ray sampling stats -------
    def _coarse_body(params, rays_o, rays_d, key):
        m = rays_o.shape[0]
        z_vals = stratified_z_vals(key, m, near, far, n_coarse,
                                   perturb=stratified)
        if use_rays:
            # ray-major kernel: positions built in-kernel, no [3, P] plane
            from ..kernels.fused_mlp import fused_mlp_sigma_rays
            z_t = z_vals.T
            tile, pm = _rays_tiling(m)
            od, z_p = _pad_rays_z(_pack_od(rays_o, rays_d), z_t, pm)
            sigma_t = fused_mlp_sigma_rays(
                od, z_p, params["packed_coarse"],
                L_x=cfg.L_x, tile_rays=tile,
                interpret=interpret, out_dtype=jnp.bfloat16)[:, :m]
            weights = weights_from_sigma_t(sigma_t, z_t, rays_d).T
            return z_vals, weights
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
    # s_keep: composite only an s_keep-sample per-ray window of the sorted
    # merged depths (truncation_window): leading samples below the
    # cumulative-mass cut and trailing samples past the transmittance
    # collapse each carry O(trunc_eps) mass on the coarse estimate, and
    # phase 1 routes into this program only rays whose window requirement
    # s_req <= s_keep.
    _half_gf = _precull_half(cfg)

    def _fine_body(params, rays_o, rays_d, z_vals, weights, key, *,
                   s_keep=None, fb=None):
        if use_rays:
            from ..kernels.fused_mlp import fused_mlp_eval_rays
            m = rays_o.shape[0]
            z_all = hierarchical_z_vals(z_vals, weights, key,
                                        n_fine=n_fine, perturb=perturb)
            if s_keep is not None and s_keep < z_all.shape[-1]:
                z_all = truncation_window(z_all, z_vals, weights, s_keep,
                                          trunc_eps)
            z_t = z_all.T
            tile, pm = _rays_tiling(m)
            if fb is not None:
                # support-gated fine rows (cfg.render_gate_fine)
                r, g, b, sg = _gated_fine_rays(
                    params["packed_fine"], rays_o, rays_d, z_all, fb,
                    tile, pm, _half_gf, near, far, cfg.L_x, cfg.L_d,
                    interpret)
            else:
                od, z_p = _pad_rays_z(_pack_od(rays_o, rays_d), z_t, pm)
                r, g, b, sg = fused_mlp_eval_rays(
                    od, z_p, params["packed_fine"],
                    L_x=cfg.L_x, L_d=cfg.L_d, tile_rays=tile,
                    interpret=interpret, out_dtype=jnp.bfloat16)
                r, g, b, sg = (r[:, :m], g[:, :m], b[:, :m], sg[:, :m])
            out = volume_render_rays_t(r, g, b, sg, z_t, rays_d)
            return out.rgb, out.disp
        if use_pallas:
            _, fine_fn = make_pallas_field_fns(
                params["packed_coarse"], params["packed_fine"], cfg)
        else:
            _, fine_fn = make_xla_field_fns(model, params, cfg)
        out = hierarchical_fine_pass(fine_fn, rays_o, rays_d, z_vals,
                                     weights, key, n_fine=n_fine,
                                     perturb=perturb, n_keep=s_keep,
                                     trunc_eps=trunc_eps)
        return out.rgb, out.disp

    def _wrap_fine(s_keep, gated: bool = False):
        if gated:
            def body(params, fb, rays_o, rays_d, z_vals, weights, key):
                return _fine_body(params, rays_o, rays_d, z_vals, weights,
                                  key, s_keep=s_keep, fb=fb)
            if n_mesh > 1:
                return _shard_over_rays(body, mesh, 4, n_rep_args=2)
            return body
        body = functools.partial(_fine_body, s_keep=s_keep)
        if n_mesh > 1:
            return _shard_over_rays(body, mesh, 4)
        return body

    if n_mesh > 1:
        coarse_fn_b = _shard_over_rays(_coarse_body, mesh, 2)
    else:
        coarse_fn_b = _coarse_body

    # ---- gated coarse body (rays-kernel path only): phase-0 pre-cull
    # folded INTO the phase-1 program — pre-cullable rays are sorted last
    # and whole kernel tiles of them skip the MLP (_gated_sigma_t), so
    # pre-culling costs zero extra dispatches/syncs (the block-structured
    # _phase0 path below costs ~4 dispatches + 1 sync and measured as a
    # net loss on the v5e bench scenes — tools/bench_precull.py)
    _half_pc = _precull_half(cfg)

    def _coarse_body_gated(params, pc, rays_o, rays_d, key):
        m = rays_o.shape[0]
        z_vals = stratified_z_vals(key, m, near, far, n_coarse,
                                   perturb=stratified)
        tile, pm = _rays_tiling(m)
        sigma_t = _gated_sigma_t(params["packed_coarse"], rays_o, rays_d,
                                 z_vals, pc, tile, pm, _half_pc, near, far,
                                 cfg.L_x, interpret)
        weights = weights_from_sigma_t(sigma_t, z_vals.T, rays_d).T
        return z_vals, weights

    if n_mesh > 1:
        coarse_gated_b = _shard_over_rays(_coarse_body_gated, mesh, 2,
                                          n_rep_args=2)
    else:
        coarse_gated_b = _coarse_body_gated

    def _stats_tail(z_vals, weights):
        """Cull decision + per-ray sample requirements + background
        composite, from per-ray coarse stats (traced; shared by the
        single-program phase 1 and the pre-culled phase-1 tail)."""
        acc = jnp.sum(weights, -1)
        # padding rays never survive
        acc = jnp.where(jnp.arange(acc.shape[0]) < n_total, acc, -1.0)
        active = acc > tau
        if len(s_classes) > 1:
            # merged samples this ray needs: the coarse samples between
            # the leading-mass cut and the transmittance collapse (both
            # margin-adjusted — ops/render.truncation_bounds, shared with
            # phase 2's truncation_window so the window provably covers
            # the requirement), plus every fine sample — merged entries
            # in that depth range number at most (k_need - k_start) +
            # n_fine
            k_start, k_need = truncation_bounds(weights, trunc_eps)
            s_req = n_fine + k_need - k_start
        else:
            s_req = jnp.full(acc.shape, s_full, jnp.int32)
        # active rays first, ordered by how many samples they need, so
        # blocks of cheap rays run truncated fine programs
        sort_key = jnp.where(active, s_req, s_full + 2)
        order = jnp.argsort(sort_key)
        # cumulative class histogram; last entry (s_req <= s_full, always
        # true for active rays) is the active count — ONE small host fetch
        class_cum = jnp.stack([jnp.sum(sort_key <= c) for c in s_classes])
        # composite for culled rays from coarse stats alone: the white-
        # background term dominates (rgb within tau/2 of the exact coarse
        # composite); disp follows the reference formula on coarse stats
        rgb0 = jnp.broadcast_to((1.0 - 0.5 * jnp.maximum(acc, 0.0))[:, None],
                                (acc.shape[0], 3))
        depth = jnp.sum(weights * z_vals, -1)
        disp0 = _disp_from(depth, acc)
        return order, class_cum, rgb0, disp0

    @jax.jit
    def _phase1(params, c2w, key):
        """ONE program: ray generation, coarse stats for every ray, the
        cull decision, per-ray sample requirements, and the background
        composite for culled rays."""
        rays_o, rays_d = gen_rays(c2w)
        key = jax.random.fold_in(key, 0)
        z_vals, weights = coarse_fn_b(params, rays_o, rays_d, key)
        order, class_cum, rgb0, disp0 = _stats_tail(z_vals, weights)
        return (rays_o, rays_d, z_vals, weights, order, class_cum,
                rgb0, disp0)

    @jax.jit
    def _phase1_gated(params, pc, c2w, key):
        """ONE program like _phase1, with the pre-cull folded in as
        kernel-tile gating (rays-kernel path only)."""
        rays_o, rays_d = gen_rays(c2w)
        key = jax.random.fold_in(key, 0)
        z_vals, weights = coarse_gated_b(params, pc, rays_o, rays_d, key)
        order, class_cum, rgb0, disp0 = _stats_tail(z_vals, weights)
        return (rays_o, rays_d, z_vals, weights, order, class_cum,
                rgb0, disp0)

    # ---- phase-0 pre-cull programs (cfg.render_precull; module docstring
    # of ops/occupancy.py): rays whose [near, far] segment provably misses
    # the coarse field's sigma>0 support skip the coarse MLP entirely.
    # Used on the non-rays-kernel paths only — the rays path uses the
    # dispatch-free gated phase 1 above.

    @jax.jit
    def _phase0(c2w, lo, hi, radius, valid):
        """Ray generation + conservative bounds test.  Hit rays first in
        ``order0``; ONE small host fetch of the hit count.  Rays whose
        sample segment leaves the estimation cube are never pre-culled
        (the grid saw nothing out there — ops/occupancy.segment_in_cube).
        The stat buffers start as (linspace z, zero weights): a
        zero-weight row composites to exactly the white background in the
        tail, and any miss ray a later block touches anyway (phase-1/2
        cover overhang) renders the real field — zero density along it —
        so every path agrees on miss rays."""
        rays_o, rays_d = gen_rays(c2w)
        hit = ray_hits_bounds(rays_o, rays_d, lo, hi, radius, valid,
                              near, far)
        hit = hit | ~segment_in_cube(rays_o, rays_d, _half_pc, near, far)
        hit = hit & (jnp.arange(rays_o.shape[0]) < n_total)
        order0 = jnp.argsort(jnp.where(hit, 0, 1))
        n_hit = jnp.sum(hit)
        z_buf = jnp.broadcast_to(
            jnp.linspace(near, far, n_coarse, dtype=jnp.float32)[None],
            (rays_o.shape[0], n_coarse))
        w_buf = jnp.zeros((rays_o.shape[0], n_coarse), jnp.float32)
        return rays_o, rays_d, order0, n_hit, z_buf, w_buf

    def _make_phase1_block(blk):
        @functools.partial(jax.jit, donate_argnums=(5, 6))
        def _p1(params, rays_o, rays_d, order0, start, z_buf, w_buf, key):
            """Coarse stats for one compacted block of bounds-hit rays,
            scattered into the (donated) full-frame stat buffers —
            phase 2 then gathers by original ray id exactly as in the
            non-preculled path."""
            idx = jax.lax.dynamic_slice_in_dim(order0, start, blk, 0)
            key = jax.random.fold_in(jax.random.fold_in(key, 2), start)
            z_vals, weights = coarse_fn_b(params, rays_o[idx], rays_d[idx],
                                          key)
            return z_buf.at[idx].set(z_vals), w_buf.at[idx].set(weights)

        return _p1

    _phase1_blocks: dict = {}

    def _get_phase1_block(sz):
        fn = _phase1_blocks.get(sz)
        if fn is None:
            fn = _make_phase1_block(sz)
            _phase1_blocks[sz] = fn
        return fn

    @jax.jit
    def _phase1_tail(z_buf, w_buf):
        return _stats_tail(z_buf, w_buf)

    def _make_phase2(blk, s_keep, gated: bool = False):
        fine_fn_b = _wrap_fine(None if s_keep >= s_full else s_keep,
                               gated=gated)

        if gated:
            @functools.partial(jax.jit, donate_argnums=(8, 9))
            def _phase2_g(params, fb, rays_o, rays_d, z_all, w_all, order,
                          start, rgb_frame, disp_frame, key):
                """_phase2 with the FINE module's support bounds threaded
                through to the row-gated fine kernel."""
                idx = jax.lax.dynamic_slice_in_dim(order, start, blk, 0)
                key = jax.random.fold_in(key, 1 + start)
                rgb, disp = fine_fn_b(params, fb, rays_o[idx], rays_d[idx],
                                      z_all[idx], w_all[idx], key)
                return (rgb_frame.at[idx].set(rgb),
                        disp_frame.at[idx].set(disp))

            return _phase2_g

        @functools.partial(jax.jit, donate_argnums=(7, 8))
        def _phase2(params, rays_o, rays_d, z_all, w_all, order, start,
                    rgb_frame, disp_frame, key):
            """Gather one compacted block of surviving rays, fine-render
            it at s_keep merged samples, and scatter into the (donated)
            frame — one program per (block size, sample count).  ``start``
            is a traced scalar so blocks of the same shape share one
            program."""
            idx = jax.lax.dynamic_slice_in_dim(order, start, blk, 0)
            key = jax.random.fold_in(key, 1 + start)  # phase 1 used (.,0)
            rgb, disp = fine_fn_b(params, rays_o[idx], rays_d[idx],
                                  z_all[idx], w_all[idx], key)
            return rgb_frame.at[idx].set(rgb), disp_frame.at[idx].set(disp)

        return _phase2

    # mixed block sizes: the surviving-ray count is covered greedily by
    # {block, block/2, block/4, block/8}-sized programs, so the wasted
    # fine-MLP work in the final partial block is at most block/8 rays
    # (~16k at the default block, ~24 ms of fine MLP) instead of a full
    # block; each (size, sample-count) program compiles once (~1 min on
    # the remote backend, only the combinations a scene actually uses)
    # and is reused across frames
    _sizes = []
    for sz in (block, block // 2, block // 4, block // 8):
        if sz >= max(8, n_mesh) and sz % max(1, n_mesh) == 0 and sz % 8 == 0:
            _sizes.append(sz)
    _sizes = _sizes or [block]
    _phase2_cache: dict = {}

    def _get_phase2(sz, s_keep, gated: bool = False):
        fn = _phase2_cache.get((sz, s_keep, gated))
        if fn is None:
            fn = _make_phase2(sz, s_keep, gated)
            _phase2_cache[(sz, s_keep, gated)] = fn
        return fn

    def _cover_plain(n: int):
        """Greedy (start, size) decomposition covering >= n rays with the
        mixed block sizes (waste in the final partial block bounded by the
        smallest size)."""
        g = _sizes[-1]
        rem = -(-n // g) * g
        out, pos = [], 0
        for sz in _sizes:
            while rem >= sz:
                out.append((pos, sz))
                pos += sz
                rem -= sz
        return out

    def _cover(n_act: int, cum):
        """Greedy (start, size, s_keep) decomposition covering >= n_act
        rays.  The block's sample count is the class of its LAST covered
        active ray (rays are sorted ascending by s_req, so it bounds every
        ray in the block); overhang rays past n_act are culled rays whose
        value is tau-bounded regardless."""
        out = []
        for pos, sz in _cover_plain(n_act):
            end = min(pos + sz, n_act)
            s_keep = next(c for c, cc in zip(s_classes, cum) if cc >= end)
            out.append((pos, sz, s_keep))
        return out

    @jax.jit
    def _finalize(rgb_frame, disp_frame):
        return (rgb_frame[:n_total].reshape(H, W, 3),
                disp_frame[:n_total].reshape(H, W))

    use_precull = _use_precull(cfg)
    use_gate_fine = _use_gate_fine(cfg) and use_rays

    def _render(params, c2w, key):
        c2w = jnp.asarray(c2w)
        bounds_valid = False
        if use_precull:
            bounds, bounds_valid = _support_for_eval(model, params, cfg)
        fb, fvalid = None, False
        if use_gate_fine:
            fb, fvalid = _support_for_eval(model, params, cfg,
                                           module="fine")
        if bounds_valid and use_rays:
            (rays_o, rays_d, z_all, w_all, order, class_cum, rgb_frame,
             disp_frame) = _phase1_gated(params, bounds, c2w, key)
        elif bounds_valid:
            (rays_o, rays_d, order0, n_hit, z_all,
             w_all) = _phase0(c2w, *bounds)
            n_hit = int(np.asarray(n_hit))        # host sync 1 of 2
            for start, sz in _cover_plain(n_hit):
                z_all, w_all = _get_phase1_block(sz)(
                    params, rays_o, rays_d, order0, start, z_all, w_all,
                    key)
            order, class_cum, rgb_frame, disp_frame = _phase1_tail(
                z_all, w_all)
        else:
            (rays_o, rays_d, z_all, w_all, order, class_cum, rgb_frame,
             disp_frame) = _phase1(params, c2w, key)
        cum = np.asarray(class_cum)               # one host sync per frame
        n_act = int(cum[-1])
        for start, sz, s_keep in _cover(n_act, cum):
            if fvalid:
                rgb_frame, disp_frame = _get_phase2(sz, s_keep, True)(
                    params, fb, rays_o, rays_d, z_all, w_all, order,
                    start, rgb_frame, disp_frame, key)
            else:
                rgb_frame, disp_frame = _get_phase2(sz, s_keep)(
                    params, rays_o, rays_d, z_all, w_all, order,
                    start, rgb_frame, disp_frame, key)
        return _finalize(rgb_frame, disp_frame)

    if not use_pallas:
        return _render

    def render_with_packing(params, c2w, key):
        return _render(_pack_for_eval(params, cfg), c2w, key)

    return render_with_packing
