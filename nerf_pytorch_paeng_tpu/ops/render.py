"""The coarse→fine render pipeline as a single traced XLA program.

Behavioral parity target: reference nerf_process.py:185-252
(render_rays / batchify_rays_and_render_by_chunk).  Unlike the reference —
which loops on the host over 4096-ray and 524288-point chunks — the whole
pipeline here is one jit-traced function: stratified sampling, positional
encoding, the coarse MLP, compositing, inverse-CDF fine sampling, the fine
MLP and the second composite all fuse into one XLA program that keeps the
~1M point activations on-chip and feeds the MXU with one large batched
matmul per layer.

Full-frame rendering (`render_frame`) blocks the 640k rays of an 800×800
frame through `jax.lax.map` over fixed-size ray blocks purely to bound HBM
working-set size — block size is a memory knob, not a host loop.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .posenc import positional_encoding
from .rays import ndc_rays
from .sampling import sample_pdf, stratified_z_vals
from .volume import volume_render_planar


class RaysRender(NamedTuple):
    rgb_c: jnp.ndarray
    disp_c: jnp.ndarray
    rgb_f: Optional[jnp.ndarray]
    disp_f: Optional[jnp.ndarray]
    acc_f: Optional[jnp.ndarray]
    depth_f: Optional[jnp.ndarray]
    # fraction of (ray-tile, sample-row) kernel grid steps the occupancy
    # gating skipped (train_precull observability; None when ungated)
    gate_frac: Optional[jnp.ndarray] = None


def make_xla_field_fns(model, params, cfg):
    """Field functions ``(xplane [3,P], dplane [3,P]) -> raw [4,P]`` on the
    XLA path: positional-encode, then the flax MLP in compiled point-chunks.

    The planar (feature-major) protocol is the kernels' native layout; the
    XLA path transposes at its boundary (a few ms per 3M points)."""
    from ..models.nerf import NeRF  # local import to avoid a cycle

    def build(method):
        def fn(xplane, dplane):
            emb = jnp.concatenate(
                [positional_encoding(xplane.T, cfg.L_x),
                 positional_encoding(dplane.T, cfg.L_d)], axis=-1)
            apply1 = lambda x: model.apply({"params": params}, x,
                                           method=method)
            return chunked_apply(apply1, emb, cfg.chunk_pts).T
        return fn

    return build(NeRF.coarse_fwd), build(NeRF.fine_fwd)


def _pallas_interpret() -> bool:
    """Run Pallas kernels in interpreter mode off-TPU (tests, dryruns)."""
    return jax.default_backend() != "tpu"


def make_pallas_train_field_fns(params, cfg, tile: int = 1024):
    """Differentiable field functions on the fused custom-VJP kernel pair
    (kernels/fused_mlp_vjp.py).  Packing happens inside the trace, so
    autodiff maps packed grads back to the flax tree automatically."""
    from ..kernels.fused_mlp import pack_nerf_mlp_params
    from ..kernels.fused_mlp_vjp import fused_mlp_train

    interpret = _pallas_interpret()

    def build(mlp_params):
        packed = pack_nerf_mlp_params(mlp_params, L_x=cfg.L_x, L_d=cfg.L_d)

        def fn(xplane, dplane):
            p = xplane.shape[-1]
            pad = (-p) % tile
            if pad:
                xplane = jnp.concatenate(
                    [xplane, jnp.zeros((3, pad), xplane.dtype)], 1)
                dplane = jnp.concatenate(
                    [dplane, jnp.ones((3, pad), dplane.dtype)], 1)
            out = fused_mlp_train(packed, xplane, dplane,
                                  L_x=cfg.L_x, L_d=cfg.L_d, tile=tile,
                                  interpret=interpret)
            return out[:4, :p]
        fn._is_pallas = True
        return fn

    return build(params["coarse"]), build(params["fine"])


def make_pallas_field_fns(packed_coarse, packed_fine, cfg, tile: int = 8192):
    # NOTE: tile 16384 is ~10% faster in isolation but its activation
    # buffers oversubscribe VMEM (2x [256,16384] bf16 alone is 16MB) and
    # nondeterministically crash the TPU runtime; 8192 is stable.
    """Field functions on the fused Pallas kernel (kernels/fused_mlp.py):
    feature-major planes in, [P,4] raw out.  Eval path only (no VJP)."""
    from ..kernels.fused_mlp import fused_mlp_eval

    interpret = _pallas_interpret()

    def build(packed):
        def fn(xplane, dplane):
            p = xplane.shape[-1]
            pad = (-p) % tile
            if pad:
                xplane = jnp.concatenate(
                    [xplane, jnp.zeros((3, pad), xplane.dtype)], 1)
                dplane = jnp.concatenate(
                    [dplane, jnp.ones((3, pad), dplane.dtype)], 1)
            # bf16 raw output halves the [8,P] HBM write; the composite
            # upcasts to fp32 anyway
            out = fused_mlp_eval(xplane, dplane, packed,
                                 L_x=cfg.L_x, L_d=cfg.L_d, tile=tile,
                                 interpret=interpret,
                                 out_dtype=jnp.bfloat16)
            return out[:4, :p]
        fn._is_pallas = True
        return fn

    return build(packed_coarse), build(packed_fine)


def make_pallas_sigma_fn(packed_coarse, cfg, tile: int = 8192):
    """Density-only coarse field fn ``xplane [3,P] -> sigma [P]`` (row 0
    of the kernel's [8,P] output) on the trunk+density kernel — used for evaluation where the
    coarse pass only produces sampling weights."""
    from ..kernels.fused_mlp import fused_mlp_sigma

    interpret = _pallas_interpret()

    def fn(xplane):
        p = xplane.shape[-1]
        pad = (-p) % tile
        if pad:
            xplane = jnp.concatenate(
                [xplane, jnp.zeros((3, pad), xplane.dtype)], 1)
        out = fused_mlp_sigma(xplane, packed_coarse, L_x=cfg.L_x, tile=tile,
                              interpret=interpret, out_dtype=jnp.bfloat16)
        return out[0, :p]
    return fn


def _train_rays_tile(m: int):
    """Ray-tile for the training kernels (None = unsupported shape,
    falling back to the plane-based path).  Lane-aligned: the tile must
    be a multiple of 128 lanes (Mosaic block alignment) and divide the
    ray count.  2048 measured fastest for the fwd+bwd pair on v5e
    (1024: +7%, 4096: +6%)."""
    if m % 128 != 0:
        return None
    # m is a positive multiple of 128 here, so the 128 candidate always
    # divides it — the loop cannot fall through
    return next(t for t in (2048, 1024, 512, 256, 128) if m % t == 0)


def supports_train_rays_kernels(cfg, n_rays: int) -> bool:
    """Gate for the ray-major custom-VJP training path."""
    s_merged = cfg.N_samples_c + cfg.N_samples_f
    return (cfg.N_samples_c % 8 == 0
            and (cfg.N_samples_f == 0 or s_merged % 8 == 0)
            and _train_rays_tile(n_rays) is not None)


def train_support_intervals(rays_o, rays_d, bounds, half: float,
                            near: float, far: float):
    """Per-ray conservative support interval for one MLP module's bounds
    (``bounds`` = (lo, hi, radius, valid) from
    ops/occupancy.support_bounds_from_sigma), with the two eval-path
    safety rails applied: rays whose [near, far] segment leaves the
    estimation cube get the full interval (the grid certifies nothing out
    there), and invalid bounds widen every ray to [near, far] (inside
    ray_support_interval).  Returns (t_lo [N], t_hi [N])."""
    from .occupancy import ray_support_interval, segment_in_cube
    t_lo, t_hi = ray_support_interval(rays_o, rays_d, *bounds, near, far)
    inside = segment_in_cube(rays_o, rays_d, half, near, far)
    return (jnp.where(inside, t_lo, near), jnp.where(inside, t_hi, far))


def train_gate_tile(cfg, n: int, base_tile: int) -> int:
    """Ray-tile for the GATED training kernels.  Smaller than the ungated
    pair's 2048: gating is per (tile, row) and a 4096-ray batch needs
    enough tiles for the sorted miss rays to fill whole tiles (eval's
    640k-ray frames get this for free); cfg.train_precull_tile overrides
    (0 = auto, 512 measured best on v5e — see docs/STATUS_ROUND3.md)."""
    gt = int(getattr(cfg, "train_precull_tile", 0))
    want = max(128, min(gt or min(base_tile, 512), n))
    # largest 128-multiple divisor of n that is <= the requested tile:
    # the gated kernels require tile % 128 == 0 AND n % tile == 0, and a
    # user tile like 384 satisfies neither after naive halving
    for tile in range(want - want % 128, 127, -128):
        if n % tile == 0:
            return tile
    return 128


def span_sort(act):
    """Sort rays by their (first, last) active-row span so kernel
    ray-tiles share spans; span-empty rays (provable misses — every
    sample row inactive) sort last and gate whole tiles.

    act [N, R] bool (ray-major row activity) -> (order [N], inv [N])
    with ``inv`` the inverse permutation (argsort is stable, so the plan
    is deterministic).  THE single implementation of the span-key
    ordering both gated paths use — the gated kernels' flattened-gate
    indexing contract (see tile_row_gate) must match it exactly.
    """
    n, n_rows = act.shape
    any_act = act.any(1)
    first = jnp.argmax(act, 1)
    last = (n_rows - 1) - jnp.argmax(act[:, ::-1], 1)
    span_key = jnp.where(any_act, first * (n_rows + 1) + last,
                         n_rows * (n_rows + 2))
    order = jnp.argsort(span_key)                             # stable
    inv = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return order, inv


def tile_row_gate(act_sorted, tile: int):
    """Per-(ray-tile, sample-row) gate over span-sorted (and, for eval,
    pad-extended) row activity: a grid step runs iff ANY ray in its tile
    is active in its row.

    act_sorted [N, R] bool -> (gate [(N//tile)*R] int32, gate_frac
    scalar).  The flattening is tile-major — gate[t * R + r] — exactly
    the ``gate_ref[pid0 * n_rows + pid1]`` lookup of the gated kernels
    (kernels/fused_mlp._sigma_rays_kernel_gated and the gated custom-VJP
    pair); this helper is the only place that contract is encoded.
    """
    n, n_rows = act_sorted.shape
    gate = act_sorted.reshape(n // tile, tile, n_rows).any(1)  # [T, R]
    gate = gate.reshape(-1).astype(jnp.int32)
    gate_frac = 1.0 - jnp.mean(gate.astype(jnp.float32))
    return gate, gate_frac


def train_gate_plan(zs, t_lo, t_hi, tile: int):
    """Span-sorted (ray-tile, 8-sample-row) gate plan for one gated
    training pass (span_sort + tile_row_gate over the samples' row
    activity against the module's support interval).

    zs [S, N] (S % 8 == 0) sample depths, [t_lo, t_hi] [N] the module's
    conservative support interval.  Returns (order [N], inv [N],
    gate [(N//tile)*(S//8)] int32, gate_frac scalar) — gate_frac is the
    fraction of kernel grid steps skipped.
    """
    s, n = zs.shape
    n_rows = s // 8
    act = (zs >= t_lo[None]) & (zs <= t_hi[None])             # [S, N]
    act_r = act.reshape(n_rows, 8, n).any(1).T                # [N, R]
    order, inv = span_sort(act_r)
    gate, gate_frac = tile_row_gate(act_r[order], tile)
    return order, inv, gate, gate_frac


def _gated_train_pass(packed, od, z_t, t_lo, t_hi, tile, cfg, interpret):
    """One occupancy-gated training MLP pass (fwd + custom-VJP bwd).

    Every sample with depth outside the module's conservative support
    interval [t_lo, t_hi] provably has a <= 0 density logit, so (a) the
    forward may store zeros for it (identical zero compositing weights)
    and (b) its backward contribution is identically zero (relu' kills
    the sigma cotangent, the zero weight kills the rgb cotangents) — the
    gated kernels skip whole (ray-tile, 8-sample-row) grid steps where
    every sample qualifies.  Rays are sorted by their active-row span so
    tiles share spans (the eval pre-cull's trick, eval/frame._gated_sigma_t)
    and the outputs are unsorted back, so everything outside the kernels —
    RNG assignment, composites, loss reductions — runs in the original
    ray order: the forward is bit-equal to the ungated pass, gradients
    equal up to fp32 accumulation order (tile membership changes the
    kernel's grad-sum order).

    z_t [S, N] (S % 8 == 0); od [8, N]; t_lo/t_hi [N].
    """
    from ..kernels.fused_mlp_vjp import fused_mlp_train_rays

    s, n = z_t.shape
    tile = train_gate_tile(cfg, n, tile)
    assert n % tile == 0 and tile % 128 == 0 and s % 8 == 0, (s, n, tile)
    order, inv, gate, gate_frac = train_gate_plan(
        jax.lax.stop_gradient(z_t), t_lo, t_hi, tile)
    r, g, b, sg = fused_mlp_train_rays(
        packed, od[:, order], z_t[:, order], L_x=cfg.L_x, L_d=cfg.L_d,
        tile_rays=tile, s_rows=8, interpret=interpret, gate=gate)
    return (r[:, inv], g[:, inv], b[:, inv], sg[:, inv]), gate_frac


def render_rays_train(params, rays_o, rays_d, key, cfg,
                      support=None) -> "RaysRender":
    """Training render on the ray-major custom-VJP kernel pair: positions
    built in-kernel from [8,N] rays + [S,N] depths (no [3,P] plane buffers
    anywhere), transposed composites, residual-free Pallas backward.

    Numerically the same pipeline as render_rays with the plane-based
    train kernels (reference nerf_process.py:185-213 semantics: full
    coarse for loss_c, detached hierarchical fine resample, merged fine
    pass); gradient parity is tested in tests/test_kernels_vjp.py.

    ``support`` (cfg.train_precull; train/precull.py) = ((lo, hi, radius,
    valid) coarse bounds, same for the fine module, half_side): each
    pass's MLP work is occupancy-gated to its OWN module's conservative
    support interval (_gated_train_pass — the two modules are independent
    networks, so the coarse bounds certify nothing about the fine field).
    Forward/loss bit-equal to ungated; grads equal up to fp32 sum order.
    """
    from ..kernels.fused_mlp import pack_nerf_mlp_params
    from ..kernels.fused_mlp_vjp import fused_mlp_train_rays
    from .volume import volume_render_rays_t

    interpret = _pallas_interpret()
    n = rays_o.shape[0]
    tile = _train_rays_tile(n)
    assert tile is not None, n
    key_c, key_f = jax.random.split(key)
    packed_c = pack_nerf_mlp_params(params["coarse"], L_x=cfg.L_x,
                                    L_d=cfg.L_d)
    packed_f = pack_nerf_mlp_params(params["fine"], L_x=cfg.L_x,
                                    L_d=cfg.L_d)
    od = jnp.concatenate(
        [rays_o.T, rays_d.T, jnp.zeros((2, n), rays_o.dtype)], 0)

    near, far = float(cfg.near), float(cfg.far)
    if support is not None:
        bounds_c, bounds_f, half = support
        iv_c = train_support_intervals(rays_o, rays_d, bounds_c, half,
                                       near, far)
        iv_f = train_support_intervals(rays_o, rays_d, bounds_f, half,
                                       near, far)

    # forward sample-row unroll: 16 measured faster than 8 on v5e for the
    # training forward (tools/bench_train_kernels.py: 6.09 vs 6.39 ms at
    # 192x4096); the backward keeps its one-row body (8-row blocks).  The
    # gated path pins s_rows=8 — the canonical gate granularity.
    s_rows = lambda s: 16 if s % 16 == 0 else 8
    z_vals = stratified_z_vals(key_c, n, near, far,
                               cfg.N_samples_c, perturb=True)
    gate_frac = None
    if support is not None:
        (r, g, b, sg), gf_c = _gated_train_pass(packed_c, od, z_vals.T,
                                                *iv_c, tile, cfg, interpret)
        gate_frac = gf_c
    else:
        r, g, b, sg = fused_mlp_train_rays(
            packed_c, od, z_vals.T, L_x=cfg.L_x, L_d=cfg.L_d,
            tile_rays=tile, interpret=interpret,
            s_rows=s_rows(cfg.N_samples_c))
    out_c = volume_render_rays_t(r, g, b, sg, z_vals.T, rays_d)
    if cfg.N_samples_f <= 0:
        return RaysRender(out_c.rgb, out_c.disp, None, None, None, None,
                          gate_frac)

    z_all = hierarchical_z_vals(z_vals, out_c.weights.T, key_f,
                                n_fine=cfg.N_samples_f,
                                perturb=float(cfg.perturb))
    z_t = jax.lax.stop_gradient(z_all.T)
    s_merged = cfg.N_samples_c + cfg.N_samples_f
    if support is not None:
        (r, g, b, sg), gf_f = _gated_train_pass(packed_f, od, z_t, *iv_f,
                                                tile, cfg, interpret)
        # grid-step fraction over both passes, weighted by sample count
        # (the kernels' cost is proportional to active row-steps)
        gate_frac = (gate_frac * cfg.N_samples_c + gf_f * s_merged) / (
            cfg.N_samples_c + s_merged)
    else:
        r, g, b, sg = fused_mlp_train_rays(
            packed_f, od, z_t, L_x=cfg.L_x, L_d=cfg.L_d,
            tile_rays=tile, interpret=interpret, s_rows=s_rows(s_merged))
    out_f = volume_render_rays_t(r, g, b, sg, z_t, rays_d)
    return RaysRender(out_c.rgb, out_c.disp, out_f.rgb, out_f.disp,
                      out_f.acc, out_f.depth, gate_frac)


def hierarchical_z_vals(z_vals, weights, key, *, n_fine: int,
                        perturb: float = 1.0) -> jnp.ndarray:
    """Merged, sorted coarse+fine depths from the coarse sampling stats
    (reference nerf_process.py:200-204 + the :67 merge-sort).
    z_vals [M, Sc] sorted, weights [M, Sc] -> [M, Sc + n_fine].

    Note: an experiment that merged only the top-k coarse samples by
    weight (to cut fine-MLP work) lost ~10 dB on soft volumetric content —
    in soft media the coarse weights are NOT concentrated and every coarse
    sample carries real mass, so the full merge is required for quality
    (the reference semantics, kept exactly)."""
    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_samples = sample_pdf(key, z_mid, weights[..., 1:-1], n_fine,
                           det=(perturb == 0.0))
    z_samples = jax.lax.stop_gradient(z_samples)
    return jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)


def truncation_bounds(weights, eps: float):
    """Per-ray coarse-sample window [k_start, k_need) for eval/frame.py's
    sample truncation: k_start is one bin BEFORE the first coarse sample
    where the cumulative coarse weight reaches ``eps`` and k_need one bin
    past the transmittance collapse (remaining T <= eps).

    The one-bin safety margin on each side is load-bearing, not
    belt-and-braces: ``sample_pdf`` bins fine samples by coarse-depth
    MIDPOINTS (hierarchical_z_vals), so fine samples belonging to the
    front bin k_start land as low as (z[k_start-1]+z[k_start])/2 —
    strictly below z[k_start].  Cutting at z[k_start] would drop up to
    half the front bin's fine samples, which carry the surface's mass
    even when coarse and fine models agree perfectly (measured ~0.25 dB
    on a hard-front scene; with the margin < 0.02 dB).  Symmetrically
    for the collapse bin at the tail.

    weights [M, Sc] -> (k_start [M], k_need [M]) with
    0 <= k_start <= k_need <= Sc."""
    nc = weights.shape[-1]
    cum = jnp.cumsum(weights, -1)
    rem = 1.0 - cum
    k_need = jnp.minimum(jnp.sum(rem > eps, -1) + 2, nc)
    k_start = jnp.maximum(jnp.sum(cum < eps, -1) - 1, 0)
    return k_start, jnp.maximum(k_need, k_start)


def truncation_window(z_all, z_vals, weights, n_keep: int, eps: float):
    """Per-ray ``n_keep``-sample window of the sorted merged depths,
    skipping leading samples with negligible mass and trailing samples
    past the transmittance collapse (eval/frame.py's sample truncation).

    The window starts at the margin-adjusted leading-mass cut
    (truncation_bounds): every merged entry before z[k_start] — leading
    coarse samples plus the fine samples strictly below the front bin —
    carries estimated mass < eps in total, so dropping them changes the
    composite by O(eps).  The caller guarantees via eval/frame.py's
    per-ray class assignment that n_keep covers every merged sample from
    that point to the (margin-adjusted) transmittance collapse; the
    clamp at the array end only ever moves the window *earlier* (extra
    low-mass leading samples, never lost tail samples).

    z_all [M, S] sorted merged depths; z_vals/weights [M, Sc] coarse
    stats -> [M, n_keep].
    """
    if eps > 0:
        k_start, _ = truncation_bounds(weights, eps)            # [M]
        nc = z_vals.shape[-1]
        # z_vals[k_start] via one-hot select — NOT take_along_axis: TPU
        # lowers per-row gathers to a ~50M elem/s scalar fusion (a [131k,
        # 168] window gather measured 440 ms/call vs ~5 ms for a sort)
        sel = jnp.arange(nc)[None, :] == jnp.minimum(k_start, nc - 1)[:, None]
        z_cut = jnp.sum(jnp.where(sel, z_vals, 0.0), -1, keepdims=True)
        m_start = jnp.sum(z_all < z_cut, -1)
        m_start = jnp.clip(m_start, 0, z_all.shape[-1] - n_keep)
        # window select, gather-free: push the m_start leading entries to
        # +inf and re-sort (stable for the already-sorted valid suffix,
        # which lands contiguously at the front), then slice.  The clip
        # above guarantees >= n_keep finite entries per row, so the slice
        # never reads a masked value.
        masked = jnp.where(jnp.arange(z_all.shape[-1])[None, :]
                           < m_start[:, None], jnp.inf, z_all)
        return jnp.sort(masked, -1)[:, :n_keep]
    return z_all[:, :n_keep]


def hierarchical_fine_pass(fine_fn, rays_o, rays_d, z_vals, weights, key, *,
                           n_fine: int, perturb: float = 1.0,
                           scan_impl: str = "cumprod",
                           n_keep: Optional[int] = None,
                           trunc_eps: float = 0.0):
    """The hierarchical (fine) pass on an arbitrary set of rays, given the
    coarse sampling stats: inverse-CDF resample, merge, fine MLP, composite.

    Reference nerf_process.py:200-213.  Standalone so the occupancy-culled
    frame renderer (eval/frame.py) can run it on a compacted ray subset.

    Args:
      rays_o/rays_d: [M, 3]; z_vals: [M, Sc] coarse depths (sorted);
      weights: [M, Sc] coarse compositing weights.
      n_keep: if set, composite only an n_keep-sample window of the sorted
        merged depths (per-ray sample truncation, eval/frame.py):
        trailing samples past the coarse transmittance collapse always
        drop (error <= the coarse transmittance at the cut); with
        trunc_eps > 0 the window also skips leading samples carrying
        < trunc_eps cumulative coarse mass (see truncation_window).
    Returns a volume.RenderOutputs over the merged Sc+n_fine samples.
    """
    m = rays_o.shape[0]
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    z_all = hierarchical_z_vals(z_vals, weights, key, n_fine=n_fine,
                                perturb=perturb)
    if n_keep is not None and n_keep < z_all.shape[-1]:
        z_all = truncation_window(z_all, z_vals, weights, n_keep, trunc_eps)
    s = z_all.shape[-1]
    xp = (rays_o.T[:, :, None] + rays_d.T[:, :, None]
          * z_all[None]).reshape(3, -1)
    dp = jnp.broadcast_to(viewdirs.T[:, :, None], (3, m, s)).reshape(3, -1)
    raw = fine_fn(xp, dp).reshape(4, m, s)
    return volume_render_planar(raw, z_all, rays_d, scan_impl)


def chunked_apply(fn: Callable[[jnp.ndarray], jnp.ndarray], x: jnp.ndarray,
                  chunk_pts: int) -> jnp.ndarray:
    """Apply the MLP over point-chunks of at most ``chunk_pts`` rows with a
    compiled ``lax.map`` (the reference's chunk_pts knob, nerf_process.py:
    190-192, but in-program instead of a host loop).

    Besides bounding activation memory, this also works around a TPU
    backend register-allocator RET_CHECK that fires when a single matmul
    batch in the *backward* pass exceeds ~2^19 rows in bf16.
    """
    n = x.shape[0]
    if chunk_pts <= 0 or n <= chunk_pts:
        return fn(x)
    n_chunks = -(-n // chunk_pts)
    # equalise chunk sizes so padding is minimal (e.g. 786432 @ 524288 ->
    # 2 chunks of 393216, zero pad, instead of 2x524288 with 33% padding)
    chunk = -(-n // n_chunks)
    chunk = -(-chunk // 128) * 128          # keep rows MXU-tile aligned
    pad = n_chunks * chunk - n
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[-1]), x.dtype)], 0)
    xs = x.reshape(n_chunks, -1, x.shape[-1])
    out = jax.lax.map(fn, xs)
    out = out.reshape(n_chunks * out.shape[1], -1)
    return out[:n]


def render_rays(
    coarse_fn: Callable[[jnp.ndarray], jnp.ndarray],
    fine_fn: Callable[[jnp.ndarray], jnp.ndarray],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    key: jax.Array,
    *,
    near: float,
    far: float,
    n_coarse: int,
    n_fine: int,
    perturb: float = 1.0,
    stratified: bool = True,
    scan_impl: str = "cumprod",
    coarse_sigma_fn=None,
) -> RaysRender:
    """Render a flat batch of rays through the coarse(+fine) pipeline.

    Args:
      coarse_fn/fine_fn: planar field functions (xplane [3,P], dplane
        [3,P]) -> raw [4,P] (see make_xla_field_fns /
        make_pallas_field_fns) — feature-major throughout, so the fused
        kernels' inputs/outputs need no relayout.
      rays_o/rays_d: [N, 3] (already NDC-projected for LLFF).
      stratified: jitter coarse bins (the reference always jitters,
        nerf_process.py:58-60; exposed for deterministic eval).
    """
    n_rays = rays_o.shape[0]
    key_c, key_f = jax.random.split(key)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    o_t = rays_o.T                                       # [3, N]
    d_t = rays_d.T
    vd_t = viewdirs.T

    def planes(z):                                       # z: [N, S]
        s = z.shape[-1]
        xp = (o_t[:, :, None] + d_t[:, :, None] * z[None]).reshape(3, -1)
        dp = jnp.broadcast_to(vd_t[:, :, None],
                              (3, n_rays, s)).reshape(3, -1)
        return xp, dp

    # -- coarse pass ------------------------------------------------------
    z_vals = stratified_z_vals(key_c, n_rays, near, far, n_coarse,
                               perturb=stratified)
    if coarse_sigma_fn is not None and n_fine > 0:
        # eval-only: density suffices for the sampling weights; the coarse
        # rgb/disp are never shown when a fine pass exists
        xp, _ = planes(z_vals)
        from .volume import weights_from_sigma
        sigma_c = coarse_sigma_fn(xp).reshape(n_rays, n_coarse)
        weights_c = weights_from_sigma(sigma_c, z_vals, rays_d, scan_impl)
        out_c = None
    else:
        xp, dp = planes(z_vals)
        raw_c = coarse_fn(xp, dp).reshape(4, n_rays, n_coarse)
        out_c = volume_render_planar(raw_c, z_vals, rays_d, scan_impl)
        weights_c = out_c.weights

    if n_fine <= 0:
        return RaysRender(out_c.rgb, out_c.disp, None, None, None, None)

    # -- fine pass (hierarchical) -----------------------------------------
    def fine_pass(o_s, d_s, z_s, w_s, key_s):
        return hierarchical_fine_pass(
            fine_fn, o_s, d_s, z_s, w_s, key_s,
            n_fine=n_fine, perturb=perturb, scan_impl=scan_impl)

    out_f = fine_pass(rays_o, rays_d, z_vals, weights_c, key_f)

    rgb_c = out_c.rgb if out_c is not None else None
    disp_c = out_c.disp if out_c is not None else None
    return RaysRender(rgb_c, disp_c, out_f.rgb, out_f.disp,
                      out_f.acc, out_f.depth)


def render_rays_from_cfg(coarse_fn, fine_fn, rays_o, rays_d, key, cfg,
                         stratified: bool = True,
                         coarse_sigma_fn=None) -> RaysRender:
    """render_rays with static args pulled from a NerfConfig."""
    return render_rays(
        coarse_fn, fine_fn, rays_o, rays_d, key,
        near=float(cfg.near), far=float(cfg.far),
        n_coarse=cfg.N_samples_c, n_fine=cfg.N_samples_f,
        perturb=float(cfg.perturb), stratified=stratified,
        coarse_sigma_fn=coarse_sigma_fn)


def maybe_ndc(rays_o, rays_d, H, W, focal, data_type: str):
    """NDC projection for LLFF forward-facing scenes with near=1
    (reference nerf_process.py:224-226)."""
    if data_type == "llff":
        return ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
    return rays_o, rays_d


def render_frame(
    coarse_fn,
    fine_fn,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    key: jax.Array,
    cfg,
    *,
    block_rays: Optional[int] = None,
    stratified: bool = True,
) -> RaysRender:
    """Render an arbitrary flat set of rays, blocked to bound memory.

    Pads the ray count to a multiple of ``block_rays`` and sweeps blocks
    with ``jax.lax.map`` (a compiled loop, not a host loop).  Use inside a
    jit; rays for a full 800×800 frame stay on device end-to-end.

    WARNING: with the Pallas field functions on real TPU hardware, prefer
    eval/frame.make_frame_renderer — embedding two pallas_calls in a
    lax.map body trips a TPU runtime fault (see CLAUDE.md); this helper is
    safe with the XLA field functions and in interpret mode.  The hazard
    is enforced: Pallas field fns on a real TPU backend raise here.
    """
    if jax.default_backend() == "tpu" and (
            getattr(coarse_fn, "_is_pallas", False)
            or getattr(fine_fn, "_is_pallas", False)):
        raise RuntimeError(
            "render_frame with Pallas field functions on a real TPU trips a "
            "runtime fault (two pallas_calls inside a lax.map body — see "
            "CLAUDE.md). Use eval/frame.make_frame_renderer instead.")
    n = rays_o.shape[0]
    block = block_rays or cfg.chunk_rays or 4096
    n_pad = (-n) % block
    ro = jnp.concatenate([rays_o, jnp.ones((n_pad, 3), rays_o.dtype)], 0)
    rd = jnp.concatenate([rays_d, jnp.ones((n_pad, 3), rays_d.dtype)], 0)
    n_blocks = ro.shape[0] // block
    ro = ro.reshape(n_blocks, block, 3)
    rd = rd.reshape(n_blocks, block, 3)
    keys = jax.random.split(key, n_blocks)

    def one_block(args):
        o, d, k = args
        return render_rays_from_cfg(coarse_fn, fine_fn, o, d, k, cfg,
                                    stratified=stratified)

    out = jax.lax.map(one_block, (ro, rd, keys))
    flat = jax.tree_util.tree_map(
        lambda x: None if x is None else
        x.reshape(-1, *x.shape[2:])[:n], out,
        is_leaf=lambda x: x is None)
    return RaysRender(*flat)
