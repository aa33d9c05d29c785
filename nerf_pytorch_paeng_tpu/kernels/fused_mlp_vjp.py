"""Custom-VJP fused NeRF MLP for the *training* path.

The forward is the eval kernel (fused_mlp.py).  The backward is a second
Pallas kernel that, per point-tile, **recomputes** the forward activations
in VMEM (residual-free — nothing is saved to HBM between fwd and bwd) and
chains the gradients back through the trunk, accumulating every weight/bias
gradient in fp32 VMEM across grid steps; the accumulated grads flush to
HBM once at grid end.

Why this beats XLA autodiff here: XLA's backward stores 8+ layers of
[P, 256] activations to HBM in the forward and re-reads them in the
backward (~95 ms per 1M points measured); the fused pair does
4x-forward-FLOPs of pure MXU work with only the [3,P] planes and [4,P]
cotangents ever touching HBM.

No input gradients are produced (returned as zeros): in NeRF training the
sample positions carry no parameter dependence (coarse z's are sampled
from the config range, fine z's are stop_gradient'ed — reference
nerf_process.py:66), so d(loss)/d(pts) is dead code that XLA prunes.

Gradients come out in the packed layout; because the host-side packing
(pack_nerf_mlp_params) is jnp-traceable and linear, JAX autodiff through
it maps them back to the flax tree automatically.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import (_W_NAMES, _build_emb, EMBD_ROWS, EMBX_ROWS,
                        fused_mlp_eval)


def _dot(a, b):  # [M, K] @ [K, T] -> [M, T], fp32 accum
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_t(a, b):  # [M, T] @ [N, T]^T -> [M, N] (contract point axis)
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_l(w, g):  # W^T @ g: [O, I]^T [O, T] -> [I, T]
    return jax.lax.dot_general(w, g, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _recompute_and_backprop(w, embx, embd, hv_dir, g_rgb, g_sig, gr, bf):
    """Shared core of both backward kernels: recompute the forward
    (keeping post-relu activations in VMEM) and chain the cotangents back
    to every weight/bias gradient ref.

    ``hv_dir`` is the direction-branch pre-activation contribution
    ``Wvd·embd + bv`` (per-ray-constant, so the ray-major kernel hoists it
    out of the sample loop).  relu' masks compare in fp32 — Mosaic rejects
    packed-bf16 cmpf."""
    # ---- forward recompute ----------------------------------------------
    hs = []
    h = jax.nn.relu(_dot(w["w0"], embx) + w["b0"]).astype(bf)
    hs.append(h)
    for i in (1, 2, 3, 4):
        h = jax.nn.relu(_dot(w[f"w{i}"], h) + w[f"b{i}"]).astype(bf)
        hs.append(h)
    h = jax.nn.relu(_dot(w["w5e"], embx) + _dot(w["w5h"], hs[4])
                    + w["b5"]).astype(bf)
    hs.append(h)
    for i in (6, 7):
        h = jax.nn.relu(_dot(w[f"w{i}"], h) + w[f"b{i}"]).astype(bf)
        hs.append(h)
    h7 = hs[7]
    feat = (_dot(w["wfeat"], h7) + w["bfeat"]).astype(bf)
    hv = jax.nn.relu(_dot(w["wvf"], feat) + hv_dir).astype(bf)

    # ---- backward --------------------------------------------------------
    gr["wcol"][:] += _dot_t(g_rgb, hv)
    gr["bcol"][:] += jnp.sum(g_rgb.astype(jnp.float32), -1, keepdims=True)
    dhv = _dot_l(w["wcol"], g_rgb)
    dhv = jnp.where(hv.astype(jnp.float32) > 0, dhv, 0.0).astype(bf)

    gr["wvf"][:] += _dot_t(dhv, feat)
    gr["wvd"][:] += _dot_t(dhv, embd)
    gr["bv"][:] += jnp.sum(dhv.astype(jnp.float32), -1, keepdims=True)
    dfeat = _dot_l(w["wvf"], dhv).astype(bf)

    gr["wfeat"][:] += _dot_t(dfeat, h7)
    gr["bfeat"][:] += jnp.sum(dfeat.astype(jnp.float32), -1, keepdims=True)
    dh = _dot_l(w["wfeat"], dfeat)

    gr["wdens"][:] += _dot_t(g_sig, h7)
    gr["bdens"][:] += jnp.sum(g_sig.astype(jnp.float32), -1, keepdims=True)
    dh = dh + _dot_l(w["wdens"], g_sig)

    for i in (7, 6):
        gi = jnp.where(hs[i].astype(jnp.float32) > 0, dh, 0.0).astype(bf)
        gr[f"w{i}"][:] += _dot_t(gi, hs[i - 1])
        gr[f"b{i}"][:] += jnp.sum(gi.astype(jnp.float32), -1, keepdims=True)
        dh = _dot_l(w[f"w{i}"], gi)

    g5 = jnp.where(hs[5].astype(jnp.float32) > 0, dh, 0.0).astype(bf)
    gr["w5e"][:] += _dot_t(g5, embx)
    gr["w5h"][:] += _dot_t(g5, hs[4])
    gr["b5"][:] += jnp.sum(g5.astype(jnp.float32), -1, keepdims=True)
    dh = _dot_l(w["w5h"], g5)

    for i in (4, 3, 2, 1):
        gi = jnp.where(hs[i].astype(jnp.float32) > 0, dh, 0.0).astype(bf)
        gr[f"w{i}"][:] += _dot_t(gi, hs[i - 1])
        gr[f"b{i}"][:] += jnp.sum(gi.astype(jnp.float32), -1, keepdims=True)
        dh = _dot_l(w[f"w{i}"], gi)

    g0 = jnp.where(hs[0].astype(jnp.float32) > 0, dh, 0.0).astype(bf)
    gr["w0"][:] += _dot_t(g0, embx)
    gr["b0"][:] += jnp.sum(g0.astype(jnp.float32), -1, keepdims=True)


def _bwd_kernel(L_x: int, L_d: int, cdt, xp_ref, dp_ref, g_ref, *refs):
    w_refs = dict(zip(_W_NAMES, refs[: len(_W_NAMES)]))
    gr = dict(zip(_W_NAMES, refs[len(_W_NAMES):]))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for name in _W_NAMES:
            gr[name][:] = jnp.zeros_like(gr[name])

    bf = cdt
    # weights cast to the compute dtype for the MXU once per tile; biases fp32
    w = {n: (w_refs[n][:].astype(bf) if n.startswith("w")
             else w_refs[n][:]) for n in _W_NAMES}
    embx = _build_emb(xp_ref[:].astype(jnp.float32), L_x, EMBX_ROWS, bf)
    embd = _build_emb(dp_ref[:].astype(jnp.float32), L_d, EMBD_ROWS, bf)
    hv_dir = _dot(w["wvd"], embd) + w["bv"]

    g = g_ref[:]                                   # [8, T] fp32 (4 used)
    t = g.shape[-1]
    g_rgb = jnp.concatenate([g[0:3, :], jnp.zeros((5, t), jnp.float32)],
                            0).astype(bf)                        # [8, T]
    g_sig = jnp.concatenate([g[3:4, :], jnp.zeros((7, t), jnp.float32)],
                            0).astype(bf)                        # [8, T]
    _recompute_and_backprop(w, embx, embd, hv_dir, g_rgb, g_sig, gr, bf)


def _bwd_call(xplane, dplane, g, packed: Dict, L_x: int, L_d: int,
              tile: int, interpret: bool = False) -> Dict:
    p = xplane.shape[-1]
    assert p % tile == 0
    n_tiles = p // tile
    # the primal output (and thus the cotangent) is already an
    # 8-sublane block; rows 4..7 are zero padding
    assert g.shape[0] == 8, g.shape
    g8 = g.astype(jnp.float32)

    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        *[const(packed[n].shape) for n in _W_NAMES],
    ]
    out_specs = tuple(const(packed[n].shape) for n in _W_NAMES)
    out_shape = tuple(
        jax.ShapeDtypeStruct(packed[n].shape, jnp.float32) for n in _W_NAMES)

    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, L_x, L_d,
                          jnp.float32 if interpret else jnp.bfloat16),
        grid_spec=pl.GridSpec(grid=(n_tiles,), in_specs=in_specs,
                              out_specs=out_specs),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xplane, dplane, g8, *[packed[n] for n in _W_NAMES])
    return dict(zip(_W_NAMES, grads))


@functools.lru_cache(maxsize=None)
def _make_fused_train(L_x: int, L_d: int, tile: int, interpret: bool):
    @jax.custom_vjp
    def f(packed, xplane, dplane):
        return fused_mlp_eval(xplane, dplane, packed, L_x=L_x, L_d=L_d,
                              tile=tile, interpret=interpret)

    def fwd(packed, xplane, dplane):
        return f(packed, xplane, dplane), (packed, xplane, dplane)

    def bwd(res, gout):
        packed, xplane, dplane = res
        dpacked = _bwd_call(xplane, dplane, gout, packed, L_x, L_d, tile,
                            interpret)
        # Packed weights (and hence grads) are fp32 end-to-end
        # (pack_nerf_mlp_params stores fp32, fused_mlp.py); the astype is a
        # no-op today, kept only so a future packed dtype keeps grads
        # matching the primals as custom_vjp requires.
        dpacked = {n: dpacked[n].astype(packed[n].dtype) for n in _W_NAMES}
        return dpacked, jnp.zeros_like(xplane), jnp.zeros_like(dplane)

    f.defvjp(fwd, bwd)
    return f


def fused_mlp_train(packed: Dict, xplane: jnp.ndarray, dplane: jnp.ndarray,
                    L_x: int = 10, L_d: int = 4, tile: int = 1024,
                    interpret: bool = False) -> jnp.ndarray:
    """Differentiable fused MLP: [3,P] planes -> [4,P] raw, with the
    Pallas backward above. P must be a multiple of ``tile``."""
    return _make_fused_train(L_x, L_d, tile, interpret)(
        packed, xplane, dplane)


# ---------------------------------------------------------------------------
# Ray-major training pair: forward = fused_mlp_eval_rays (positions built
# in-kernel from [8,N] rays + [S,N] depths, no [3,P] planes in HBM), and a
# matching residual-free backward that recomputes per (ray-tile,
# sample-row) and accumulates weight grads across the 2D grid.

def _bwd_rays_body(L_x: int, L_d: int, bf, sel,
                   od_ref, z_ref, gr_ref, gg_ref, gb_ref, gs_ref,
                   w_refs, gr_out):
    w = {n: (w_refs[n][:].astype(bf) if n.startswith("w")
             else w_refs[n][:]) for n in _W_NAMES}

    o = od_ref[0:3, :].astype(jnp.float32)               # [3, Tr]
    d = od_ref[3:6, :].astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.sum(d * d, axis=0, keepdims=True))
    embd = _build_emb(d * inv, L_d, EMBD_ROWS, bf)
    hv_dir = _dot(w["wvd"], embd) + w["bv"]              # [128, Tr] fp32

    def row(ref):                                        # [8,Tr] -> [1,Tr]
        return jnp.sum(jnp.where(sel, ref[:].astype(jnp.float32), 0.0),
                       axis=0, keepdims=True)

    t = o.shape[-1]
    x = o + d * row(z_ref)
    embx = _build_emb(x, L_x, EMBX_ROWS, bf)
    g_rgb = jnp.concatenate(
        [row(gr_ref), row(gg_ref), row(gb_ref),
         jnp.zeros((5, t), jnp.float32)], 0).astype(bf)          # [8, T]
    g_sig = jnp.concatenate(
        [row(gs_ref), jnp.zeros((7, t), jnp.float32)],
        0).astype(bf)                                            # [8, T]
    _recompute_and_backprop(w, embx, embd, hv_dir, g_rgb, g_sig, gr_out, bf)


def _bwd_rays_kernel(L_x: int, L_d: int, cdt,
                     od_ref, z_ref, gr_ref, gg_ref, gb_ref, gs_ref, *refs):
    """One SAMPLE ROW of the ray-major backward per grid step (grid =
    rays x samples).  An 8-row unrolled variant produced a Mosaic program
    too large to compile in reasonable time; with one row the body
    matches the proven plane-based _bwd_kernel size.  Mosaic requires
    sublane block dims divisible by 8, so the sample inputs arrive as
    8-row blocks (index_map j // 8 — constant across 8 consecutive inner
    steps, so the block stays resident) and the current row j % 8 is
    picked with a one-hot reduction.  Weight-grad outputs use constant
    index maps and accumulate across the whole 2D grid, flushing to HBM
    once at grid end."""
    w_refs = dict(zip(_W_NAMES, refs[: len(_W_NAMES)]))
    gr_out = dict(zip(_W_NAMES, refs[len(_W_NAMES):]))

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _init():
        for name in _W_NAMES:
            gr_out[name][:] = jnp.zeros_like(gr_out[name])

    k = pl.program_id(1) % 8
    sel = (jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == k)
    _bwd_rays_body(L_x, L_d, cdt, sel, od_ref, z_ref, gr_ref, gg_ref,
                   gb_ref, gs_ref, w_refs, gr_out)


def _bwd_rays_kernel_gated(L_x: int, L_d: int, cdt, gate_ref,
                           od_ref, z_ref, gr_ref, gg_ref, gb_ref, gs_ref,
                           *refs):
    """Gated ray-major backward: grid steps whose (ray-tile, 8-sample-row)
    gate flag is 0 skip the recompute+backprop entirely.  Sound because
    the caller certifies every gated-off sample lies outside the module's
    density support: its real logit is <= 0, so relu' zeroes its sigma
    cotangent and its zero compositing weight zeroes the rgb cotangents —
    the skipped accumulation contributions are exactly zero in the
    ungated backward too (ops/render.render_rays_train notes)."""
    w_refs = dict(zip(_W_NAMES, refs[: len(_W_NAMES)]))
    gr_out = dict(zip(_W_NAMES, refs[len(_W_NAMES):]))

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _init():
        for name in _W_NAMES:
            gr_out[name][:] = jnp.zeros_like(gr_out[name])

    active = gate_ref[pl.program_id(0) * (pl.num_programs(1) // 8)
                      + pl.program_id(1) // 8] != 0
    # program_id is hoisted out of the pl.when region: the CPU (HLO
    # interpreter) lowering of a when-body has no program_id rule
    k = pl.program_id(1) % 8
    sel = (jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == k)

    @pl.when(active)
    def _():
        _bwd_rays_body(L_x, L_d, cdt, sel, od_ref, z_ref, gr_ref, gg_ref,
                       gb_ref, gs_ref, w_refs, gr_out)


def _bwd_rays_call(od, z_t, gr, gg, gb, gs, packed: Dict, L_x: int,
                   L_d: int, tile_rays: int,
                   interpret: bool = False, gate=None) -> Dict:
    s, n = z_t.shape
    assert n % tile_rays == 0, (n, tile_rays)
    assert s % 8 == 0, s
    cdt = jnp.float32 if interpret else jnp.bfloat16
    out_specs_shapes = dict(
        out_shape=tuple(
            jax.ShapeDtypeStruct(packed[nme].shape, jnp.float32)
            for nme in _W_NAMES),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )
    f32 = jnp.float32
    args = (od, z_t, gr.astype(f32), gg.astype(f32), gb.astype(f32),
            gs.astype(f32), *[packed[nme] for nme in _W_NAMES])

    if gate is None:
        const = lambda shape: pl.BlockSpec(
            shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        sblk = pl.BlockSpec((8, tile_rays), lambda i, j: (j // 8, i),
                            memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((8, tile_rays), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            sblk, sblk, sblk, sblk, sblk,
            *[const(packed[nme].shape) for nme in _W_NAMES],
        ]
        out_specs = tuple(const(packed[nme].shape) for nme in _W_NAMES)
        grads = pl.pallas_call(
            functools.partial(_bwd_rays_kernel, L_x, L_d, cdt),
            grid_spec=pl.GridSpec(grid=(n // tile_rays, s),
                                  in_specs=in_specs, out_specs=out_specs),
            **out_specs_shapes)(*args)
        return dict(zip(_W_NAMES, grads))

    assert gate.shape == ((n // tile_rays) * (s // 8),), (
        gate.shape, n, tile_rays, s)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i, j, g: (0, 0), memory_space=pltpu.VMEM)
    sblk = pl.BlockSpec((8, tile_rays), lambda i, j, g: (j // 8, i),
                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((8, tile_rays), lambda i, j, g: (0, i),
                     memory_space=pltpu.VMEM),
        sblk, sblk, sblk, sblk, sblk,
        *[const(packed[nme].shape) for nme in _W_NAMES],
    ]
    out_specs = tuple(const(packed[nme].shape) for nme in _W_NAMES)
    grads = pl.pallas_call(
        functools.partial(_bwd_rays_kernel_gated, L_x, L_d, cdt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(n // tile_rays, s),
            in_specs=in_specs, out_specs=out_specs),
        **out_specs_shapes)(gate.astype(jnp.int32), *args)
    return dict(zip(_W_NAMES, grads))


@functools.lru_cache(maxsize=None)
def _make_fused_train_rays(L_x: int, L_d: int, tile_rays: int, s_rows: int,
                           interpret: bool):
    from .fused_mlp import fused_mlp_eval_rays

    @jax.custom_vjp
    def f(packed, od, z_t):
        return fused_mlp_eval_rays(od, z_t, packed, L_x=L_x, L_d=L_d,
                                   tile_rays=tile_rays, s_rows=s_rows,
                                   interpret=interpret)

    def fwd(packed, od, z_t):
        return f(packed, od, z_t), (packed, od, z_t)

    def bwd(res, gout):
        packed, od, z_t = res
        gr, gg, gb, gs = gout
        dpacked = _bwd_rays_call(od, z_t, gr, gg, gb, gs, packed, L_x, L_d,
                                 tile_rays, interpret)
        dpacked = {nme: dpacked[nme].astype(packed[nme].dtype)
                   for nme in _W_NAMES}
        # no input grads: rays are data, z's are stop_gradient'ed (see the
        # module docstring)
        return dpacked, jnp.zeros_like(od), jnp.zeros_like(z_t)

    f.defvjp(fwd, bwd)
    return f


def fused_mlp_train_rays(packed: Dict, od: jnp.ndarray, z_t: jnp.ndarray,
                         L_x: int = 10, L_d: int = 4, tile_rays: int = 1024,
                         s_rows: int = 8, interpret: bool = False,
                         gate: jnp.ndarray | None = None):
    """Differentiable ray-major fused MLP: [8,N] rays + [S,N] depths ->
    (r, g, b, sigma) each [S, N], with the Pallas backward above.
    N % tile_rays == 0 and S % s_rows == 0.

    ``gate`` (int32 [(N // tile_rays) * (S // 8)], row-major in (ray-tile,
    8-sample-row)) engages the occupancy-gated kernel pair: gated-off
    blocks skip the MLP in the forward (zeros stored) AND the
    recompute+backprop in the backward — exact when every gated sample is
    provably outside the module's density support (both contributions are
    identically zero in the ungated pair; see _bwd_rays_kernel_gated).
    Requires s_rows == 8 (the canonical gate granularity).  The gate is a
    regular custom_vjp argument with a float0 cotangent, so it may be a
    traced value (the training step computes it in-trace from the
    support intervals).
    """
    if gate is None:
        return _make_fused_train_rays(L_x, L_d, tile_rays, s_rows,
                                      interpret)(packed, od, z_t)
    # the gated pair runs both directions at the canonical 8-row gate
    # granularity: a 16-row forward with pair-OR'd gates was measured
    # SLOWER end-to-end on v5e (the halved forward gating costs more than
    # the 16-row unroll gains — tools/bench_gated_train.py)
    assert s_rows == 8, s_rows
    return _make_fused_train_rays_gated(L_x, L_d, tile_rays, interpret)(
        packed, od, z_t, gate.astype(jnp.int32))


@functools.lru_cache(maxsize=None)
def _make_fused_train_rays_gated(L_x: int, L_d: int, tile_rays: int,
                                 interpret: bool):
    import numpy as np

    from .fused_mlp import fused_mlp_eval_rays

    @jax.custom_vjp
    def f(packed, od, z_t, gate):
        return fused_mlp_eval_rays(od, z_t, packed, L_x=L_x, L_d=L_d,
                                   tile_rays=tile_rays, s_rows=8,
                                   interpret=interpret, gate=gate)

    def fwd(packed, od, z_t, gate):
        return f(packed, od, z_t, gate), (packed, od, z_t, gate)

    def bwd(res, gout):
        packed, od, z_t, gate = res
        gr, gg, gb, gs = gout
        dpacked = _bwd_rays_call(od, z_t, gr, gg, gb, gs, packed, L_x, L_d,
                                 tile_rays, interpret, gate=gate)
        dpacked = {nme: dpacked[nme].astype(packed[nme].dtype)
                   for nme in _W_NAMES}
        # the int32 gate takes a float0 cotangent (JAX's tangent type for
        # integer primals); od/z_t grads are dead code like the ungated
        # pair's (module docstring)
        dgate = np.zeros(gate.shape, jax.dtypes.float0)
        return (dpacked, jnp.zeros_like(od), jnp.zeros_like(z_t), dgate)

    f.defvjp(fwd, bwd)
    return f
