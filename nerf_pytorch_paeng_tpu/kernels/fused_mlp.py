"""Pallas TPU kernel: the whole NeRF MLP fused into one VMEM-resident pass.

Why: under plain XLA every Dense layer materialises a [P, 256] activation
to HBM — ~10 KB of traffic per point per pass, which makes full-frame
rendering HBM-bound (~8.8s for 800x800).  This kernel keeps every weight
and activation in VMEM: HBM traffic collapses to the [3, P] point/dir
planes in and the [4, P] raw outputs out.

Design (eval path, no autodiff through the kernel):
- **Feature-major layout**: activations live as [features, points] tiles —
  points on the 128-wide lane axis, features on sublanes.  Every layer is
  one MXU ``dot(W_t, h)`` with fp32 accumulation; no transposes anywhere.
- Positional encoding is computed in-kernel from the raw [3, T] point/dir
  planes (the [P, 90] embedded matrix never exists in HBM).
- Weights are pre-packed once on host: transposed to [out, in], bf16,
  rows permuted to the kernel's frequency-major embedding order, skip and
  view-branch concats split into two matmuls (and the tiny heads padded
  to sublane multiples).
- Grid over point-tiles of T columns; weight blocks use a constant
  index_map so Mosaic keeps them resident across grid steps.

Parity: computes exactly the reference MLP (model/NeRF.py:33-52) with the
no-π positional encoding (model/PositionalEncoding.py:18-23); numerics
match the XLA bf16 path to ~1e-2 (bf16 rounding).
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# padded sublane sizes for the embedding planes
EMBX_ROWS = 64   # 63 used (L_x=10)
EMBD_ROWS = 32   # 27 used (L_d=4)


def _emb_perm(L: int) -> np.ndarray:
    """Map kernel embedding row -> flax/reference embedding row.

    Kernel order (all sins then all cosines, frequency-outer):
      [x0,x1,x2, sin f0 (3 coords), sin f1 (3), ..., cos f0 (3), ...]
    Flax order (reference PositionalEncoding.py:20-24, sin/cos interleaved):
      [x, sin f0 (3), cos f0 (3), sin f1 (3), cos f1 (3), ...]
    """
    perm = np.zeros(3 + 6 * L, np.int64)
    perm[:3] = np.arange(3)
    for j in range(L):
        for c in range(3):
            perm[3 + 3 * j + c] = 3 + 6 * j + c              # sin
            perm[3 + 3 * L + 3 * j + c] = 3 + 6 * j + 3 + c  # cos
    return perm


def _t_pad(w, rows: int, cols: int) -> jnp.ndarray:
    """Transpose [in, out] -> [out, in], zero-pad to [rows, cols], bf16.

    Pure jnp so packing is jit-traceable and *differentiable* — autodiff
    through the pack maps packed-layout weight grads back to the flax
    layout for free (VJP of transpose/pad/permute is its inverse).

    Stored fp32 (kernels cast to bf16 at use) so the custom-VJP weight
    grads keep full precision."""
    wt = jnp.asarray(w, jnp.float32).T
    out = jnp.zeros((rows, cols), jnp.float32)
    out = out.at[: wt.shape[0], : wt.shape[1]].set(wt)
    return out


def pack_nerf_mlp_params(params: Dict, L_x: int = 10, L_d: int = 4,
                         depth: int = 8, width: int = 256,
                         skips: Tuple[int, ...] = (4,)) -> Dict[str, jnp.ndarray]:
    """Pack one NeRFMLP's flax params into the kernel layout.

    Only the reference architecture (depth 8, width 256, skip at 4) is
    supported by the fused kernel; anything else falls back to XLA.
    """
    assert depth == 8 and width == 256 and tuple(skips) == (4,), (
        "fused kernel supports the reference architecture only")
    in_x = 3 + 6 * L_x
    in_d = 3 + 6 * L_d
    px = _emb_perm(L_x)
    pd = _emb_perm(L_d)

    g = lambda name: jnp.asarray(params[name]["kernel"], jnp.float32)
    b = lambda name: jnp.asarray(params[name]["bias"], jnp.float32)

    def bias_pad(v, rows):
        return jnp.pad(v, (0, rows - v.shape[0])).reshape(rows, 1)

    packed = {}
    # trunk_0: [in_x, 256] -> rows permuted to kernel emb order
    packed["w0"] = _t_pad(g("trunk_0")[px, :], width, EMBX_ROWS)
    for i in range(1, depth):
        w = g(f"trunk_{i}")
        if i == 5:  # skip layer: input = [emb_x(63) ‖ h(256)]
            packed["w5e"] = _t_pad(w[:in_x, :][px, :], width, EMBX_ROWS)
            packed["w5h"] = _t_pad(w[in_x:, :], width, width)
        else:
            packed[f"w{i}"] = _t_pad(w, width, width)
    for i in range(depth):
        packed[f"b{i}"] = b(f"trunk_{i}").reshape(width, 1)

    packed["wdens"] = _t_pad(g("density"), 8, width)
    packed["bdens"] = bias_pad(b("density"), 8)
    packed["wfeat"] = _t_pad(g("feature"), width, width)
    packed["bfeat"] = b("feature").reshape(width, 1)

    wv = g("view")                                 # [256+27, 128]
    packed["wvf"] = _t_pad(wv[:width, :], width // 2, width)
    packed["wvd"] = _t_pad(wv[width:, :][pd, :], width // 2, EMBD_ROWS)
    packed["bv"] = b("view").reshape(width // 2, 1)
    packed["wcol"] = _t_pad(g("color"), 8, width // 2)
    packed["bcol"] = bias_pad(b("color"), 8)
    return packed


# deterministic kernel argument order
_W_NAMES = ("w0", "w1", "w2", "w3", "w4", "w5e", "w5h", "w6", "w7",
            "b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7",
            "wdens", "bdens", "wfeat", "bfeat", "wvf", "wvd", "bv",
            "wcol", "bcol")


def _build_emb(x: jnp.ndarray, L: int, rows: int,
               dtype=jnp.bfloat16) -> jnp.ndarray:
    """[3, T] coords -> [rows, T] bf16 embedding in kernel layout.

    sin/cos(2^j x) come from the exact double-angle recurrence
    (sin 2θ = 2 sinθ cosθ, cos 2θ = 1 - 2 sin²θ): 2 transcendentals per
    coordinate instead of 2L — the VPU's transcendental unit is ~10x
    slower than its multiplier, and this feeds bf16 matmuls, so the
    ~2^j·eps fp32 drift at high frequencies is far below the bf16 noise
    floor."""
    t = x.shape[-1]
    s, c = jnp.sin(x), jnp.cos(x)                             # each [3, T]
    sins, coss = [s], [c]
    for _ in range(L - 1):
        s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
        sins.append(s)
        coss.append(c)
    pad = jnp.zeros((rows - 3 - 6 * L, t), jnp.float32)
    emb = jnp.concatenate([x, *sins, *coss, pad], axis=0)
    return emb.astype(dtype)


def _mlp_kernel(L_x: int, L_d: int, cdt, out_dtype, xp_ref, dp_ref, *refs):
    w = dict(zip(_W_NAMES, refs[:-1]))
    out_ref = refs[-1]

    def dot(a, h):
        return jax.lax.dot_general(
            a[:].astype(cdt), h.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    embx = _build_emb(xp_ref[:].astype(jnp.float32), L_x, EMBX_ROWS, cdt)
    embd = _build_emb(dp_ref[:].astype(jnp.float32), L_d, EMBD_ROWS, cdt)

    h = jax.nn.relu(dot(w["w0"], embx) + w["b0"][:]).astype(cdt)
    for i in (1, 2, 3, 4):
        h = jax.nn.relu(dot(w[f"w{i}"], h) + w[f"b{i}"][:]).astype(cdt)
    # skip: trunk_5 input is [emb_x ‖ h] -> two matmuls
    h = jax.nn.relu(dot(w["w5e"], embx) + dot(w["w5h"], h)
                    + w["b5"][:]).astype(cdt)
    for i in (6, 7):
        h = jax.nn.relu(dot(w[f"w{i}"], h) + w[f"b{i}"][:]).astype(cdt)

    sigma = dot(w["wdens"], h) + w["bdens"][:]            # [8, T] row 0
    feat = (dot(w["wfeat"], h) + w["bfeat"][:]).astype(cdt)
    hv = jax.nn.relu(dot(w["wvf"], feat) + dot(w["wvd"], embd)
                     + w["bv"][:]).astype(cdt)
    rgb = dot(w["wcol"], hv) + w["bcol"][:]               # [8, T] rows 0..2

    # write the full 8-sublane block in one store (rows: rgb, sigma, pad) —
    # partial-sublane stores to a 4-row block are a Mosaic edge case
    out_ref[:] = jnp.concatenate(
        [rgb[0:3, :], sigma[0:1, :], jnp.zeros_like(rgb[0:4, :])],
        axis=0).astype(out_dtype)


def fused_mlp_eval(xplane: jnp.ndarray, dplane: jnp.ndarray,
                   packed: Dict[str, jnp.ndarray], L_x: int = 10,
                   L_d: int = 4, tile: int = 8192,
                   interpret: bool = False,
                   out_dtype=jnp.float32) -> jnp.ndarray:
    """Evaluate the fused NeRF MLP.

    Args:
      xplane: [3, P] sample positions (feature-major; P % tile == 0).
      dplane: [3, P] unit view directions, one per point.
    Returns:
      [8, P] float32 raw outputs (rgb logits rows 0..2, sigma row 3,
      rows 4..7 zero padding for a full sublane block).
    """
    p = xplane.shape[-1]
    assert p % tile == 0, (p, tile)
    n_tiles = p // tile

    weight_specs = [
        pl.BlockSpec(packed[n].shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM)
        for n in _W_NAMES
    ]
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )
    # interpret mode runs on CPU, whose dot thunk lacks bf16 support
    cdt = jnp.float32 if interpret else jnp.bfloat16
    kernel = functools.partial(_mlp_kernel, L_x, L_d, cdt, out_dtype)
    flops_per_pt = 2 * (64 * 256 + 6 * 256 * 256 + (64 + 256) * 256
                        + 8 * 256 + 256 * 256 + (256 + 32) * 128 + 8 * 128)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, p), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pt * p,
            bytes_accessed=(3 + 3) * 2 * p + 4 * 4 * p,
            transcendentals=(6 * L_x + 6 * L_d) * p // 2),
        interpret=interpret,
    )(xplane, dplane, *[packed[n] for n in _W_NAMES])


# --------------------------------------------------------------------------
# ray-major sigma variant: sample positions are built IN-KERNEL from the
# ray origins/directions and per-sample depths.  Materialising the [3, P]
# position plane in HBM costs ~2.67x its logical bytes (3 of 8 sublanes
# used) twice (write + kernel read) — ~150 ms per 800x800 frame of pure
# layout tax; here the inputs are [8, N] rays + [S, N] depths (both
# fully-packed layouts) and the [3, Tr] positions only ever exist in VMEM.

_W_NAMES_SIGMA_RAYS = ("w0", "w1", "w2", "w3", "w4", "w5e", "w5h", "w6", "w7",
                       "b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7",
                       "wdens", "bdens")


def _sigma_rays_body(L_x: int, s_rows: int, cdt, out_dtype,
                     w, od_ref, z_ref, out_ref):
    def dot(a, h):
        return jax.lax.dot_general(
            a[:].astype(cdt), h.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    o = od_ref[0:3, :].astype(jnp.float32)              # [3, Tr]
    d = od_ref[3:6, :].astype(jnp.float32)              # [3, Tr]
    rows = []
    for k in range(s_rows):                             # unrolled sample rows
        x = o + d * z_ref[k:k + 1, :].astype(jnp.float32)   # [3, Tr]
        embx = _build_emb(x, L_x, EMBX_ROWS, cdt)
        h = jax.nn.relu(dot(w["w0"], embx) + w["b0"][:]).astype(cdt)
        for i in (1, 2, 3, 4):
            h = jax.nn.relu(dot(w[f"w{i}"], h) + w[f"b{i}"][:]).astype(cdt)
        h = jax.nn.relu(dot(w["w5e"], embx) + dot(w["w5h"], h)
                        + w["b5"][:]).astype(cdt)
        for i in (6, 7):
            h = jax.nn.relu(dot(w[f"w{i}"], h) + w[f"b{i}"][:]).astype(cdt)
        sigma = dot(w["wdens"], h) + w["bdens"][:]      # [8, Tr], row 0
        rows.append(sigma[0:1, :])
    out_ref[:] = jnp.concatenate(rows, axis=0).astype(out_dtype)


def _sigma_rays_kernel(L_x: int, s_rows: int, cdt, out_dtype,
                       od_ref, z_ref, *refs):
    w = dict(zip(_W_NAMES_SIGMA_RAYS, refs[:-1]))
    _sigma_rays_body(L_x, s_rows, cdt, out_dtype, w, od_ref, z_ref, refs[-1])


def _sigma_rays_kernel_gated(L_x: int, s_rows: int, cdt, out_dtype,
                             gate_ref, od_ref, z_ref, *refs):
    """Per-(ray-tile, sample-row) gated variant: when
    gate[i * n_row_blocks + j] == 0 every sample of row block j of every
    ray in tile i is provably outside the density support (eval/frame.py
    sorts rays by their support-interval row span so tiles share spans),
    so the MLP is skipped for that grid step and zero sigma is stored —
    relu(0) = 0 gives exactly the zero compositing weights the real
    (<= 0 logit) evaluation would.  A fully pre-cullable ray simply has
    every row gated off (the whole-ray cull is the span-empty case)."""
    w = dict(zip(_W_NAMES_SIGMA_RAYS, refs[:-1]))
    out_ref = refs[-1]
    active = gate_ref[pl.program_id(0) * pl.num_programs(1)
                      + pl.program_id(1)] != 0

    @pl.when(active)
    def _():
        _sigma_rays_body(L_x, s_rows, cdt, out_dtype, w, od_ref, z_ref,
                         out_ref)

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[:] = jnp.zeros(out_ref.shape, out_dtype)


def fused_mlp_sigma_rays(od: jnp.ndarray, z_t: jnp.ndarray,
                         packed: Dict[str, jnp.ndarray], L_x: int = 10,
                         tile_rays: int = 8192, s_rows: int = 8,
                         interpret: bool = False,
                         out_dtype=jnp.float32,
                         gate: jnp.ndarray | None = None) -> jnp.ndarray:
    """Density along rays with positions built in-kernel.

    Args:
      od:  [8, N] float32 rays — rows 0-2 origin, 3-5 (unnormalised)
           direction, 6-7 padding.  N % tile_rays == 0.
      z_t: [S, N] float32 per-sample depths (sample-major; S % s_rows == 0).
      gate: optional int32 [(N // tile_rays) * (S // s_rows)] per-
           (ray-tile, sample-row) flags, row-major in (tile, row) —
           i.e. a flattened [n_tiles, n_row_blocks] grid (scalar-
           prefetched).  Grid steps with gate 0 skip the MLP and store
           zero sigma — the dispatch-free pre-cull: the caller certifies
           every sample in a gated-off (tile, row) block lies outside
           the density support, so zero logits give the identical
           (exactly zero) compositing weights the real (<= 0 logit)
           evaluation yields.
    Returns:
      [S, N] raw sigma logits (out_dtype).
    """
    s, n = z_t.shape
    assert od.shape == (8, n), (od.shape, n)
    assert n % tile_rays == 0, (n, tile_rays)
    assert s % s_rows == 0, (s, s_rows)

    cdt = jnp.float32 if interpret else jnp.bfloat16
    kwargs = dict(
        out_shape=jax.ShapeDtypeStruct((s, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * (64 * 256 + 6 * 256 * 256 + (64 + 256) * 256
                       + 8 * 256) * s * n,
            bytes_accessed=(8 + s) * 4 * n + s * n * 4,
            transcendentals=6 * n * s),
        interpret=interpret,
    )
    # rays outer, samples inner: the od block is constant along j, so
    # Mosaic keeps it resident across the inner sample sweep
    grid = (n // tile_rays, s // s_rows)
    weights = [packed[name] for name in _W_NAMES_SIGMA_RAYS]

    if gate is None:
        weight_specs = [
            pl.BlockSpec(packed[name].shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
            for name in _W_NAMES_SIGMA_RAYS
        ]
        grid_spec = pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, tile_rays), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s_rows, tile_rays), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                *weight_specs,
            ],
            out_specs=pl.BlockSpec((s_rows, tile_rays), lambda i, j: (j, i),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            functools.partial(_sigma_rays_kernel, L_x, s_rows, cdt,
                              out_dtype),
            grid_spec=grid_spec, **kwargs)(od, z_t, *weights)

    assert gate.shape == ((n // tile_rays) * (s // s_rows),), (
        gate.shape, n, tile_rays, s, s_rows)
    # scalar-prefetch grid spec: index maps gain the gate ref as a
    # trailing argument
    weight_specs = [
        pl.BlockSpec(packed[name].shape, lambda i, j, g: (0, 0),
                     memory_space=pltpu.VMEM)
        for name in _W_NAMES_SIGMA_RAYS
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile_rays), lambda i, j, g: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_rows, tile_rays), lambda i, j, g: (j, i),
                         memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((s_rows, tile_rays), lambda i, j, g: (j, i),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_sigma_rays_kernel_gated, L_x, s_rows, cdt,
                          out_dtype),
        grid_spec=grid_spec, **kwargs)(
            gate.astype(jnp.int32), od, z_t, *weights)


def _eval_rays_body(L_x: int, L_d: int, s_rows: int, cdt, out_dtype,
                    w, od_ref, z_ref, r_ref, g_ref, b_ref, s_ref):
    def dot(a, h):
        return jax.lax.dot_general(
            a[:].astype(cdt), h.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    o = od_ref[0:3, :].astype(jnp.float32)              # [3, Tr]
    d = od_ref[3:6, :].astype(jnp.float32)              # [3, Tr]
    # per-ray work hoisted out of the sample loop: the direction embedding
    # and its view-branch matmul are sample-independent
    inv = jax.lax.rsqrt(jnp.sum(d * d, axis=0, keepdims=True))
    embd = _build_emb(d * inv, L_d, EMBD_ROWS, cdt)
    hv_dir = dot(w["wvd"], embd) + w["bv"][:]           # [128, Tr] fp32

    rows_r, rows_g, rows_b, rows_s = [], [], [], []
    for k in range(s_rows):                             # unrolled sample rows
        x = o + d * z_ref[k:k + 1, :].astype(jnp.float32)   # [3, Tr]
        embx = _build_emb(x, L_x, EMBX_ROWS, cdt)
        h = jax.nn.relu(dot(w["w0"], embx) + w["b0"][:]).astype(cdt)
        for i in (1, 2, 3, 4):
            h = jax.nn.relu(dot(w[f"w{i}"], h) + w[f"b{i}"][:]).astype(cdt)
        h = jax.nn.relu(dot(w["w5e"], embx) + dot(w["w5h"], h)
                        + w["b5"][:]).astype(cdt)
        for i in (6, 7):
            h = jax.nn.relu(dot(w[f"w{i}"], h) + w[f"b{i}"][:]).astype(cdt)
        sigma = dot(w["wdens"], h) + w["bdens"][:]      # [8, Tr], row 0
        feat = (dot(w["wfeat"], h) + w["bfeat"][:]).astype(cdt)
        hv = jax.nn.relu(dot(w["wvf"], feat) + hv_dir).astype(cdt)
        rgb = dot(w["wcol"], hv) + w["bcol"][:]         # [8, Tr], rows 0..2
        rows_r.append(rgb[0:1, :])
        rows_g.append(rgb[1:2, :])
        rows_b.append(rgb[2:3, :])
        rows_s.append(sigma[0:1, :])
    r_ref[:] = jnp.concatenate(rows_r, axis=0).astype(out_dtype)
    g_ref[:] = jnp.concatenate(rows_g, axis=0).astype(out_dtype)
    b_ref[:] = jnp.concatenate(rows_b, axis=0).astype(out_dtype)
    s_ref[:] = jnp.concatenate(rows_s, axis=0).astype(out_dtype)


def _eval_rays_kernel(L_x: int, L_d: int, s_rows: int, cdt, out_dtype,
                      od_ref, z_ref, *refs):
    w = dict(zip(_W_NAMES, refs[:-4]))
    _eval_rays_body(L_x, L_d, s_rows, cdt, out_dtype, w, od_ref, z_ref,
                    *refs[-4:])


def _eval_rays_kernel_gated(L_x: int, L_d: int, s_rows: int, cdt, out_dtype,
                            gate_ref, od_ref, z_ref, *refs):
    """Gated full-field variant (see _sigma_rays_kernel_gated): grid steps
    whose gate flag is 0 skip the MLP and store zeros to all four outputs.
    The caller certifies every sample of a gated-off (ray-tile, sample-row)
    block lies outside the module's density support, so the stored zero
    sigma yields exactly the zero compositing weights the real (<= 0
    logit) evaluation would, and the zero rgb logits are masked by those
    zero weights — used by the occupancy-gated *training* path
    (ops/render.render_rays_train with support bounds)."""
    w = dict(zip(_W_NAMES, refs[:-4]))
    out_refs = refs[-4:]
    active = gate_ref[pl.program_id(0) * pl.num_programs(1)
                      + pl.program_id(1)] != 0

    @pl.when(active)
    def _():
        _eval_rays_body(L_x, L_d, s_rows, cdt, out_dtype, w, od_ref, z_ref,
                        *out_refs)

    @pl.when(jnp.logical_not(active))
    def _():
        for ref in out_refs:
            ref[:] = jnp.zeros(ref.shape, out_dtype)


def fused_mlp_eval_rays(od: jnp.ndarray, z_t: jnp.ndarray,
                        packed: Dict[str, jnp.ndarray], L_x: int = 10,
                        L_d: int = 4, tile_rays: int = 8192,
                        s_rows: int = 8, interpret: bool = False,
                        out_dtype=jnp.float32,
                        gate: jnp.ndarray | None = None):
    """Full radiance field along rays with positions built in-kernel (see
    fused_mlp_sigma_rays).  View directions are normalised in-kernel and
    their embedding + view-branch matmul are computed once per ray tile
    instead of once per sample.

    Args:
      od:  [8, N] float32 rays — rows 0-2 origin, 3-5 (unnormalised)
           direction, 6-7 padding.  N % tile_rays == 0.
      z_t: [S, N] float32 per-sample depths (S % s_rows == 0).
      gate: optional int32 [(N // tile_rays) * (S // s_rows)] per-
           (ray-tile, sample-row) flags, row-major in (tile, row) —
           gated-off grid steps skip the MLP and store zeros to all four
           outputs (see _eval_rays_kernel_gated / fused_mlp_sigma_rays).
    Returns:
      (r, g, b, sigma): four [S, N] raw-logit arrays (out_dtype).
    """
    s, n = z_t.shape
    assert od.shape == (8, n), (od.shape, n)
    assert n % tile_rays == 0, (n, tile_rays)
    assert s % s_rows == 0, (s, s_rows)

    out_shape = [jax.ShapeDtypeStruct((s, n), out_dtype)] * 4
    kwargs = dict(
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * (64 * 256 + 6 * 256 * 256 + (64 + 256) * 256
                       + 8 * 256 + 256 * 256 + 256 * 128 + 8 * 128) * s * n,
            bytes_accessed=(8 + s) * 4 * n + 4 * s * n * 4,
            transcendentals=6 * n * s),
        interpret=interpret,
    )
    grid = (n // tile_rays, s // s_rows)
    cdt = jnp.float32 if interpret else jnp.bfloat16
    weights = [packed[name] for name in _W_NAMES]

    if gate is None:
        weight_specs = [
            pl.BlockSpec(packed[name].shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
            for name in _W_NAMES
        ]
        out_spec = pl.BlockSpec((s_rows, tile_rays), lambda i, j: (j, i),
                                memory_space=pltpu.VMEM)
        grid_spec = pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, tile_rays), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s_rows, tile_rays), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                *weight_specs,
            ],
            out_specs=[out_spec] * 4,
        )
        return pl.pallas_call(
            functools.partial(_eval_rays_kernel, L_x, L_d, s_rows, cdt,
                              out_dtype),
            grid_spec=grid_spec, **kwargs)(od, z_t, *weights)

    assert gate.shape == ((n // tile_rays) * (s // s_rows),), (
        gate.shape, n, tile_rays, s, s_rows)
    weight_specs = [
        pl.BlockSpec(packed[name].shape, lambda i, j, g: (0, 0),
                     memory_space=pltpu.VMEM)
        for name in _W_NAMES
    ]
    out_spec = pl.BlockSpec((s_rows, tile_rays), lambda i, j, g: (j, i),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile_rays), lambda i, j, g: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_rows, tile_rays), lambda i, j, g: (j, i),
                         memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=[out_spec] * 4,
    )
    return pl.pallas_call(
        functools.partial(_eval_rays_kernel_gated, L_x, L_d, s_rows, cdt,
                          out_dtype),
        grid_spec=grid_spec, **kwargs)(
            gate.astype(jnp.int32), od, z_t, *weights)


# --------------------------------------------------------------------------
# sigma-only variant: trunk + density head, no view branch.  During
# evaluation with a fine pass, the coarse network only contributes sampling
# weights (test.py:42-47 uses the fine rgb), so its color computation —
# feature/view/color matmuls and the direction embedding — is dead work.

_W_NAMES_SIGMA = ("w0", "w1", "w2", "w3", "w4", "w5e", "w5h", "w6", "w7",
                  "b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7",
                  "wdens", "bdens")


def _mlp_sigma_kernel(L_x: int, cdt, out_dtype, xp_ref, *refs):
    w = dict(zip(_W_NAMES_SIGMA, refs[:-1]))
    out_ref = refs[-1]

    def dot(a, h):
        return jax.lax.dot_general(
            a[:].astype(cdt), h.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    embx = _build_emb(xp_ref[:].astype(jnp.float32), L_x, EMBX_ROWS, cdt)
    h = jax.nn.relu(dot(w["w0"], embx) + w["b0"][:]).astype(cdt)
    for i in (1, 2, 3, 4):
        h = jax.nn.relu(dot(w[f"w{i}"], h) + w[f"b{i}"][:]).astype(cdt)
    h = jax.nn.relu(dot(w["w5e"], embx) + dot(w["w5h"], h)
                    + w["b5"][:]).astype(cdt)
    for i in (6, 7):
        h = jax.nn.relu(dot(w[f"w{i}"], h) + w[f"b{i}"][:]).astype(cdt)
    sigma = dot(w["wdens"], h) + w["bdens"][:]            # [8, T] row 0
    out_ref[:] = sigma.astype(out_dtype)


def fused_mlp_sigma(xplane: jnp.ndarray, packed: Dict[str, jnp.ndarray],
                    L_x: int = 10, tile: int = 8192,
                    interpret: bool = False,
                    out_dtype=jnp.float32) -> jnp.ndarray:
    """Density only: [3, P] positions -> [8, P] (sigma logit in row 0)."""
    p = xplane.shape[-1]
    assert p % tile == 0, (p, tile)
    weight_specs = [
        pl.BlockSpec(packed[n].shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM)
        for n in _W_NAMES_SIGMA
    ]
    grid_spec = pl.GridSpec(
        grid=(p // tile,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )
    cdt = jnp.float32 if interpret else jnp.bfloat16
    return pl.pallas_call(
        functools.partial(_mlp_sigma_kernel, L_x, cdt, out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, p), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xplane, *[packed[n] for n in _W_NAMES_SIGMA])
