"""Pallas kernel: hierarchical resampling (inverse-CDF + sorted merge).

Replaces two XLA glue ops on the Pallas render path:
- ``sample_pdf`` (reference nerf_process.py:144-182): the broadcast-compare
  formulation materialises [R, S_f, B] tensors in HBM (~5 ms per 16k rays);
  in VMEM the same math is ~free.
- the ``jnp.sort`` merge of coarse+fine depths (reference
  nerf_process.py:67, ~3 ms per 16k rays): the fine samples are drawn with
  *sorted* uniforms (exponential order statistics — exactly the
  distribution of sorted iid uniforms), so both sequences are sorted and
  the merge is a counting merge + one-hot scatter, all in VMEM.

Gradient note: the kernel's output carries no parameter gradient by
construction — the reference detaches the fine z's (nerf_process.py:66)
and the coarse z's are parameter-free — so callers wrap it in
stop_gradient and no VJP is needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from ..ops.sampling import sorted_uniform  # noqa: F401  (canonical home)


def _resample_kernel(n_fine: int, z_ref, w_ref, u_ref, tri_ref, out_ref):
    z = z_ref[:].astype(jnp.float32)                  # [Rt, Sc]
    w = w_ref[:].astype(jnp.float32)                  # [Rt, Sc-2]
    u = u_ref[:].astype(jnp.float32)                  # [Rt, Sf] sorted
    rt, sc = z.shape
    nb = sc - 1                                       # bins = z midpoints

    bins = 0.5 * (z[:, 1:] + z[:, :-1])               # [Rt, Sc-1]
    w = w + 1e-5
    pdf = w / jnp.sum(w, -1, keepdims=True)           # [Rt, Sc-2]
    # cdf[k] = sum_{j<k} pdf_j via a strict lower-triangular ones matrix
    cdf = jax.lax.dot_general(pdf, tri_ref[:],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [Rt, nb]

    # searchsorted-right + one-hot interpolation (all VMEM-resident)
    le = (cdf[:, None, :] <= u[:, :, None])           # [Rt, Sf, nb]
    inds = jnp.sum(le.astype(jnp.int32), -1)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(nb - 1, inds)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb), 2)

    def pick(vals, idx):
        oh = (idx[:, :, None] == iota_b)
        return jnp.sum(jnp.where(oh, vals[:, None, :], 0.0), -1)

    cdf_b, cdf_a = pick(cdf, below), pick(cdf, above)
    bins_b, bins_a = pick(bins, below), pick(bins, above)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    zs = bins_b + (u - cdf_b) / denom * (bins_a - bins_b)  # [Rt, Sf] sorted

    # counting merge of two sorted sequences (ties resolved by the
    # strict/non-strict split, so positions never collide)
    s_all = sc + n_fine
    cnt_z = jnp.sum((zs[:, None, :] < z[:, :, None]).astype(jnp.int32), -1)
    pos_z = jax.lax.broadcasted_iota(jnp.int32, (rt, sc), 1) + cnt_z
    cnt_s = jnp.sum((z[:, None, :] <= zs[:, :, None]).astype(jnp.int32), -1)
    pos_s = jax.lax.broadcasted_iota(jnp.int32, (rt, n_fine), 1) + cnt_s

    iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s_all), 2)
    scat_z = jnp.sum(jnp.where(pos_z[:, :, None] == iota_k,
                               z[:, :, None], 0.0), 1)        # [Rt, s_all]
    scat_s = jnp.sum(jnp.where(pos_s[:, :, None] == iota_k,
                               zs[:, :, None], 0.0), 1)
    out_ref[:] = scat_z + scat_s


def fused_resample(z_vals: jnp.ndarray, weights: jnp.ndarray,
                   u_sorted: jnp.ndarray, tile: int = 8,
                   interpret: bool = False) -> jnp.ndarray:
    """Merged, sorted coarse+fine depths: [R, Sc + Sf].

    Args:
      z_vals:  [R, Sc] sorted coarse depths.
      weights: [R, Sc-2] coarse weights[1:-1] (unnormalised).
      u_sorted: [R, Sf] *sorted* uniforms (see sorted_uniform).
    """
    r, sc = z_vals.shape
    sf = u_sorted.shape[-1]
    assert r % tile == 0, (r, tile)
    nb = sc - 1
    # cumulative-sum matrix: pdf_j contributes to cdf_k iff j < k
    tri = jnp.asarray(
        (np.arange(sc - 2)[:, None] < np.arange(nb)[None, :]), jnp.float32)

    grid_spec = pl.GridSpec(
        grid=(r // tile,),
        in_specs=[
            pl.BlockSpec((tile, sc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, sc - 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, sf), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sc - 2, nb), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, sc + sf), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_resample_kernel, sf),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, sc + sf), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(z_vals, weights, u_sorted, tri)
