"""Positional (Fourier-feature) encoding.

Math parity target: reference model/PositionalEncoding.py:7-36 —
γ(p) = [p, sin(2^0 p), cos(2^0 p), ..., sin(2^{L-1} p), cos(2^{L-1} p)],
identity included first, frequencies multiply the *raw* coordinates (the
reference omits the paper's π factor), channel layout grouped per
frequency as (sin_xyz, cos_xyz).

On TPU this is pure VPU work that XLA fuses into the consumer matmul's
producer; there is no reason to hand-kernel it on its own.
"""
from __future__ import annotations

import jax.numpy as jnp


def posenc_out_dim(L: int, input_dim: int = 3) -> int:
    """3 + 3*2L: 63 for L=10, 27 for L=4 (reference PositionalEncoding.py:13-24)."""
    return input_dim + input_dim * 2 * L


def positional_encoding(x: jnp.ndarray, L: int) -> jnp.ndarray:
    """Encode ``x[..., D]`` -> ``[..., D + 2*L*D]``.

    Layout matches the reference: [x, sin(f0*x), cos(f0*x), sin(f1*x), ...].
    """
    if L == 0:
        return x
    dtype = x.dtype
    freqs = (2.0 ** jnp.arange(L)).astype(dtype)            # [L]
    xb = x[..., None, :] * freqs[:, None]                    # [..., L, D]
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)     # [..., L, 2, D]
    enc = enc.reshape(*x.shape[:-1], L * 2 * x.shape[-1])
    return jnp.concatenate([x, enc], axis=-1)
