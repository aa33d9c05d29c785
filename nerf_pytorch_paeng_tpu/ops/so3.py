"""SO(3) helpers: axis-angle (Rodrigues) exponential map.

Capability parity target: reference model/NeRFHelper.py:1-25 (vec2skew /
Exp) — a vestige of a camera-pose-refinement experiment there (imported by
model/NeRF.py:7 but never called).  Provided here as working, tested ops
so pose-refinement extensions can differentiate through camera extrinsics.
"""
from __future__ import annotations

import jax.numpy as jnp


def vec2skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric cross-product matrix."""
    zero = jnp.zeros_like(v[..., 0])
    rows = [
        jnp.stack([zero, -v[..., 2], v[..., 1]], -1),
        jnp.stack([v[..., 2], zero, -v[..., 0]], -1),
        jnp.stack([-v[..., 1], v[..., 0], zero], -1),
    ]
    return jnp.stack(rows, -2)


def so3_exp(r: jnp.ndarray, eps: float = 1e-15) -> jnp.ndarray:
    """Axis-angle [..., 3] -> rotation matrix [..., 3, 3] (Rodrigues).

    R = I + sin(θ)/θ · K + (1-cos(θ))/θ² · K², θ = ||r||; smooth at θ→0.
    """
    theta = jnp.linalg.norm(r, axis=-1, keepdims=True)[..., None]  # [...,1,1]
    k = vec2skew(r)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), k.shape)
    # sin(θ)/θ and (1-cos(θ))/θ² with stable small-angle limits
    t2 = theta * theta
    a = jnp.where(theta < 1e-6, 1.0 - t2 / 6.0, jnp.sin(theta)
                  / jnp.maximum(theta, eps))
    b = jnp.where(theta < 1e-6, 0.5 - t2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.maximum(t2, eps))
    return eye + a * k + b * (k @ k)
