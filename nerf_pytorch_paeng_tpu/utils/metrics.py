"""Small numeric helpers shared by train/eval (reference utils.py:6-17)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def img2mse(x, y):
    return jnp.mean((x - y) ** 2)


def mse2psnr(x):
    """-10·log10(mse) (reference utils.py:17)."""
    return -10.0 * jnp.log(x) / jnp.log(10.0)


def to8b(x: np.ndarray) -> np.ndarray:
    """float [0,1]-ish -> uint8 (reference utils.py:11)."""
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)
