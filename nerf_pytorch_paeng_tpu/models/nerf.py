"""The NeRF MLP (coarse + fine pair) in flax.linen, designed for the MXU.

Architecture parity target: reference model/NeRF.py:10-78 —
8×256 Dense+ReLU trunk with a skip concat of the encoded position after
trunk layer index 4, a 1-ch density head (activation applied later in the
volume renderer), a 256-ch feature head, a view-dependent 128-ch branch and
a 3-ch color head; two *independent* modules (coarse/fine) with
Xavier-uniform kernel init.

TPU-first choices (none of these exist in the reference):
- matmuls run in a configurable ``compute_dtype`` (default bfloat16) with
  float32 parameters and float32 accumulation — this keeps the trunk on the
  MXU at full rate while the compositing math stays float32;
- kernels carry ``('model', None)`` / ``(None, 'model')`` logical sharding
  annotations so the 256-wide trunk can tensor-shard across a mesh axis via
  pjit without touching the model code;
- both sub-MLPs hang off one module so a single params pytree checkpoints
  and shards uniformly.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.posenc import posenc_out_dim

Dtype = jnp.dtype


class ShardedDense(nn.Module):
    """Dense layer with float32 params and a configurable compute dtype.

    Params stay a plain pytree; tensor-parallel PartitionSpecs are attached
    by path in parallel/sharding.py (trunk kernels shard their output axis
    over the 'model' mesh axis, head kernels their input axis) so the model
    code stays mesh-agnostic.
    """
    features: int
    compute_dtype: Dtype = jnp.bfloat16
    kernel_axes: Tuple[str, ...] = (None, "model")  # informational

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (x.shape[-1], self.features), jnp.float32)
        # Bias init matches the reference: torch nn.Linear's default
        # uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) is kept for biases since
        # NeRF._init_weights only re-initialises weights
        # (reference model/NeRF.py:63-65).
        bound = 1.0 / float(x.shape[-1]) ** 0.5
        bias = self.param(
            "bias",
            lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -bound, bound),
            (self.features,))
        y = jax.lax.dot_general(
            x.astype(self.compute_dtype), kernel.astype(self.compute_dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y + bias


class NeRFMLP(nn.Module):
    """One radiance-field MLP: embedded (pos ‖ dir) -> (rgb logits, σ logit)."""
    depth: int = 8
    width: int = 256
    in_ch_x: int = 63
    in_ch_d: int = 27
    skips: Sequence[int] = (4,)
    compute_dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        pts, dirs = jnp.split(x, [self.in_ch_x], axis=-1)
        h = pts
        for i in range(self.depth):
            h = ShardedDense(self.width, self.compute_dtype,
                             kernel_axes=(None, "model"), name=f"trunk_{i}")(h)
            h = jax.nn.relu(h)
            if i in self.skips:
                h = jnp.concatenate([pts.astype(h.dtype), h], axis=-1)
        sigma = ShardedDense(1, self.compute_dtype,
                             kernel_axes=("model", None), name="density")(h)
        feat = ShardedDense(self.width, self.compute_dtype,
                            kernel_axes=("model", None), name="feature")(h)
        h = jnp.concatenate([feat, dirs.astype(feat.dtype)], axis=-1)
        h = ShardedDense(self.width // 2, self.compute_dtype,
                         kernel_axes=(None, "model"), name="view")(h)
        h = jax.nn.relu(h)
        rgb = ShardedDense(3, self.compute_dtype,
                           kernel_axes=("model", None), name="color")(h)
        return jnp.concatenate(
            [rgb.astype(jnp.float32), sigma.astype(jnp.float32)], axis=-1)


class NeRF(nn.Module):
    """Coarse + fine pair (independent weights, reference model/NeRF.py:55-78)."""
    depth: int = 8
    width: int = 256
    L_x: int = 10
    L_d: int = 4
    skips: Sequence[int] = (4,)
    compute_dtype: Dtype = jnp.bfloat16

    def setup(self):
        in_x = posenc_out_dim(self.L_x)
        in_d = posenc_out_dim(self.L_d)
        kw = dict(depth=self.depth, width=self.width, in_ch_x=in_x,
                  in_ch_d=in_d, skips=tuple(self.skips),
                  compute_dtype=self.compute_dtype)
        self.coarse = NeRFMLP(**kw)
        self.fine = NeRFMLP(**kw)

    def __call__(self, x):
        # Touch both sub-modules so `init` materialises all params.
        return self.coarse(x), self.fine(x)

    def coarse_fwd(self, x):
        return self.coarse(x)

    def fine_fwd(self, x):
        return self.fine(x)


def init_nerf(cfg, key: jax.Array):
    """Build the model and float32 params pytree from a NerfConfig."""
    model = NeRF(
        depth=cfg.netDepth, width=cfg.netWidth, L_x=cfg.L_x, L_d=cfg.L_d,
        compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
        else jnp.float32)
    in_dim = posenc_out_dim(cfg.L_x) + posenc_out_dim(cfg.L_d)
    dummy = jnp.zeros((2, in_dim), jnp.float32)
    params = model.init(key, dummy)["params"]
    return model, params
