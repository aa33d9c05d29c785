"""Training state: params + Adam state + step, as one pytree.

The reference holds these in torch Module/Optimizer objects
(main.py:70-90); here they are one immutable pytree so the whole update
is a pure function that jit/pjit can shard and orbax can checkpoint.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.nerf import init_nerf
from .schedule import schedule_from_cfg


class TrainState(NamedTuple):
    step: jnp.ndarray          # scalar int32, number of completed updates
    params: Any
    opt_state: Any


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Adam(β1=.9, β2=.999, eps=1e-8) with the warmup-cosine schedule —
    matches reference main.py:79-90 + scheduler.py."""
    return optax.adam(learning_rate=schedule_from_cfg(cfg),
                      b1=0.9, b2=0.999, eps=1e-8)


def create_train_state(cfg, key: jax.Array):
    """Fresh model params + optimizer state. Returns (model, state, tx)."""
    model, params = init_nerf(cfg, key)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    state = TrainState(jnp.zeros((), jnp.int32), params, opt_state)
    return model, state, tx
