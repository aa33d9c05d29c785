"""Learning-rate schedule: cosine annealing with linear warmup and restarts.

Semantics parity target: reference scheduler.py:6-95
(CosineAnnealingWarmupRestarts): lr starts at ``min_lr``, warms up linearly
to ``max_lr`` over ``warmup_steps``, cosine-decays back to ``min_lr`` over
the rest of the cycle; optional cycle restarts with period growth
``cycle_mult`` and peak decay ``gamma``.  The driver uses one cycle of
``iter_N + 1`` steps (reference main.py:83-90).

Implemented as a pure jnp function of the step count so it can live inside
the jitted update (optax schedule).  Step indexing: the reference calls
``scheduler.step()`` *after* each train iter, so train iter ``i``
(1-indexed) runs with ``step_in_cycle = i - 1`` — exactly optax's 0-based
update count.
"""
from __future__ import annotations

import jax.numpy as jnp


def cosine_annealing_warmup_restarts(
    step,
    first_cycle_steps: int,
    warmup_steps: int = 0,
    max_lr: float = 0.1,
    min_lr: float = 0.001,
    cycle_mult: float = 1.0,
    gamma: float = 1.0,
):
    """lr at 0-based ``step``. All hyperparams are static Python numbers."""
    step = jnp.asarray(step, jnp.float32)
    fcs = float(first_cycle_steps)

    if cycle_mult == 1.0:
        cycle = jnp.floor(step / fcs)
        sic = step - cycle * fcs
        cycle_len = fcs
    else:
        cm = float(cycle_mult)
        # closed form from the reference's epoch-given path (scheduler.py:81-87)
        n = jnp.floor(
            jnp.log(step / fcs * (cm - 1.0) + 1.0) / jnp.log(cm))
        cycle = n
        cycle_start = fcs * (cm ** n - 1.0) / (cm - 1.0)
        sic = step - cycle_start
        cycle_len = fcs * cm ** n

    # the reference decays the peak directly: max_lr·γ^cycle (scheduler.py:92)
    peak = jnp.asarray(max_lr * gamma ** cycle, jnp.float32)

    warm = min_lr + (peak - min_lr) * sic / max(warmup_steps, 1)
    cos = min_lr + (peak - min_lr) * (
        1.0 + jnp.cos(jnp.pi * (sic - warmup_steps)
                      / (cycle_len - warmup_steps))) / 2.0
    return jnp.where(sic < warmup_steps, warm, cos)


def schedule_from_cfg(cfg):
    """The reference driver's instantiation (main.py:83-90): one cycle of
    ``iter_N + 1`` steps, warmup ``iter_warmup``, peak ``lr``, floor ``lr_min``."""
    def schedule(step):
        return cosine_annealing_warmup_restarts(
            step,
            first_cycle_steps=cfg.iter_N + 1,
            warmup_steps=cfg.iter_warmup,
            max_lr=cfg.lr,
            min_lr=cfg.lr_min,
            cycle_mult=1.0,
            gamma=1.0,
        )
    return schedule
