"""Checkpoint/resume via orbax: params + optimizer state + step.

Behavioral parity target: reference train.py:105-114 / main.py:110-117 —
save every ``idx_save`` iters under logs/<exp>/, resume from
``iter_start``.  Improvements over the reference (SURVEY §5): atomic
orbax writes, and the step count is part of the state so the LR schedule
resumes correctly (the reference restarts its scheduler from 0 on resume).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def latest_checkpoint_step(logdir: str, exp_name: str):
    """Highest step with a checkpoint under logs/<exp>/, or None.

    Backs ``iter_start = -1`` auto-resume (driver.py) — the reference
    requires the user to pass the exact saved iteration by hand
    (main.py:110-117)."""
    import re
    d = os.path.join(logdir, exp_name)
    if not os.path.isdir(d):
        return None
    pat = re.compile(re.escape(exp_name) + r"_(\d+)\.ckpt$")
    steps = [int(m.group(1)) for f in os.listdir(d)
             if (m := pat.match(f)) and os.path.isdir(os.path.join(d, f))]
    return max(steps) if steps else None


def ckpt_dir(logdir: str, exp_name: str, step: int) -> str:
    """logs/<exp>/<exp>_<step>.ckpt — mirrors the reference's
    <exp>_<iter>.pth.tar naming."""
    return os.path.abspath(
        os.path.join(logdir, exp_name, f"{exp_name}_{step}.ckpt"))


def save_checkpoint(logdir: str, exp_name: str, state: TrainState) -> str:
    step = int(state.step)
    path = ckpt_dir(logdir, exp_name, step)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, {"step": np.asarray(step),
                          "params": state.params,
                          "opt_state": state.opt_state},
                   force=True)
    return path


def restore_checkpoint(logdir: str, exp_name: str, step: int,
                       template: TrainState) -> TrainState:
    """Restore into the template's tree structure/shardings."""
    path = ckpt_dir(logdir, exp_name, step)
    with ocp.PyTreeCheckpointer() as ckptr:
        item = {"step": np.asarray(int(template.step)),
                "params": template.params,
                "opt_state": template.opt_state}
        restored = ckptr.restore(path, item=item)
    return TrainState(
        step=jax.numpy.asarray(int(restored["step"]), jax.numpy.int32),
        params=restored["params"],
        opt_state=restored["opt_state"])


def restore_params_only(logdir: str, exp_name: str, step: int,
                        params_template: Any = None):
    """For standalone test/render (reference test.py:20-21,128-130).

    When ``params_template`` carries shardings (e.g. TP over a mesh), the
    restored arrays are device_put back onto them so a sharded eval after
    resume sees the same layout as a fresh start."""
    path = ckpt_dir(logdir, exp_name, step)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path)  # raw numpy tree
    params = restored["params"]
    if params_template is not None:
        params = jax.tree_util.tree_map(
            lambda t, x: jax.device_put(x, t.sharding)
            if hasattr(t, "sharding") else x,
            params_template, params)
    return params
