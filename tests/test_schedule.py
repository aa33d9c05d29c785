import math

import numpy as np

from nerf_pytorch_paeng_tpu.config import NerfConfig
from nerf_pytorch_paeng_tpu.train.schedule import (
    cosine_annealing_warmup_restarts, schedule_from_cfg)


def oracle_lr(step, first_cycle_steps, warmup_steps, max_lr, min_lr):
    """Pure-python oracle of the single-cycle reference semantics
    (scheduler.py:54-64 with cycle_mult=1, gamma=1)."""
    cycle = step // first_cycle_steps
    sic = step % first_cycle_steps
    if sic < warmup_steps:
        return (max_lr - min_lr) * sic / warmup_steps + min_lr
    return min_lr + (max_lr - min_lr) * (
        1 + math.cos(math.pi * (sic - warmup_steps)
                     / (first_cycle_steps - warmup_steps))) / 2


def test_matches_oracle_over_cycle():
    fcs, warm, mx, mn = 2001, 100, 5e-4, 5e-5
    for step in [0, 1, 50, 99, 100, 101, 500, 1000, 1999, 2000, 2001, 2500]:
        got = float(cosine_annealing_warmup_restarts(
            step, fcs, warm, mx, mn))
        want = oracle_lr(step, fcs, warm, mx, mn)
        np.testing.assert_allclose(got, want, rtol=1e-5,
                                   err_msg=f"step={step}")


def test_endpoints():
    s = schedule_from_cfg(NerfConfig(iter_N=200000, iter_warmup=10000,
                                     lr=5e-4, lr_min=5e-5))
    assert abs(float(s(0)) - 5e-5) < 1e-9          # starts at min_lr
    assert abs(float(s(10000)) - 5e-4) < 1e-9      # peak right after warmup
    assert abs(float(s(200000)) - 5e-5) < 1e-6     # decays back near min_lr


def test_monotone_warmup_then_decay():
    s = schedule_from_cfg(NerfConfig(iter_N=1000, iter_warmup=100))
    lrs = np.array([float(s(i)) for i in range(0, 1001, 10)])
    warm = lrs[:10]
    decay = lrs[11:]
    assert (np.diff(warm) > 0).all()
    assert (np.diff(decay) < 1e-12).all()


def test_cycle_mult_restarts():
    # cycle 0: len 100; cycle 1: len 200 starting at step 100
    lr_end_c0 = float(cosine_annealing_warmup_restarts(
        99, 100, 10, 1e-3, 1e-5, cycle_mult=2.0))
    lr_start_c1 = float(cosine_annealing_warmup_restarts(
        100, 100, 10, 1e-3, 1e-5, cycle_mult=2.0))
    assert lr_end_c0 < 1e-4          # near floor at cycle end
    assert abs(lr_start_c1 - 1e-5) < 1e-7  # restart at min_lr (warmup start)
