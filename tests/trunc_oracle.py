"""Shared numpy oracle for per-ray sample-window truncation tests.

Single source of truth for recomputing phase-1 sample requirements
(eval/frame.py) in tests — and, unlike a formula copy, it asserts the
windows' first-principles error contract on every ray, so an off-by-one
drift in ops/render.truncation_bounds fails loudly here instead of
hiding inside a matching copy of the same bug.
"""
from __future__ import annotations

import numpy as np


def sample_requirements(w: np.ndarray, n_fine: int, eps: float) -> np.ndarray:
    """Per-ray merged-sample requirement s_req [M] from coarse weights
    [M, Sc] (mirrors ops/render.truncation_bounds + phase 1's
    ``s_req = n_fine + k_need - k_start``).

    Asserts the contract the margins must preserve: the coarse mass
    strictly before the window start is < eps, and the remaining mass
    past the window end is <= eps (unless the window runs to the last
    coarse sample).  The one-bin margins may only WIDEN the window, so
    these hold for the margin-adjusted bounds too.
    """
    nc = w.shape[-1]
    cum = np.cumsum(np.asarray(w, np.float64), -1)
    k_need = np.minimum((1.0 - cum > eps).sum(-1) + 2, nc)
    k_start = np.maximum((cum < eps).sum(-1) - 1, 0)
    k_need = np.maximum(k_need, k_start)

    # first-principles contract: pad[k] = coarse mass strictly before
    # sample k
    pad = np.concatenate([np.zeros((len(w), 1)), cum], -1)
    lead_mass = np.take_along_axis(pad, k_start[:, None], -1)[:, 0]
    tail_mass = 1.0 - np.take_along_axis(pad, k_need[:, None], -1)[:, 0]
    tol = eps * (1 + 1e-3) + 1e-7
    assert (lead_mass < tol).all(), float(lead_mass.max())
    assert ((tail_mass <= tol) | (k_need == nc)).all(), \
        float(tail_mass[k_need < nc].max())

    return n_fine + k_need - k_start
