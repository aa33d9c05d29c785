"""Pin the driver's single-chip graft contract: ``__graft_entry__.entry()``.

The driver compile-checks ``jax.jit(fn)(*example_args)`` single-chip; round 3
shipped with stale kwargs in ``entry()`` (TypeError at trace time) that no
test caught because nothing imported it.  This test IS that import.
"""
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_entry_jits_and_runs():
    import __graft_entry__ as g

    fn, example_args = g.entry()
    out = jax.jit(fn)(*example_args)
    out = np.asarray(out)
    assert out.shape == (1024, 3)
    assert np.isfinite(out).all()
