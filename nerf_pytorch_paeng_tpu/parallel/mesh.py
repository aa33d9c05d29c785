"""Device mesh construction.

The reference has no distributed layer at all (SURVEY §2: `rank = 0`
hardcoded at main.py:166-170, `world_size` computed but unused).  Here the
mesh is first-class: rays shard across the ``data`` axis (the natural NeRF
parallelism — rays are embarrassingly parallel) and the MLP width can
shard across ``model``.  Collectives are inserted by GSPMD and ride ICI;
multi-host (DCN) uses the same code path after
``jax.distributed.initialize()``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int = 0, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A (data, model) mesh. n_data=0 means 'all remaining devices'."""
    devices = list(devices if devices is not None else jax.devices())
    n_model = max(1, n_model)
    if n_data <= 0:
        n_data = max(1, len(devices) // n_model)
    n = n_data * n_model
    assert n <= len(devices), (
        f"mesh {n_data}x{n_model} needs {n} devices, have {len(devices)}")
    try:
        arr = mesh_utils.create_device_mesh((n_data, n_model), devices[:n])
    except Exception:  # virtual CPU devices have no topology info
        arr = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def maybe_initialize_distributed() -> None:
    """Multi-host init (no-op single-process). Mirrors what NCCL/MPI init
    would be in a GPU framework; here it just wires the JAX runtime."""
    try:
        if jax.process_count() > 1:
            return  # already initialized
    except RuntimeError:
        pass
    try:
        jax.distributed.initialize()
    except Exception:
        pass  # single-process (the common case)
