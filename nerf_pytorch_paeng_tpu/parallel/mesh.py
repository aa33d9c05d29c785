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

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"

# Explicit multi-host launch contract: set all three on every process and
# the driver wires the JAX distributed runtime before touching devices.
#   NERF_TPU_COORDINATOR   = "host:port" of process 0
#   NERF_TPU_NUM_PROCESSES = world size
#   NERF_TPU_PROCESS_ID    = this process's rank
_MULTIHOST_ENV = ("NERF_TPU_COORDINATOR", "NERF_TPU_NUM_PROCESSES",
                  "NERF_TPU_PROCESS_ID")
_distributed_done = False


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
    would be in a GPU framework; here it just wires the JAX runtime.

    Failure policy: when a multi-host launch was explicitly requested via
    the ``NERF_TPU_*`` env contract, an init failure RAISES — a
    misconfigured cluster launch must not silently degrade to
    single-process training (it would train on 1/Nth of the devices with
    no warning).  Only the auto-detect path (no env vars set) is allowed
    to quietly conclude "single process".
    Exercised for real by tests/test_multiprocess.py (2 coordinated CPU
    processes, psum-matched against single-process)."""
    global _distributed_done
    if _distributed_done:
        return

    # The explicit env-contract branch must run BEFORE any backend probe:
    # jax.process_count() initializes the backends, after which
    # jax.distributed.initialize() is rejected.
    requested = {v: os.environ.get(v) for v in _MULTIHOST_ENV
                 if os.environ.get(v)}
    if requested:
        missing = [v for v in _MULTIHOST_ENV if v not in requested]
        if missing:
            raise RuntimeError(
                f"multi-host launch half-configured: {sorted(requested)} "
                f"set but {missing} missing — set all of {_MULTIHOST_ENV} "
                f"on every process")
        try:
            jax.distributed.initialize(
                coordinator_address=requested["NERF_TPU_COORDINATOR"],
                num_processes=int(requested["NERF_TPU_NUM_PROCESSES"]),
                process_id=int(requested["NERF_TPU_PROCESS_ID"]))
        except Exception as e:
            raise RuntimeError(
                f"multi-host launch requested ({requested}) but "
                f"jax.distributed.initialize() failed — refusing to "
                f"degrade to single-process") from e
        _distributed_done = True
        return

    try:
        if jax.process_count() > 1:
            _distributed_done = True
            return  # already initialized
    except RuntimeError:
        pass
    try:
        jax.distributed.initialize()  # cluster auto-detect (TPU pod/SLURM)
    except Exception:
        pass  # single-process (the common case)
    _distributed_done = True
