"""Global ray-batch pool: every train pixel's (ray_o ‖ ray_d ‖ rgb) triple,
device-resident, with epoch reshuffle.

Behavioral parity target: reference main.py:93-106 (pool build + shuffle)
and utils.py:41-58 (GetterRayBatchIdx cursor with reshuffle-on-exhaustion).
TPU-first: the pool is built with a jitted batched ray generator and lives
in HBM as one [M, 3, 3] array; batches are device-side dynamic slices (the
pool never round-trips to the host) and the epoch reshuffle is a device
``jax.random.permutation``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rays import get_rays_batched


def build_ray_pool(images: np.ndarray, K: np.ndarray, poses: np.ndarray,
                   i_train: np.ndarray, key: jax.Array) -> jnp.ndarray:
    """[M, 3, 3] pool of (ray_o, ray_d, rgb) for all train pixels, shuffled.

    images: [N, H, W, 3] float32; poses: [N, 3or4, 4]; K: [3,3].
    """
    H, W = images.shape[1:3]
    poses_train = jnp.asarray(poses)[jnp.asarray(i_train), :3, :4]
    rays_o, rays_d = get_rays_batched(H, W, jnp.asarray(K, jnp.float32),
                                      poses_train)        # [T, H, W, 3]
    rgb = jnp.asarray(images, jnp.float32)[jnp.asarray(i_train)]
    pool = jnp.stack([rays_o, rays_d, rgb], axis=3)        # [T, H, W, 3, 3]
    pool = pool.reshape(-1, 3, 3)
    perm = jax.random.permutation(key, pool.shape[0])
    return pool[perm]


class RayPool:
    """Cursor over the shuffled pool; reshuffles on device when exhausted.

    Mirrors reference utils.py:41-58 but stays functional on the device
    side: only the integer cursor lives on the host.
    """

    def __init__(self, pool: jnp.ndarray, key: jax.Array):
        self.pool = pool
        self.key = key
        self.i_batch = 0
        self.epoch = 0

    def next_batch(self, n: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Convenience slice for tests/tools — NOT the production path:
        its ~4 eager device ops cost ~4 x 20 ms of tunnel dispatches per
        step on the remote backend.  Training loops must use
        ``next_start`` and slice the pool INSIDE their jitted step
        (driver.py's _slice_step; see next_start's docstring)."""
        start = self.next_start(n)
        batch = jax.lax.dynamic_slice_in_dim(self.pool, start, n, 0)
        return batch[:, 0, :], batch[:, 1, :], batch[:, 2, :]

    def next_start(self, n: int) -> int:
        """Advance the cursor and return the batch start offset.

        Host-side integer bookkeeping only — the caller slices the
        (device-resident) pool INSIDE its jitted step, so a training step
        costs one dispatch instead of ~10 eager ops (each a ~20 ms tunnel
        round-trip on the remote backend; see driver.py)."""
        if self.i_batch + n > self.pool.shape[0]:
            self.key, sub = jax.random.split(self.key)
            perm = jax.random.permutation(sub, self.pool.shape[0])
            self.pool = self.pool[perm]
            self.i_batch = 0
            self.epoch += 1
        start = self.i_batch
        self.i_batch += n
        return start

    def fast_forward(self, steps: int, n: int) -> None:
        """Replay ``steps`` completed ``next_start(n)`` calls in O(epochs).

        The pool trajectory is fully deterministic in (initial pool, key,
        step count): the cursor advances n per call and each exhaustion
        reshuffles with the next split of ``self.key``.  An exact resume
        (driver.py) therefore needs no pool state in the checkpoint — it
        rebuilds the initial pool and fast-forwards, after which the
        resumed run serves bit-identical batches to the uninterrupted one
        (pinned by tests/test_cli.py::test_resume_matches_uninterrupted).

        Epoch math: per_epoch = M // n batches are served per pool order;
        the reshuffle happens at the START of calls per_epoch+1,
        2*per_epoch+1, ... so after ``steps`` calls exactly
        (steps-1) // per_epoch reshuffles have occurred.
        """
        if steps <= 0:
            return
        M = self.pool.shape[0]
        per_epoch = M // n
        assert per_epoch > 0, (M, n)
        reshuffles = (steps - 1) // per_epoch
        for _ in range(reshuffles):
            self.key, sub = jax.random.split(self.key)
            perm = jax.random.permutation(sub, M)
            self.pool = self.pool[perm]
            self.epoch += 1
        self.i_batch = (steps - reshuffles * per_epoch) * n
