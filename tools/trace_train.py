#!/usr/bin/env python
"""Capture a jax.profiler device trace of the train step and print the
per-op time breakdown (parsed from the xplane proto via
tensorboard_plugin_profile).  Feeds the round-3 perf push."""
from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

TRACE_DIR = "/tmp/nerf_trace"


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def main():
    from nerf_pytorch_paeng_tpu.config import NerfConfig
    from nerf_pytorch_paeng_tpu.train import (create_train_state,
                                              make_train_step)

    cfg = NerfConfig(near=2.0, far=6.0)
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx, cfg))
    rng = np.random.default_rng(0)
    sh = (cfg.N_rays, 3)
    o = jnp.asarray(rng.normal(size=sh), jnp.float32)
    d = jnp.asarray(rng.normal(size=sh), jnp.float32)
    rgb = jnp.asarray(rng.uniform(size=sh), jnp.float32)
    key = jax.random.PRNGKey(1)

    state, m = step(state, o, d, rgb, key)
    sync(m["loss"])
    print("warm; tracing...", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        state, m = step(state, o, d, rgb, key)
    sync(m["loss"])
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                      recursive=True)
    print("xplane files:", files, flush=True)


if __name__ == "__main__":
    main()
