#!/usr/bin/env python
"""Trace the production culled frame render (and the exact dense render)
on the trained blob scene; parse with tools/parse_trace.py.  Also prints
wall times and the phase-2 active-ray count."""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def main():
    from bench import _train_blob_model
    from nerf_pytorch_paeng_tpu.config import NerfConfig
    from nerf_pytorch_paeng_tpu.eval.frame import make_frame_renderer

    which = sys.argv[1] if len(sys.argv) > 1 else "auto"
    H = W = 800
    cfg = NerfConfig(near=2.0, far=6.0)
    model, params, poses, fit_loss = _train_blob_model(cfg)
    print(f"fit loss {fit_loss:.4f}", flush=True)
    focal = 0.9 * W
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])
    c2w = jnp.asarray(poses[0][:3, :4])

    r = make_frame_renderer(model, dataclasses.replace(cfg, render_cull=which),
                            H, W, K)
    rgb, disp = r(params, c2w, jax.random.PRNGKey(1))
    sync(rgb)
    print("warm", flush=True)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        rgb, disp = r(params, c2w, jax.random.PRNGKey(2 + i))
        sync(rgb)
        times.append(time.perf_counter() - t0)
    print(f"{which} render: {min(times):.3f} s", flush=True)

    tdir = f"/tmp/nerf_trace_render_{which}"
    jax.profiler.start_trace(tdir)
    rgb, disp = r(params, c2w, jax.random.PRNGKey(9))
    sync(rgb)
    jax.profiler.stop_trace()
    print(f"trace in {tdir}", flush=True)


if __name__ == "__main__":
    main()
