#!/usr/bin/env python
"""Benchmark: train throughput + full-frame render latency on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric: training rays/sec/chip at the reference workload
(4096 rays/step, 64 coarse + 128 fine samples, the 8x256 coarse+fine
model — reference configs/blender/lego.txt).  Extras report the 800x800
frame render seconds and per-step wall time.

Baseline: the reference repo publishes no throughput numbers (SURVEY §6);
a PyTorch NeRF at this exact workload runs ~3.3 it/s on an RTX 3090
(~13.5k rays/s), which we use as the vs_baseline denominator.

Methodology: a pipelined host loop of jitted steps (async dispatch — the
host never blocks between launches) with one hard device->host sync per
repetition, timed over several repetitions after a warmup/compile run.
Dispatch latency overlaps execution, so this measures device throughput.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RAYS_PER_SEC = 13_500.0  # RTX 3090 estimate (see module docstring)


def bench_train(n_steps: int = 15, reps: int = 3, use_pallas: bool = True):
    """Pipelined steps with a hard host sync per rep — on the remote TPU
    backend ``block_until_ready`` returns before execution finishes, so
    only a device->host value transfer gives a true wall time."""
    from nerf_pytorch_paeng_tpu.config import NerfConfig
    from nerf_pytorch_paeng_tpu.train import (create_train_state,
                                              make_train_step)

    # defaults == reference lego workload (4096 rays, 64+128, 8x256)
    cfg = NerfConfig(near=2.0, far=6.0, use_pallas=use_pallas)
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx, cfg))

    rng = np.random.default_rng(0)
    sh = (cfg.N_rays, 3)
    o = jnp.asarray(rng.normal(size=sh), jnp.float32)
    d = jnp.asarray(rng.normal(size=sh), jnp.float32)
    rgb = jnp.asarray(rng.uniform(size=sh), jnp.float32)
    key = jax.random.PRNGKey(1)

    state, m = step(state, o, d, rgb, key)   # warmup/compile
    float(m["loss"])                          # hard sync

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, m = step(state, o, d, rgb, key)
        float(m["loss"])                      # hard sync
        times.append(time.perf_counter() - t0)
    sec_per_step = min(times) / n_steps
    return cfg.N_rays / sec_per_step, sec_per_step


def bench_render(H: int = 800, W: int = 800, block: int = 16384,
                 reps: int = 3, use_pallas: bool = True):
    from nerf_pytorch_paeng_tpu.config import NerfConfig
    from nerf_pytorch_paeng_tpu.eval.frame import make_frame_renderer
    from nerf_pytorch_paeng_tpu.models import init_nerf

    cfg = NerfConfig(near=2.0, far=6.0, chunk_rays=block,
                     use_pallas=use_pallas)
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))
    K = np.array([[0.7 * W, 0, W / 2], [0, 0.7 * W, H / 2], [0, 0, 1]])
    render = make_frame_renderer(model, cfg, H, W, K, block_rays=block)
    c2w = jnp.asarray(
        np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.0]]), jnp.float32)

    rgb, disp = render(params, c2w, jax.random.PRNGKey(1))
    float(rgb[0, 0, 0])                       # hard sync (see bench_train)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        rgb, disp = render(params, c2w, jax.random.PRNGKey(2))
        float(rgb[0, 0, 0])
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    dev = jax.devices()[0]
    rays_per_sec, sec_per_step = bench_train()
    try:
        render_sec = round(bench_render(), 3)
    except Exception as e:  # never lose the train number to a render fault
        render_sec = f"failed: {type(e).__name__}"
    result = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "sec_per_train_step_4096rays": round(sec_per_step, 5),
        "render_800x800_sec": render_sec,
        "device": str(dev),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
