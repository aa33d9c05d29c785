#!/usr/bin/env python
"""Production-shape live-reference parity artifact (round-4 VERDICT #1).

Runs the actual reference PyTorch code on CPU at the FLAGSHIP shapes —
4096 rays x (64 coarse + 192 merged fine) samples, 8x256 coarse+fine,
fp32, the global-batch trainer — against our jitted train step, with the
real chunk loops iterating on both sides:

- ours:      cfg.chunk_pts = 262144 (the framework default) — the fine
             pass (786,432 points) runs as 3 compiled chunks
- reference: chunk_pts = 524288 (the reference default,
             nerf_process.py:190-206) — the fine pass runs 2 host-loop
             chunks with DIFFERENT boundaries than ours

so chunk-boundary math, searchsorted ties at 128 fine samples, and
4096-ray batch statistics are exercised live (the r04 artifacts used
64-256 rays and never crossed either chunk boundary).

Two sections:
- "train": >= 50 optimizer steps, per-step relative loss deviation
  (bar: max < 1%).
- "render_core": one full-shape render_rays comparison (4096 rays,
  64+192), max |diff| per output.

~1.4 TFLOP/step/side on one CPU core — budget ~1-2 h for 50 steps.
Usage: python tools/production_parity_artifact.py [steps]
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1").strip()
import jax

jax.config.update("jax_platforms", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np

ART = os.path.join(ROOT, "docs", "artifacts", "PRODUCTION_PARITY_r05.json")


def main(steps: int = 50) -> None:
    from test_reference_parity import (run_render_core_parity,
                                       run_trajectory_parity)

    out = {
        "what": "live-reference parity at flagship production shapes: "
                "4096 rays x (64+192) samples, 8x256 coarse+fine, fp32, "
                "global-batch step; our chunk_pts=262144 (fine: 3 chunks) "
                "vs reference chunk_pts=524288 (fine: 2 chunks) — both "
                "chunk loops iterate, boundaries differ",
        "device": "CPU (reference torch runs nowhere else in-image)",
    }

    print(f">> train trajectory: {steps} steps at 4096 x (64+192)...",
          flush=True)
    t0 = time.time()
    ours, ref = run_trajectory_parity(
        steps=steps, n_rays=4096, sc=64, sf=128,
        chunk_pts_ours=262144, chunk_pts_ref=524288)
    psnr = lambda l: -10.0 * np.log10(np.maximum(l, 1e-12))  # noqa: E731
    rel = np.abs(ours - ref) / np.maximum(ref, 1e-12)
    out["train"] = {
        "steps": int(steps),
        "workload": "4096 rays x 64+128(fine draw; 192 merged) samples, "
                    "8x256, fp32, chunk_pts ours=262144 / ref=524288",
        "max_rel_loss_dev": float(rel.max()),
        "mean_rel_loss_dev": float(rel.mean()),
        "final_loss_ours": float(ours[-1]),
        "final_loss_ref": float(ref[-1]),
        "final_psnr_gap": float(abs(psnr(ours[-1]) - psnr(ref[-1]))),
        "per_step_rel_dev_first10": [float(r) for r in rel[:10]],
        "wall_sec": round(time.time() - t0, 1),
    }
    print(json.dumps(out["train"]), flush=True)

    print(">> render core: one 4096 x (64+192) comparison...", flush=True)
    t0 = time.time()
    d = run_render_core_parity(n_rays=4096, sc=64, sf=128,
                               chunk_pts_ours=262144, chunk_pts_ref=524288)
    out["render_core"] = {
        k: {"max_abs_diff": float(np.abs(a - b).max()),
            "max_ref_abs": float(np.abs(b).max())}
        for k, (a, b) in d.items()
    }
    out["render_core"]["wall_sec"] = round(time.time() - t0, 1)
    print(json.dumps(out["render_core"]), flush=True)

    os.makedirs(os.path.dirname(ART), exist_ok=True)
    with open(ART, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f">> artifact written: {ART}", flush=True)
    ok = out["train"]["max_rel_loss_dev"] < 1e-2
    print(f">> BAR {'MET' if ok else 'MISSED'}: max rel loss dev "
          f"{out['train']['max_rel_loss_dev']:.2e} (< 1e-2 required)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
