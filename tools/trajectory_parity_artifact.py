#!/usr/bin/env python
"""Training-trajectory parity artifact (round-3 VERDICT item 5, extended
per round-4: >= 2000 steps AND both production trainer paths).

Runs the shared trajectory-parity harnesses (tests/test_reference_parity.py:
our jitted train step vs the LIVE reference optimizer loop on torch CPU,
identical init/RNG/batches) and writes drift-curve JSON to
docs/artifacts/TRAJECTORY_PARITY_r04.json:

- "blender": the blender-path trainer (run_trajectory_parity — random unit
  rays, no NDC), the strongest zero-egress PSNR-parity evidence.
- "llff_ndc": the llff production trainer (run_trajectory_parity_ndc —
  camera-model rays from a forward-facing capture, NDC applied in-step on
  our side / inside batchify on the reference side, global batch).  Run at
  256 rays: NDC amplifies fp32 epsilons into occasional inverse-CDF bin
  flips worth ~1e-4 loss each, so per-step deviation scales as 1/N_rays
  (measured 3.5e-2 max at 64 rays -> 4.9e-3 at 256) — the flip-noise
  scaling itself is parity evidence (see the in-suite test's docstring).

Run on CPU: the harness forces nothing itself, so set the platform like
tests/conftest.py does (this script does it below).

Usage: python tools/trajectory_parity_artifact.py [steps] [ndc_steps]
"""
from __future__ import annotations

import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1").strip()
import jax

jax.config.update("jax_platforms", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np


def _summarize(ours, ref, steps, workload):
    psnr = lambda l: -10.0 * np.log10(np.maximum(l, 1e-12))
    rel = np.abs(ours - ref) / np.maximum(ref, 1e-12)
    win = max(50, steps // 20)
    curve = [
        {"steps": f"{i}-{min(i + win, steps)}",
         "max_rel_loss_dev": float(rel[i:i + win].max()),
         "mean_rel_loss_dev": float(rel[i:i + win].mean()),
         "psnr_gap_end": float(abs(psnr(ours[min(i + win, steps) - 1])
                                   - psnr(ref[min(i + win, steps) - 1])))}
        for i in range(0, steps, win)
    ]
    return {
        "steps": steps,
        "workload": workload,
        "final_loss_ours": float(ours[-1]),
        "final_loss_ref": float(ref[-1]),
        "final_psnr_ours": float(psnr(ours[-1])),
        "final_psnr_ref": float(psnr(ref[-1])),
        "final_psnr_gap": float(abs(psnr(ours[-1]) - psnr(ref[-1]))),
        "max_rel_loss_dev": float(rel.max()),
        "drift_curve": curve,
    }


def main(steps: int = 2000, ndc_steps: int = 2000):
    from test_reference_parity import (run_trajectory_parity,
                                       run_trajectory_parity_ndc)
    out = {}

    print(f">> blender path: {steps} steps...", flush=True)
    ours, ref = run_trajectory_parity(steps)
    out["blender"] = _summarize(
        ours, ref, steps, "64 rays, 16+32 samples, 8x256 coarse+fine, fp32")
    print(json.dumps({k: v for k, v in out["blender"].items()
                      if k != "drift_curve"}), flush=True)

    print(f">> llff/NDC path: {ndc_steps} steps...", flush=True)
    ours, ref = run_trajectory_parity_ndc(ndc_steps, n_rays=256)
    out["llff_ndc"] = _summarize(
        ours, ref, ndc_steps,
        "256 camera rays (forward capture), NDC in-step, global batch, "
        "16+32 samples, 8x256 coarse+fine, fp32")
    print(json.dumps({k: v for k, v in out["llff_ndc"].items()
                      if k != "drift_curve"}), flush=True)

    path = os.path.join(ROOT, "docs", "artifacts",
                        "TRAJECTORY_PARITY_r04.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"written: {path}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 2000)
