#!/usr/bin/env python
"""500-step training-trajectory parity artifact (round-3 VERDICT item 5).

Runs the shared trajectory-parity harness (tests/test_reference_parity.py:
our jitted train step vs the LIVE reference optimizer loop on torch CPU,
identical init/RNG/batches) for 500 steps and writes a drift-curve JSON to
docs/artifacts/TRAJECTORY_PARITY_r03.json.

Run on CPU: the harness forces nothing itself, so set the platform like
tests/conftest.py does (this script does it below).
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


def main(steps: int = 500):
    from test_reference_parity import run_trajectory_parity
    ours, ref = run_trajectory_parity(steps)
    psnr = lambda l: -10.0 * np.log10(np.maximum(l, 1e-12))
    rel = np.abs(ours - ref) / np.maximum(ref, 1e-12)
    # drift tolerance curve: max relative loss deviation per 50-step window
    win = 50
    curve = [
        {"steps": f"{i}-{min(i + win, steps)}",
         "max_rel_loss_dev": float(rel[i:i + win].max()),
         "mean_rel_loss_dev": float(rel[i:i + win].mean()),
         "psnr_gap_end": float(abs(psnr(ours[min(i + win, steps) - 1])
                                   - psnr(ref[min(i + win, steps) - 1])))}
        for i in range(0, steps, win)
    ]
    out = {
        "steps": steps,
        "workload": "64 rays, 16+32 samples, 8x256 coarse+fine, fp32",
        "final_loss_ours": float(ours[-1]),
        "final_loss_ref": float(ref[-1]),
        "final_psnr_ours": float(psnr(ours[-1])),
        "final_psnr_ref": float(psnr(ref[-1])),
        "final_psnr_gap": float(abs(psnr(ours[-1]) - psnr(ref[-1]))),
        "max_rel_loss_dev": float(rel.max()),
        "drift_curve": curve,
    }
    path = os.path.join(ROOT, "docs", "artifacts",
                        "TRAJECTORY_PARITY_r03.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "drift_curve"}))
    print(f"written: {path}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
