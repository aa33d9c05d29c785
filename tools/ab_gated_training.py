#!/usr/bin/env python
"""End-to-end A/B of occupancy-gated training (cfg.train_precull) on a
real training trajectory: the UNCHANGED reference lego hyperparameters on
the flagship synthetic 800x800 scene, run twice through the CLI driver —
gated vs ungated — for iter_N steps (default 20k).

Records per-run wall clock, sustained rays/s (steady-state tail of
metrics.csv), and final held-out PSNR through the exact evaluator into
docs/artifacts/GATED_TRAIN_AB_r03.json.  The claim under test: gating
changes throughput, not the trajectory (train/precull.py exactness
notes) — final PSNR must agree to training-noise level, and the gated
run must get FASTER once the field carves empty space (from random init
bounds are invalid and gating is a no-op, so early iters run at the
ungated rate).

Usage: python tools/ab_gated_training.py [iter_N]
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

LOGDIR = os.path.join(ROOT, "logs")


def run_one(exp: str, iter_n: int, mode: str, data: str) -> dict:
    """mode: 'ungated' | 'gated' (forced: min_gate=0, always gate while
    bounds are valid) | 'auto' (the shipping policy: the driver's
    profitability estimator decides at each refresh)."""
    from nerf_pytorch_paeng_tpu.config import load_config
    from nerf_pytorch_paeng_tpu.driver import main_worker

    argv = ["--config", os.path.join(ROOT, "configs/blender/lego.txt"),
            "--data_root", data, "--exp_name", exp,
            "--log_dir", LOGDIR,
            "--iter_N", str(iter_n),
            "--idx_save", str(iter_n), "--idx_test", str(iter_n),
            "--idx_render", "0", "--idx_print", "1000",
            "--testskip", "1"]
    if mode != "ungated":
        argv += ["--train_precull", "True"]
    if mode == "gated":
        argv += ["--train_precull_min_gate", "0"]
    cfg = load_config(argv)
    t0 = time.time()
    main_worker(cfg)
    wall = time.time() - t0

    exp_dir = os.path.join(LOGDIR, exp)
    res = {"wall_clock_sec": round(wall, 1), "iter_N": iter_n,
           "train_precull": mode != "ungated", "mode": mode}
    # steady-state throughput: median of the logged tail (first logs pay
    # compile + invalid-bounds iters)
    import csv
    rows = list(csv.DictReader(open(os.path.join(exp_dir, "metrics.csv"))))
    rps = [float(r["rays_per_sec"]) for r in rows if r.get("rays_per_sec")]
    if rps:
        tail = sorted(rps[len(rps) // 2:])
        res["rays_per_sec_tail_median"] = round(tail[len(tail) // 2], 1)
        res["rays_per_sec_last"] = round(rps[-1], 1)
    # final held-out PSNR (exact evaluator; eval/test.py writes _result.txt)
    tr = os.path.join(exp_dir, f"{exp}_{iter_n}", "test_result",
                      "_result.txt")
    if os.path.isfile(tr):
        for line in open(tr):
            if line.startswith("Mean Value"):
                # "Mean Value ) PSNR : <v>\tSSIM : <v>\tLPIPS : <v>"
                res["final_psnr_line"] = line.strip()
                res["final_psnr"] = float(
                    line.split("PSNR :")[1].split("\t")[0])
    return res


def main(iter_n: int = 20000, arms=("ungated", "gated", "auto")):
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from run_flagship_200k import DATA, ensure_dataset
    ensure_dataset()

    out = os.path.join(ROOT, "docs", "artifacts", "GATED_TRAIN_AB_r03.json")
    # merge into an existing artifact so single arms can be (re)run
    art = json.load(open(out)) if os.path.isfile(out) else {}
    art.update({"scene": "flagship 13-view synthetic 800x800",
                "config": "configs/blender/lego.txt unchanged except iter_N",
                "device": "TPU v5e (1 chip)"})
    for arm in arms:
        art[arm] = run_one(f"ab_{arm}_r03", iter_n, arm, DATA)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        json.dump(art, open(out, "w"), indent=1)
    print(json.dumps(art, indent=1))


if __name__ == "__main__":
    it = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    arms = tuple(sys.argv[2].split(",")) if len(sys.argv) > 2 else (
        "ungated", "gated", "auto")
    main(it, arms)
