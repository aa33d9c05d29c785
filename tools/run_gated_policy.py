#!/usr/bin/env python
"""Certification of the self-tuning occupancy-gated training policy at
scale (round-3 VERDICT item 4).

For each scene, TWO flagship-class runs through the UNCHANGED CLI driver
on the real TPU — ``train_precull=True`` (the policy in the loop: bounds
refreshed every train_precull_every iters, the kernel-free gate_frac
estimator deciding GATED vs ungated at every refresh, driver.py
refresh_support) vs the ungated baseline — with otherwise identical
reference lego hyperparameters.  The artifact must show:

- the estimator's GATED/ungated decision trajectory over the run
  (logs/<exp>/precull_policy.csv, written by the driver at every refresh),
- gated-run throughput >= the ungated baseline within noise on soft
  content (where always-on gating measured a 12% LOSS —
  docs/artifacts/GATED_TRAIN_AB_r03.json — which is exactly what the
  policy exists to avoid) and a win on carved/hard content,
- the gate_frac trajectory of the steps that ran gated (metrics.csv),
- final held-out PSNR parity between the gated and ungated runs.

Scenes: "soft" = the wide soft blob (the flagship scene; policy must
hold ungated speed), "hard" = a carved hard-front blob (amp 60; policy
must engage and win).  Real datasets cannot enter this image (zero
egress) — both are photometric synthetic blender-format captures.

Usage:
  python tools/run_gated_policy.py                 # soft, 50k, both arms
  python tools/run_gated_policy.py --iters 50000 --scenes soft hard
  python tools/run_gated_policy.py --one soft gated 50000   # one arm
  python tools/run_gated_policy.py --harvest 50000 soft hard
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

LOGDIR = os.path.join(ROOT, "logs", "gated_policy_r04")
ART = os.path.join(ROOT, "docs", "artifacts", "GATED_POLICY_r05.json")
# the round-3 flagship soft-blob capture (reused read-only if present)
FLAGSHIP_DATA = "/root/data_synth_lego800"

SCENES = {
    # default blob: wide soft medium — the content class where always-on
    # gating LOST 12% (GATED_TRAIN_AB_r03.json) and the policy must
    # decline to gate (or gate only when genuinely profitable)
    "soft": None,
    # carved hard front: the content class real 200k photometric training
    # converges to, where gating won +47% in the microbench
    "hard": {"amp": 60.0, "r": 0.45, "cutoff": 1.35,
             "color_freq": 2.0, "color_phase": (0.0, 0.0, 0.0)},
}


def scene_data_dir(scene: str) -> str:
    if scene == "soft" and os.path.isfile(
            os.path.join(FLAGSHIP_DATA, "transforms_train.json")):
        return FLAGSHIP_DATA
    return os.path.join(ROOT, "logs", f"data_gated_{scene}")


def ensure_dataset(scene: str) -> str:
    root = scene_data_dir(scene)
    if os.path.isfile(os.path.join(root, "transforms_train.json")):
        return root
    from nerf_pytorch_paeng_tpu.utils.synth import save_as_blender_dataset
    print(f">> [{scene}] generating 13-view 800x800 synthetic blender "
          f"dataset...", flush=True)
    t0 = time.time()
    kw = {"blob": SCENES[scene]} if SCENES[scene] else {}
    save_as_blender_dataset(root, n_train=10, n_val=1, n_test=2,
                            H=800, W=800, **kw)
    print(f">> [{scene}] dataset written in {time.time()-t0:.0f}s",
          flush=True)
    return root


def exp_name(scene: str, arm: str) -> str:
    return f"gp_{scene}_{arm}"


def run_one(scene: str, arm: str, iters: int) -> None:
    data = ensure_dataset(scene)
    from nerf_pytorch_paeng_tpu.config import config_from_file
    from nerf_pytorch_paeng_tpu.driver import main_worker

    cfg = config_from_file(
        os.path.join(ROOT, "configs", "blender", "lego.txt"),
        data_root=data, data_name=f"gp_{scene}",
        exp_name=exp_name(scene, arm), log_dir=LOGDIR,
        iter_N=iters, idx_save=iters, idx_test=iters, idx_render=0,
        testing_idx=iters, testskip=1,
        train_precull=(arm == "gated"),
    )
    print(f">> [{scene}/{arm}] iter_N={cfg.iter_N} N_rays={cfg.N_rays} "
          f"train_precull={cfg.train_precull} "
          f"every={cfg.train_precull_every} "
          f"min_gate={cfg.train_precull_min_gate}", flush=True)
    main_worker(cfg)


def _csv_rows(path: str):
    if not os.path.isfile(path):
        return []
    lines = open(path).read().strip().splitlines()
    if len(lines) < 2:
        return []
    header = lines[0].split(",")
    return [dict(zip(header, l.split(","))) for l in lines[1:]]


def harvest_arm(scene: str, arm: str, iters: int) -> dict:
    import numpy as np
    exp = exp_name(scene, arm)
    exp_dir = os.path.join(LOGDIR, exp)
    row: dict = {"scene": scene, "arm": arm, "iters": iters}

    rows = _csv_rows(os.path.join(exp_dir, "metrics.csv"))
    if rows:
        rps = np.array([float(r["rays_per_sec"]) for r in rows
                        if r.get("rays_per_sec")])
        if rps.size > 2:
            row["sustained_rays_per_sec"] = round(float(np.median(rps[1:])), 1)
            row["rays_per_sec_p10_p90"] = [
                round(float(np.percentile(rps[1:], p)), 1) for p in (10, 90)]
        # `or "nan"`: empty field from a partially written trailing row
        # (killed run) degrades to nan instead of aborting the harvest
        row["final_train_psnr_f"] = round(
            float(rows[-1].get("psnr_f") or "nan"), 3)
        gfs = [(int(r["step"]), float(r["gate_frac"])) for r in rows
               if r.get("gate_frac") not in (None, "", "nan")]
        if gfs:
            steps, vals = zip(*gfs)
            row["gate_frac_trajectory"] = {
                "n_logged": len(gfs),
                "first": [steps[0], round(vals[0], 4)],
                "last": [steps[-1], round(vals[-1], 4)],
                "mean": round(float(np.mean(vals)), 4),
                "min": round(float(np.min(vals)), 4),
                "max": round(float(np.max(vals)), 4),
            }

    pol = _csv_rows(os.path.join(exp_dir, "precull_policy.csv"))
    if pol:
        gated = [int(r["gated"]) for r in pol]
        its = [int(r["iter"]) for r in pol]
        trans = [[its[0], gated[0]]]
        for it, g in zip(its[1:], gated[1:]):
            if g != trans[-1][1]:
                trans.append([it, g])
        row["policy"] = {
            "n_refreshes": len(pol),
            "n_gated": sum(gated),
            "first_valid_iter": next(
                (int(r["iter"]) for r in pol if r["bounds_valid"] == "1"),
                None),
            "first_gated_iter": next(
                (it for it, g in zip(its, gated) if g), None),
            "transitions": trans[:40],
            "gate_frac_pred_last": float(pol[-1]["gate_frac_pred"]),
        }

    res = os.path.join(exp_dir, f"{exp}_{iters}", "test_result",
                       "_result.txt")
    if os.path.isfile(res):
        for line in open(res).read().splitlines():
            if line.startswith("Mean Value"):
                parts = line.replace("\t", " ").split()
                try:
                    row["heldout_psnr"] = round(
                        float(parts[parts.index("PSNR") + 2]), 3)
                    row["heldout_ssim"] = round(
                        float(parts[parts.index("SSIM") + 2]), 4)
                except (ValueError, IndexError):
                    row["heldout_raw"] = line.strip()
    return row


def harvest_all(iters: int, scenes, walls: dict | None = None) -> dict:
    arms = []
    for scene in scenes:
        for arm in ("gated", "ungated"):
            row = harvest_arm(scene, arm, iters)
            if walls and (scene, arm) in walls:
                row["wall_clock_sec"] = round(walls[(scene, arm)], 1)
            arms.append(row)

    def _of(scene, arm, key):
        return next((r.get(key) for r in arms
                     if r["scene"] == scene and r["arm"] == arm), None)

    verdicts = {}
    for scene in scenes:
        g = _of(scene, "gated", "sustained_rays_per_sec")
        u = _of(scene, "ungated", "sustained_rays_per_sec")
        pg = _of(scene, "gated", "heldout_psnr")
        pu = _of(scene, "ungated", "heldout_psnr")
        verdicts[scene] = {
            "throughput_ratio_gated_over_ungated":
                round(g / u, 4) if g and u else None,
            "heldout_psnr_gap": round(pg - pu, 4)
                if pg is not None and pu is not None else None,
        }

    art = {
        "what": "self-tuning gated-training policy certification: "
                "train_precull=True (policy in the loop) vs ungated "
                "baseline, unchanged lego hyperparameters, synthetic "
                "photometric scenes (zero-egress stand-ins)",
        "iters": iters,
        "device": "TPU v5e (1 chip)",
        "policy_knobs": {"train_precull_every": 256,
                         "train_precull_min_gate": 0.15},
        "verdicts": verdicts,
        "arms": arms,
    }
    os.makedirs(os.path.dirname(ART), exist_ok=True)
    with open(ART, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    return art


def main(iters: int, scenes) -> int:
    walls: dict = {}
    failures = []
    for scene in scenes:
        for arm in ("gated", "ungated"):
            t0 = time.time()
            print(f"\n==== gated-policy: {scene}/{arm} ({iters} iters) ====",
                  flush=True)
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--one",
                     scene, arm, str(iters)],
                    cwd=ROOT, timeout=14400)
                rc = proc.returncode
            except subprocess.TimeoutExpired:
                rc = "timeout"   # one arm must not take down the cert run
            walls[(scene, arm)] = time.time() - t0
            if rc != 0:
                failures.append(f"{scene}/{arm} rc={rc}")
                print(f"!! {scene}/{arm} FAILED rc={rc}", flush=True)
    art = harvest_all(iters, scenes, walls)
    print(json.dumps(art, indent=1), flush=True)
    print(f">> artifact written: {ART}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    if args[:1] == ["--one"]:
        run_one(args[1], args[2], int(args[3]))
    elif args[:1] == ["--harvest"]:
        iters = int(args[1])
        print(json.dumps(harvest_all(iters, args[2:] or ["soft"]),
                         indent=1))
    else:
        iters, scenes = 50000, ["soft"]
        while args:
            if args[0] == "--iters":
                iters = int(args[1]); args = args[2:]
            elif args[0] == "--scenes":
                scenes = args[1:]; args = []
            else:
                raise SystemExit(f"unknown arg {args[0]}")
        sys.exit(main(iters, scenes))
