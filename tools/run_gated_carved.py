#!/usr/bin/env python
"""Late-stage gated-training certification: the driver-loop A/B on a
CARVED scene (round-4 VERDICT #3's "engage-and-win at scale").

The from-scratch 50k certifications (tools/run_gated_policy.py) cover the
whole trajectory: fog -> carving -> partial engagement.  Real 200k-iter
photometric training spends its majority in the LATE regime where the
field is fully carved and gating engages at high gate_frac — the regime
the +47% microbench (tools/bench_gated_train.py) measures.  This tool
certifies that regime in the UNCHANGED CLI driver loop: distill the
hard-front field once (utils/synth.fit_field_to_blob — the
surface-like opacity front long training converges to), save it as a
checkpoint, then resume BOTH arms (train_precull auto vs off) from that
identical state for ``--iters`` more photometric steps on the matching
hard-scene dataset, policy in the loop.

Artifact: docs/artifacts/GATED_CARVED_r05.json — per-arm sustained
rays/s, gate_frac trajectory, policy decisions, final train PSNR.

Usage: python tools/run_gated_carved.py [--iters 20000]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

LOGDIR = os.path.join(ROOT, "logs", "gated_carved_r05")
ART = os.path.join(ROOT, "docs", "artifacts", "GATED_CARVED_r05.json")
START = 2000          # nominal step of the distilled "late-stage" ckpt


def ensure_dataset() -> str:
    """The same hard-front blob capture run_gated_policy uses."""
    from tools.run_gated_policy import ensure_dataset as ens
    return ens("hard")


def ensure_start_ckpt(exp: str) -> None:
    """Distill the hard front once and save it as <exp>'s START ckpt."""
    import jax
    import jax.numpy as jnp

    from nerf_pytorch_paeng_tpu.config import NerfConfig
    from nerf_pytorch_paeng_tpu.train.checkpoint import (ckpt_dir,
                                                         save_checkpoint)
    from nerf_pytorch_paeng_tpu.train.state import TrainState, make_optimizer
    from nerf_pytorch_paeng_tpu.utils.synth import fit_field_to_blob
    from nerf_pytorch_paeng_tpu.models import init_nerf

    if os.path.isdir(ckpt_dir(LOGDIR, exp, START)):
        return
    cfg = NerfConfig(near=2.0, far=6.0)
    model, params0 = init_nerf(cfg, jax.random.PRNGKey(0))
    print(f">> [{exp}] distilling carved hard-front field...", flush=True)
    params, fit_loss = fit_field_to_blob(
        model, params0, jax.random.PRNGKey(1), n_steps=1500, n_pts=8192,
        blob_r=0.45, blob_cutoff=1.35, blob_amp=60.0, blob_hard_w=0.08,
        uniform_frac=0.25)
    print(f">> [{exp}] fit loss {float(fit_loss):.4f}", flush=True)
    tx = make_optimizer(cfg)
    state = TrainState(jnp.asarray(START, jnp.int32), params,
                       jax.jit(tx.init)(params))
    save_checkpoint(LOGDIR, exp, state)


def run_one(arm: str, iters: int) -> None:
    data = ensure_dataset()
    from nerf_pytorch_paeng_tpu.config import config_from_file
    from nerf_pytorch_paeng_tpu.driver import main_worker

    exp = f"gc_{arm}"
    ensure_start_ckpt(exp)
    cfg = config_from_file(
        os.path.join(ROOT, "configs", "blender", "lego.txt"),
        data_root=data, data_name="gp_hard", exp_name=exp, log_dir=LOGDIR,
        iter_start=START, iter_N=START + iters,
        idx_save=START + iters, idx_test=START + iters, idx_render=0,
        testing_idx=START + iters, testskip=1,
        train_precull=("auto" if arm == "gated" else "off"))
    print(f">> [{arm}] resuming from distilled ckpt @ {START}, "
          f"training to {cfg.iter_N} (train_precull={cfg.train_precull})",
          flush=True)
    main_worker(cfg)


def harvest(iters: int, walls=None) -> dict:
    from tools.run_gated_policy import _csv_rows
    import numpy as np

    arms = []
    for arm in ("gated", "ungated"):
        exp = f"gc_{arm}"
        exp_dir = os.path.join(LOGDIR, exp)
        row: dict = {"arm": arm, "iters": iters, "resume_from": START}
        rows = _csv_rows(os.path.join(exp_dir, "metrics.csv"))
        if rows:
            rps = np.array([float(r["rays_per_sec"]) for r in rows
                            if r.get("rays_per_sec")])
            if rps.size > 2:
                row["sustained_rays_per_sec"] = round(
                    float(np.median(rps[1:])), 1)
                row["rays_per_sec_p10_p90"] = [
                    round(float(np.percentile(rps[1:], p)), 1)
                    for p in (10, 90)]
            row["final_train_psnr_f"] = round(
                float(rows[-1].get("psnr_f") or "nan"), 3)
            gfs = [float(r["gate_frac"]) for r in rows
                   if r.get("gate_frac") not in (None, "", "nan")]
            if gfs:
                row["gate_frac"] = {"n_logged": len(gfs),
                                    "mean": round(float(np.mean(gfs)), 4),
                                    "min": round(float(np.min(gfs)), 4),
                                    "max": round(float(np.max(gfs)), 4)}
        pol = _csv_rows(os.path.join(exp_dir, "precull_policy.csv"))
        if pol:
            gated = [int(r["gated"]) for r in pol]
            row["policy"] = {
                "n_refreshes": len(pol),
                "n_gated": sum(gated),
                "first_gated_iter": next(
                    (int(r["iter"]) for r in pol if r["gated"] == "1"),
                    None)}
        if walls and arm in walls:
            row["wall_clock_sec"] = round(walls[arm], 1)
        arms.append(row)

    g = next((r.get("sustained_rays_per_sec") for r in arms
              if r["arm"] == "gated"), None)
    u = next((r.get("sustained_rays_per_sec") for r in arms
              if r["arm"] == "ungated"), None)
    art = {
        "what": "late-stage (carved-scene) gated-training certification: "
                "both arms resume the SAME distilled hard-front checkpoint "
                "and train photometrically through the unchanged CLI "
                "driver; policy (train_precull=auto) in the loop vs off",
        "iters": iters, "device": "TPU v5e (1 chip)",
        "throughput_ratio_gated_over_ungated":
            round(g / u, 4) if g and u else None,
        "arms": arms,
    }
    os.makedirs(os.path.dirname(ART), exist_ok=True)
    with open(ART, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    return art


def main(iters: int) -> int:
    walls, failures = {}, []
    for arm in ("gated", "ungated"):
        t0 = time.time()
        print(f"\n==== gated-carved: {arm} ({iters} iters) ====", flush=True)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", arm,
                 str(iters)], cwd=ROOT, timeout=7200)
            rc = proc.returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
        walls[arm] = time.time() - t0
        if rc != 0:
            failures.append(f"{arm} rc={rc}")
            print(f"!! {arm} FAILED rc={rc}", flush=True)
    art = harvest(iters, walls)
    print(json.dumps(art, indent=1), flush=True)
    print(f">> artifact written: {ART}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    if args[:1] == ["--one"]:
        run_one(args[1], int(args[2]))
    elif args[:1] == ["--harvest"]:
        print(json.dumps(harvest(int(args[1])), indent=1))
    else:
        iters = 20000
        if args[:1] == ["--iters"]:
            iters = int(args[1])
        sys.exit(main(iters))
