#!/usr/bin/env python
"""The flagship 200k-iteration run (round-3 VERDICT item 5).

Reference headline: PSNR 31.0 on blender after 200k iters of
configs/blender/lego.txt (reference README.md:121, loop main.py:124).
Real blender data cannot enter this image (zero egress), so this runs the
UNCHANGED lego hyperparameters (200k iters, 4096 rays, 64+128 samples,
800x800, per-image sampling, cosine schedule 5e-4 -> 5e-5 with 10k
warmup, checkpoints at idx_save=100000) on a 13-view 800x800 synthetic
blender-format scene, end to end through the CLI driver, on the real
TPU.  Records wall-clock, sustained rays/s, the traversed LR schedule,
checkpoint/test/render artifacts and final held-out PSNR into
docs/artifacts/FLAGSHIP_200K_r03.json.

Usage: python tools/run_flagship_200k.py [iter_N]
       python tools/run_flagship_200k.py --harvest <exp_dir> [iter_N]
         (harvest-only: rebuild the artifact JSON from a completed run's
         log directory — used when the run finished but the in-process
         harvest was lost, e.g. to a tunnel outage)
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DATA = "/root/data_synth_lego800"
EXP = "flagship200k_r03"
LOGDIR = os.path.join(ROOT, "logs")


def ensure_dataset():
    if os.path.isfile(os.path.join(DATA, "transforms_train.json")):
        return
    from nerf_pytorch_paeng_tpu.utils.synth import save_as_blender_dataset
    print(">> generating 13-view 800x800 synthetic blender dataset "
          "(a few minutes of numpy)...", flush=True)
    t0 = time.time()
    save_as_blender_dataset(DATA, n_train=10, n_val=1, n_test=2,
                            H=800, W=800)
    print(f">> dataset written in {time.time()-t0:.0f}s", flush=True)


def harvest(exp_dir: str, iter_n: int, wall: float | None,
            wall_note: str | None = None):
    """Collect run evidence from ``exp_dir`` into the artifact JSON."""
    art = {"iter_N": iter_n,
           "config": "reference configs/blender/lego.txt, unchanged "
                     "hyperparameters, 13-view synthetic 800x800 scene",
           "device": "TPU v5e (1 chip)"}
    if wall is not None:
        art["wall_clock_sec"] = round(wall, 1)
    if wall_note:
        art["wall_clock_note"] = wall_note

    csv_path = os.path.join(exp_dir, "metrics.csv")
    if os.path.isfile(csv_path):
        lines = open(csv_path).read().strip().splitlines()
        header = lines[0].split(",")
        rows = [dict(zip(header, l.split(","))) for l in lines[1:]]
        if rows:
            import numpy as np
            rps = np.array([float(r["rays_per_sec"]) for r in rows
                            if r.get("rays_per_sec")])
            if rps.size > 2:
                art["sustained_rays_per_sec"] = round(
                    float(np.median(rps[1:])), 1)
            art["final_train_psnr_f"] = float(rows[-1].get("psnr_f", "nan"))
            art["final_lr"] = float(rows[-1].get("lr", "nan"))
            lrs = np.array([float(r["lr"]) for r in rows if r.get("lr")])
            if lrs.size:
                art["lr_curve"] = {"start": float(lrs[0]),
                                   "peak": float(lrs.max()),
                                   "end": float(lrs[-1])}
            art["n_metric_rows"] = len(rows)

    art["checkpoints"] = sorted(
        d for d in os.listdir(exp_dir) if d.endswith(".ckpt"))

    res = os.path.join(exp_dir, f"{EXP}_{iter_n}", "test_result",
                       "_result.txt")
    if os.path.isfile(res):
        txt = open(res).read()
        art["test_result_txt"] = txt.splitlines()[-1]
        for line in txt.splitlines():
            if line.startswith("Mean Value"):
                art["final_heldout_mean"] = line.strip()

    rend = os.path.join(exp_dir, f"{EXP}_{iter_n}", "render_result")
    if os.path.isdir(rend):
        names = sorted(os.listdir(rend))
        art["render_artifacts"] = names[:6]
        # video-path throughput from frame-file mtimes (device render +
        # pipelined PNG IO, eval/render.py); PNG frames only — the
        # mp4/gif assembly at the end is host-side imageio
        pngs = [os.path.join(rend, n) for n in names
                if n.endswith(".png") and "disp" not in n]
        if len(pngs) > 2:
            ts = sorted(os.path.getmtime(p) for p in pngs)
            span = ts[-1] - ts[0]
            if span > 0:
                art["render_frames"] = len(pngs)
                art["render_sec_per_frame"] = round(
                    span / (len(pngs) - 1), 3)

    out = os.path.join(ROOT, "docs", "artifacts", "FLAGSHIP_200K_r03.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art, indent=1), flush=True)
    print(f">> artifact written: {out}", flush=True)


def main(iter_n: int = 200000):
    ensure_dataset()
    from nerf_pytorch_paeng_tpu.config import config_from_file
    from nerf_pytorch_paeng_tpu.driver import main_worker

    # the reference lego config, unchanged hyperparameters; only the data
    # path/name and logging destinations differ (diff-verified fields:
    # near/far/bkg_white/global_batch/N_rays/N_samples/L_x/L_d/lr/
    # lr_min/iter_warmup/iter_N/idx_*)
    cfg = config_from_file(
        "/root/reference/configs/blender/lego.txt",
        data_root=DATA, data_name="synth_lego800", exp_name=EXP,
        log_dir=LOGDIR, iter_N=iter_n, testskip=1,
    )
    print(f">> cfg: iter_N={cfg.iter_N} N_rays={cfg.N_rays} "
          f"samples={cfg.N_samples_c}+{cfg.N_samples_f} "
          f"global_batch={cfg.global_batch} lr={cfg.lr}->{cfg.lr_min} "
          f"warmup={cfg.iter_warmup} idx_save={cfg.idx_save} "
          f"idx_test={cfg.idx_test} idx_render={cfg.idx_render}",
          flush=True)
    t0 = time.time()
    main_worker(cfg)
    harvest(os.path.join(LOGDIR, EXP), cfg.iter_N, time.time() - t0)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--harvest":
        n = int(sys.argv[3]) if len(sys.argv) > 3 else 200000
        harvest(sys.argv[2], n, None)
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 200000)
