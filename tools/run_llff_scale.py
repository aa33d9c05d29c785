#!/usr/bin/env python
"""LLFF-path scale run on the real chip (round-3 evidence).

The blender flagship (tools/run_flagship_200k.py) evidences the blender
path at the reference's full 200k-iteration scale; this tool does the
same for the LLFF path — the OTHER production pipeline, exercising the
pieces blender never touches: poses_bounds loading with the axis fix,
pose recentering + bound rescale (bd_factor 0.75), the NDC ray
projection applied in-step (reference nerf_process.py:224-226), the
global-batch ray pool over all training views, and the spiral
render path (reference dataset/load_llff.py:299-326).

Real LLFF captures cannot enter this image (zero egress), so it runs the
UNCHANGED reference fern hyperparameters (4096 rays, 64+128 samples,
global batch, cosine 5e-4 -> 5e-5, testskip 8) on a synthetic 20-view
forward-facing 504x378 capture (utils/synth.make_forward_scene — the
fern downsample-8 resolution), generated at the LLFF disk layout so the
entire loader stack runs.  Only iter_N is scaled (default 50k: the LR
schedule still traverses warmup -> cosine -> lr_min because the schedule
is built over iter_N, exactly like a short real run would configure it).

Records wall-clock, sustained rays/s, the traversed schedule, held-out
metrics through the exact evaluator, and spiral-video throughput into
docs/artifacts/LLFF_SCALE_r03.json.

Usage: python tools/run_llff_scale.py [iter_N]
       python tools/run_llff_scale.py --harvest <exp_dir> [iter_N]
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DATA = "/root/data_synth_llff504"
EXP = "llffscale_r03"
LOGDIR = os.path.join(ROOT, "logs")


def ensure_dataset():
    if os.path.isfile(os.path.join(DATA, "poses_bounds.npy")):
        return
    from nerf_pytorch_paeng_tpu.utils.synth import save_as_llff_dataset
    print(">> generating 20-view 504x378 synthetic LLFF capture "
          "(a few minutes of numpy)...", flush=True)
    t0 = time.time()
    save_as_llff_dataset(DATA, n_views=20, H=378, W=504)
    print(f">> dataset written in {time.time()-t0:.0f}s", flush=True)


def harvest(exp_dir: str, iter_n: int, wall: float | None):
    art = {"iter_N": iter_n,
           "config": "reference configs/llff/fern.txt hyperparameters "
                     "(4096 rays, 64+128, global batch, NDC), 20-view "
                     "synthetic 504x378 forward-facing capture",
           "device": "TPU v5e (1 chip)"}
    if wall is not None:
        art["wall_clock_sec"] = round(wall, 1)

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
        for line in txt.splitlines():
            if line.startswith("Mean Value"):
                art["final_heldout_mean"] = line.strip()

    rend = os.path.join(exp_dir, f"{EXP}_{iter_n}", "render_result")
    if os.path.isdir(rend):
        names = sorted(os.listdir(rend))
        art["render_artifacts"] = names[:6]
        pngs = [os.path.join(rend, n) for n in names
                if n.endswith(".png") and "disp" not in n]
        if len(pngs) > 2:
            ts = sorted(os.path.getmtime(p) for p in pngs)
            span = ts[-1] - ts[0]
            if span > 0:
                art["render_frames"] = len(pngs)
                art["render_sec_per_frame"] = round(
                    span / (len(pngs) - 1), 3)

    out = os.path.join(ROOT, "docs", "artifacts", "LLFF_SCALE_r03.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art, indent=1), flush=True)
    print(f">> artifact written: {out}", flush=True)


def main(iter_n: int = 50000):
    ensure_dataset()
    from nerf_pytorch_paeng_tpu.config import config_from_file
    from nerf_pytorch_paeng_tpu.driver import main_worker

    # the reference fern config; overrides: data location, iter_N (and the
    # idx_* hooks rescaled to it), downsample 0 (the synthetic capture is
    # generated AT fern's downsample-8 resolution, 504x378)
    cfg = config_from_file(
        "/root/reference/configs/llff/fern.txt",
        data_root=DATA, data_name="synth_llff504", exp_name=EXP,
        log_dir=LOGDIR, iter_N=iter_n, downsample=0,
        idx_save=iter_n // 2, idx_test=iter_n, idx_render=iter_n,
        testing_idx=iter_n,
    )
    print(f">> cfg: data_type={cfg.data_type} iter_N={cfg.iter_N} "
          f"N_rays={cfg.N_rays} samples={cfg.N_samples_c}+{cfg.N_samples_f} "
          f"global_batch={cfg.global_batch} near={cfg.near} far={cfg.far} "
          f"lr={cfg.lr}->{cfg.lr_min} warmup={cfg.iter_warmup}", flush=True)
    t0 = time.time()
    main_worker(cfg)
    harvest(os.path.join(LOGDIR, EXP), cfg.iter_N, time.time() - t0)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--harvest":
        n = int(sys.argv[3]) if len(sys.argv) > 3 else 50000
        harvest(sys.argv[2], n, None)
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 50000)
