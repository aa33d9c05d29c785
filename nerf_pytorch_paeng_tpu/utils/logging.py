"""Training observability: stdout + CSV + optional TensorBoard.

Capability parity target: the reference's visdom live plots + periodic
prints (train.py:73-102, main.py:24).  Visdom needs a server; here metrics
stream to a CSV under logs/<exp>/metrics.csv (plot with anything) and,
when torch's TensorBoard writer is importable, to TensorBoard events —
same periodic-index knobs (idx_print / idx_vis).

TPU-first detail: the step function returns metrics as device arrays; the
logger is the only place they are materialised, and only on logging steps,
so the train loop never blocks on device->host syncs between log points.
"""
from __future__ import annotations

import csv
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, logdir: str, exp_name: str, use_tensorboard: bool = True):
        self.dir = os.path.join(logdir, exp_name)
        os.makedirs(self.dir, exist_ok=True)
        self.csv_path = os.path.join(self.dir, "metrics.csv")
        self._csv_file = None
        self._csv_writer = None
        self._fields = None
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(self.dir, "tb"))
            except Exception:
                self._tb = None
        self._t0 = time.time()
        self._last_step = 0
        self._last_time = self._t0

    def log(self, step: int, metrics: Dict[str, object],
            to_stdout: bool = False, n_rays: Optional[int] = None) -> None:
        vals = {k: float(v) for k, v in metrics.items()}
        now = time.time()
        dstep = step - self._last_step
        if dstep > 0:
            vals["steps_per_sec"] = dstep / max(now - self._last_time, 1e-9)
            if n_rays:
                vals["rays_per_sec"] = vals["steps_per_sec"] * n_rays
        self._last_step, self._last_time = step, now

        if self._csv_writer is None or set(vals) - set(self._fields or ()):
            self._reopen_csv(vals)
        self._csv_writer.writerow({"step": step, **vals})
        self._csv_file.flush()

        if self._tb is not None:
            for k, v in vals.items():
                self._tb.add_scalar(k, v, step)

        if to_stdout:
            parts = " , ".join(f"{k} : {v:.6g}" for k, v in vals.items())
            print(f"i : {step} , {parts}")

    def _reopen_csv(self, vals: Dict[str, float]) -> None:
        self._fields = sorted(set(vals) | set(self._fields or ()))
        fieldnames = ["step"] + self._fields
        if self._csv_file:
            self._csv_file.close()
        if os.path.isfile(self.csv_path):
            # schema grew mid-run: rewrite existing rows under the new
            # header so columns stay aligned
            with open(self.csv_path, newline="") as f:
                rows = list(csv.DictReader(f))
            with open(self.csv_path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=fieldnames, restval="",
                                   extrasaction="ignore")
                w.writeheader()
                w.writerows(rows)
            self._csv_file = open(self.csv_path, "a", newline="")
            self._csv_writer = csv.DictWriter(
                self._csv_file, fieldnames=fieldnames, restval="",
                extrasaction="ignore")
        else:
            self._csv_file = open(self.csv_path, "w", newline="")
            self._csv_writer = csv.DictWriter(
                self._csv_file, fieldnames=fieldnames, restval="",
                extrasaction="ignore")
            self._csv_writer.writeheader()

    def close(self) -> None:
        if self._csv_file:
            self._csv_file.close()
        if self._tb is not None:
            self._tb.close()
