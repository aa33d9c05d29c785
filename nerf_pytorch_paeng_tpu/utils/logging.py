"""Training observability: stdout + CSV + optional TensorBoard.

Capability parity target: the reference's visdom live plots + periodic
prints (train.py:73-102, main.py:24).  Visdom needs a server; here metrics
stream to a CSV under logs/<exp>/metrics.csv (plot with anything) and,
when torch's TensorBoard writer is importable, to TensorBoard events —
same periodic-index knobs (idx_print / idx_vis).

TPU-first detail: the step function returns metrics as device arrays; the
logger is the only place they are materialised, and only on logging steps,
so the train loop never blocks on device->host syncs between log points.

The CSV schema is declared UP FRONT (every column the train step can emit,
including ones that appear mid-run like ``gate_frac`` at the first gated
refresh) so a 200k-step run never re-reads and rewrites the whole file when
a metric first shows up.  A truly unknown metric still triggers a one-time
merge-rewrite, and a resumed run appends to a matching-schema file.
"""
from __future__ import annotations

import csv
import os
import time
from typing import Dict, Iterable, Optional

# every metric the training loop can emit (train/step.py:_loss_and_metrics
# + driver._log_step + the derived throughput columns below) — declared up
# front so mid-run appearance (gate_frac, rays_per_sec on the second log
# point) never grows the schema
DEFAULT_FIELDS = ("loss", "loss_c", "loss_f", "psnr", "psnr_c", "psnr_f",
                  "lr", "gate_frac", "steps_per_sec", "rays_per_sec")


class MetricLogger:
    def __init__(self, logdir: str, exp_name: str,
                 use_tensorboard: bool = True,
                 fields: Iterable[str] = DEFAULT_FIELDS,
                 fresh: bool = False):
        self.dir = os.path.join(logdir, exp_name)
        os.makedirs(self.dir, exist_ok=True)
        self.csv_path = os.path.join(self.dir, "metrics.csv")
        self._fields = sorted(set(fields))
        self._csv_file = None
        self._csv_writer = None
        if fresh and os.path.isfile(self.csv_path):
            # fresh run over a reused exp_name: truncate — interleaving
            # rows from different runs would silently corrupt harvests
            os.remove(self.csv_path)
        self._open_csv()
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

        unknown = set(vals) - set(self._fields)
        if unknown:   # exceptional: a metric outside the declared schema
            self._fields = sorted(set(self._fields) | unknown)
            self._open_csv(rewrite=True)
        self._csv_writer.writerow({"step": step, **vals})
        self._csv_file.flush()

        if self._tb is not None:
            for k, v in vals.items():
                self._tb.add_scalar(k, v, step)

        if to_stdout:
            parts = " , ".join(f"{k} : {v:.6g}" for k, v in vals.items())
            print(f"i : {step} , {parts}")

    def _open_csv(self, rewrite: bool = False) -> None:
        fieldnames = ["step"] + self._fields
        if self._csv_file:
            self._csv_file.close()
        if os.path.isfile(self.csv_path):
            with open(self.csv_path, newline="") as f:
                existing = next(csv.reader(f), None)
            if existing == fieldnames and not rewrite:
                # resume (or re-init) with the same schema: plain append
                self._csv_file = open(self.csv_path, "a", newline="")
            else:
                # schema changed vs what's on disk: one-time merge-rewrite
                # so old rows stay aligned under the union header
                with open(self.csv_path, newline="") as f:
                    rows = list(csv.DictReader(f))
                self._fields = sorted(
                    (set(existing or ()) | set(fieldnames)) - {"step"})
                fieldnames = ["step"] + self._fields
                with open(self.csv_path, "w", newline="") as f:
                    w = csv.DictWriter(f, fieldnames=fieldnames, restval="",
                                       extrasaction="ignore")
                    w.writeheader()
                    w.writerows(rows)
                self._csv_file = open(self.csv_path, "a", newline="")
        else:
            self._csv_file = open(self.csv_path, "w", newline="")
            self._csv_file.write(",".join(fieldnames) + "\r\n")
            self._csv_file.flush()
        self._csv_writer = csv.DictWriter(
            self._csv_file, fieldnames=fieldnames, restval="",
            extrasaction="ignore")

    def close(self) -> None:
        if self._csv_file:
            self._csv_file.close()
        if self._tb is not None:
            self._tb.close()
