"""MetricLogger CSV stream and camera visualization artifacts."""
import csv
import os

import numpy as np

from nerf_pytorch_paeng_tpu.utils.logging import MetricLogger
from nerf_pytorch_paeng_tpu.utils.visualize import (visualize_extrinsics,
                                                    visualize_rays)


def test_metric_logger_csv(tmp_path):
    lg = MetricLogger(str(tmp_path), "exp", use_tensorboard=False)
    lg.log(100, {"loss": 0.5, "psnr": 10.0}, n_rays=1024)
    lg.log(200, {"loss": 0.25, "psnr": 13.0}, n_rays=1024)
    lg.close()
    rows = list(csv.DictReader(open(tmp_path / "exp" / "metrics.csv")))
    assert len(rows) == 2
    assert float(rows[1]["loss"]) == 0.25
    assert float(rows[1]["psnr"]) == 13.0
    # throughput derived from the step delta
    assert float(rows[1]["rays_per_sec"]) > 0


def test_metric_logger_new_fields_midstream(tmp_path):
    lg = MetricLogger(str(tmp_path), "exp2", use_tensorboard=False)
    lg.log(1, {"loss": 1.0})
    lg.log(2, {"loss": 0.5, "extra": 7.0})   # schema grows
    lg.close()
    txt = (tmp_path / "exp2" / "metrics.csv").read_text()
    assert "extra" in txt


def test_visualize_extrinsics_and_rays(tmp_path):
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4)[None, :3, :4], (5, 1, 1)).astype(np.float32)
    poses[:, :3, 3] = rng.normal(size=(5, 3))
    p = visualize_extrinsics(poses, str(tmp_path), name="cams")
    assert os.path.isfile(p) and os.path.getsize(p) > 0

    o = rng.normal(size=(10, 3)).astype(np.float32)
    d = rng.normal(size=(10, 3)).astype(np.float32)
    p2 = visualize_rays(o, d, str(tmp_path / "rays.png"))
    assert os.path.isfile(p2) and os.path.getsize(p2) > 0
