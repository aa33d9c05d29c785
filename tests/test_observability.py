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


def test_visualize_extrinsics_with_center_rays(tmp_path):
    """The ray-augmented `_R_t` plot (reference visualize.py:113-136):
    z-sampled points along each camera's center-pixel ray."""
    from nerf_pytorch_paeng_tpu.utils.visualize import center_ray_points

    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4)[None, :3, :4], (3, 1, 1)).astype(np.float32)
    poses[:, :3, 3] = rng.normal(size=(3, 3))
    K = np.array([[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]])
    p = visualize_extrinsics(poses, str(tmp_path), name="cams_rays",
                             K=K, hw=(64, 64), near=2.0, far=6.0)
    assert os.path.isfile(p) and os.path.getsize(p) > 0

    # the sampled points lie on the center ray between near and far
    pts = center_ray_points(poses[0], K, (64, 64), 2.0, 6.0, n_z=16)
    o = poses[0, :3, 3]
    d = poses[0, :3, :3] @ np.array([0.0, 0.0, -1.0])  # cx==W//2, cy==H//2
    t = (pts - o)[:, 2] / d[2]
    np.testing.assert_allclose(pts, o + d * t[:, None], rtol=1e-6, atol=1e-9)
    assert (t >= 2.0 - 1e-6).all() and (t <= 6.0 + 1e-6).all()
