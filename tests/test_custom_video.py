"""Custom-capture ingestion: video frame extraction + error paths."""
import os

import cv2
import numpy as np
import pytest

from nerf_pytorch_paeng_tpu.data.colmap.wrapper import (ColmapNotFound,
                                                        run_colmap)
from nerf_pytorch_paeng_tpu.data.custom import (extract_frames_from_video,
                                                load_custom)


def write_video(path, n_frames=12, H=32, W=48):
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    vw = cv2.VideoWriter(path, fourcc, 30.0, (W, H))
    assert vw.isOpened(), "cv2 VideoWriter unavailable"
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        frame = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
        frame[0, 0] = (i, i, i)  # stamp the frame index
        vw.write(frame)
    vw.release()


def test_extract_frames_every_nth(tmp_path):
    root = str(tmp_path)
    write_video(os.path.join(root, "video.MOV"), n_frames=12)
    n = extract_frames_from_video(root, batch=3)
    assert n == 4                      # frames 0, 3, 6, 9
    files = sorted(os.listdir(os.path.join(root, "images")))
    assert files == ["0000.png", "0001.png", "0002.png", "0003.png"]
    img = cv2.imread(os.path.join(root, "images", "0000.png"))
    assert img.shape == (32, 48, 3)


def test_extract_missing_video_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        extract_frames_from_video(str(tmp_path))


def test_load_custom_requires_inputs(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_custom(str(tmp_path))


def test_run_colmap_missing_binary(tmp_path):
    """Without the colmap binary on PATH the wrapper fails with a clear
    actionable error (the binary isn't in this image)."""
    import shutil
    if shutil.which("colmap"):
        pytest.skip("colmap is installed here")
    with pytest.raises(ColmapNotFound):
        run_colmap(str(tmp_path))
