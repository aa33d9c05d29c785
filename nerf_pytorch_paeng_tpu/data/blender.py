"""Blender-synthetic dataset loader (NeRF's transforms_*.json format).

Behavioral parity target: reference dataset/load_blender.py:13-77 —
train/val/test JSON splits, ``testskip`` thinning for val/test, focal from
``camera_angle_x``, optional integer downsample with area interpolation,
and alpha compositing onto a white (``bkg_white``) or black background.
Returns float32 numpy; arrays move to device once, later, as one transfer.
"""
from __future__ import annotations

import json
import os
from typing import List

import cv2
import imageio.v2 as imageio
import numpy as np

SPLITS = ("train", "val", "test")


def load_blender(data_root: str, bkg_white: bool = True, downsample: int = 0,
                 testskip: int = 8):
    """Returns (images [N,H,W,3], [K, extrinsics [N,4,4]], [H, W], i_split)."""
    metas = {}
    for s in SPLITS:
        with open(os.path.join(data_root, f"transforms_{s}.json")) as fp:
            metas[s] = json.load(fp)

    all_imgs: List[np.ndarray] = []
    all_poses: List[np.ndarray] = []
    counts = [0]
    for s in SPLITS:
        frames = metas[s]["frames"]
        skip = 1 if (s == "train" or testskip == 0) else testskip
        imgs, poses = [], []
        for frame in frames[::skip]:
            fname = os.path.join(data_root, frame["file_path"] + ".png")
            imgs.append(imageio.imread(fname))
            poses.append(np.array(frame["transform_matrix"], np.float32))
        all_imgs.append((np.array(imgs) / 255.0).astype(np.float32))
        all_poses.append(np.array(poses, np.float32))
        counts.append(counts[-1] + len(imgs))

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    imgs = np.concatenate(all_imgs, 0)         # [N, H, W, 4] (RGBA)
    extrinsics = np.concatenate(all_poses, 0)  # [N, 4, 4]

    H, W = imgs.shape[1:3]
    camera_angle_x = float(metas["train"]["camera_angle_x"])
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)

    if downsample:
        H, W = int(H // downsample), int(W // downsample)
        focal = focal / downsample
        imgs = np.stack(
            [cv2.resize(im, (W, H), interpolation=cv2.INTER_AREA)
             for im in imgs], 0)

    K = np.array([[focal, 0, 0.5 * W],
                  [0, focal, 0.5 * H],
                  [0, 0, 1]], np.float64)

    rgb, a = imgs[..., :3], imgs[..., -1:]
    imgs = rgb * a + (1.0 - a) if bkg_white else rgb * a
    return imgs.astype(np.float32), [K, extrinsics], [int(H), int(W)], i_split
