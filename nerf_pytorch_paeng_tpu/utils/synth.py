"""Tiny analytic synthetic scene for end-to-end tests and smoke runs.

A soft Gaussian density blob with a position-dependent color, volume-
rendered analytically with numpy using the same compositing formulas as
the renderer (white background).  Gives a fully self-consistent multi-view
dataset a NeRF can actually learn, in milliseconds, with no assets —
the test-suite stand-in for the blender scenes (no such facility exists in
the reference; its only 'test' was evaluating rendered images, SURVEY §4).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def orbit_pose(theta: float, phi: float, radius: float) -> np.ndarray:
    """[4,4] camera-to-world looking at the origin from spherical coords."""
    st, ct = np.sin(theta), np.cos(theta)
    sp, cp = np.sin(phi), np.cos(phi)
    # camera center
    center = radius * np.array([ct * cp, st * cp, sp], np.float64)
    # -z looks at origin
    z = center / np.linalg.norm(center)              # camera +z away from origin
    up = np.array([0.0, 0.0, 1.0])
    x = np.cross(up, z)
    x = x / (np.linalg.norm(x) + 1e-12)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, center
    return c2w.astype(np.float32)


def _density(pts: np.ndarray, amp: float = 8.0, r: float = 0.6) -> np.ndarray:
    return amp * np.exp(-np.sum(pts ** 2, -1) / (2 * r * r))


def _color(pts: np.ndarray) -> np.ndarray:
    # smooth position-dependent color in (0,1)
    return 0.5 + 0.4 * np.stack(
        [np.sin(2.0 * pts[..., 0]), np.sin(2.0 * pts[..., 1]),
         np.sin(2.0 * pts[..., 2])], -1)


def render_gt(H: int, W: int, K: np.ndarray, c2w: np.ndarray,
              near: float, far: float, n_samples: int = 128) -> np.ndarray:
    """Analytically volume-render the blob for one camera. [H, W, 3]."""
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    dirs = np.stack([(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1],
                     -np.ones_like(i)], -1)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)

    t = np.linspace(near, far, n_samples, dtype=np.float32)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * t[:, None]
    sigma = _density(pts)
    rgb = _color(pts)

    dists = np.diff(t)
    dists = np.concatenate([dists, [1e10]]).astype(np.float32)
    dists = dists * np.linalg.norm(rays_d, axis=-1, keepdims=True)
    alpha = 1.0 - np.exp(-sigma * dists)
    trans = np.cumprod(np.concatenate(
        [np.ones_like(alpha[..., :1]), 1 - alpha + 1e-10], -1), -1)[..., :-1]
    w = alpha * trans
    img = (w[..., None] * rgb).sum(-2)
    acc = w.sum(-1, keepdims=True)
    return (img + (1.0 - acc)).astype(np.float32)      # white background


def make_synth_scene(n_views: int = 8, H: int = 32, W: int = 32,
                     radius: float = 4.0, near: float = 2.0, far: float = 6.0
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (images [N,H,W,3], K [3,3], poses [N,4,4])."""
    focal = 0.9 * W
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]],
                 np.float32)
    thetas = np.linspace(0, 2 * np.pi, n_views, endpoint=False)
    poses = np.stack([orbit_pose(t, 0.35, radius) for t in thetas])
    imgs = np.stack([render_gt(H, W, K, p, near, far) for p in poses])
    return imgs, K, poses


def save_as_blender_dataset(root: str, n_train: int = 4, n_val: int = 1,
                            n_test: int = 2, H: int = 16, W: int = 16,
                            radius: float = 4.0) -> None:
    """Write the synthetic scene to disk in the blender transforms_*.json
    format so the full CLI pipeline (loader included) can run on it."""
    import json
    import os

    import imageio.v2 as imageio

    n = n_train + n_val + n_test
    imgs, K, poses = make_synth_scene(n_views=n, H=H, W=W, radius=radius)
    focal = float(K[0, 0])
    camera_angle_x = 2.0 * float(np.arctan(W / (2.0 * focal)))
    # interleave the splits around the orbit so held-out views sit between
    # training views (consecutive assignment would cluster all test views
    # in an unobserved arc and measure extrapolation, not reconstruction)
    order = np.random.default_rng(0).permutation(n)
    splits = (("train", order[:n_train]),
              ("val", order[n_train:n_train + n_val]),
              ("test", order[n_train + n_val:]))
    for split, view_ids in splits:
        os.makedirs(os.path.join(root, split), exist_ok=True)
        frames = []
        for j, i in enumerate(view_ids):
            rel = f"{split}/r_{j}"
            rgba = np.concatenate(
                [imgs[i], np.ones_like(imgs[i][..., :1])], -1)
            imageio.imwrite(os.path.join(root, rel + ".png"),
                            (rgba * 255).astype(np.uint8))
            frames.append({"file_path": rel,
                           "transform_matrix": poses[i].tolist()})
        meta = {"camera_angle_x": camera_angle_x, "frames": frames}
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
