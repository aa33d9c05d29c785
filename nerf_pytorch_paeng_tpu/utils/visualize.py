"""Camera-pose / ray visualisation (debugging aid).

Capability parity target: reference methods/visualize.py:31-180 — a 3D
matplotlib scatter of camera centers with orientation axes, and the
ray-augmented variant that scatters z-sampled points along each camera's
center-pixel ray (reference visualize.py:113-136 + make_z_vals:16-29),
saved under logs/<exp>/_ext_vis/.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def center_ray_points(pose: np.ndarray, K: np.ndarray, hw, near: float,
                      far: float, n_z: int = 120,
                      rng: Optional[np.random.Generator] = None
                      ) -> np.ndarray:
    """z-sampled points along a camera's center-pixel ray, [n_z, 3].

    Mirrors the reference's make_z_vals (methods/visualize.py:16-29):
    linspace(near, far) jittered uniformly per bin, pushed through the
    center pixel's world-space direction.
    """
    pose = np.asarray(pose, np.float64)
    K = np.asarray(K, np.float64)
    h, w = hw
    # pinhole dir of pixel (h/2, w/2), rotated to world (ops/rays.get_rays)
    d_cam = np.array([(w // 2 - K[0, 2]) / K[0, 0],
                      -(h // 2 - K[1, 2]) / K[1, 1], -1.0])
    d = pose[:3, :3] @ d_cam
    o = pose[:3, 3]
    t = np.linspace(0.0, 1.0, n_z)
    z = near * (1.0 - t) + far * t
    mids = 0.5 * (z[1:] + z[:-1])
    upper = np.concatenate([mids, z[-1:]])
    lower = np.concatenate([z[:1], mids])
    u = (rng or np.random.default_rng(0)).uniform(size=n_z)
    z = lower + (upper - lower) * u
    return o[None, :] + d[None, :] * z[:, None]


def visualize_extrinsics(poses: np.ndarray, out_dir: str,
                         idx_list: Optional[Sequence[int]] = None,
                         name: str = "extrinsics",
                         axis_len: float = 0.5,
                         K: Optional[np.ndarray] = None,
                         hw=None, near: float = 2.0, far: float = 6.0,
                         n_z: int = 120) -> str:
    """Save a 3D plot of camera centers + viewing axes. Returns the path.

    With ``K`` and ``hw`` given, additionally scatters ``n_z`` z-sampled
    points along every camera's center-pixel ray — the reference's `_R_t`
    extrinsic plot (methods/visualize.py:113-136)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    poses = np.asarray(poses)
    if idx_list is not None:
        poses = poses[np.asarray(idx_list)]
    os.makedirs(out_dir, exist_ok=True)

    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(111, projection="3d")
    centers = poses[:, :3, 3]
    ax.scatter(centers[:, 0], centers[:, 1], centers[:, 2],
               c="k", s=12, label="cameras")
    for p in poses:
        c = p[:3, 3]
        for axis, color in ((0, "r"), (1, "g"), (2, "b")):
            v = p[:3, axis] * axis_len
            ax.plot([c[0], c[0] + v[0]], [c[1], c[1] + v[1]],
                    [c[2], c[2] + v[2]], color=color, linewidth=0.8)
    if K is not None and hw is not None:
        rng = np.random.default_rng(0)
        for p in poses:
            pts = center_ray_points(p, K, hw, near, far, n_z, rng)
            ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], marker="o",
                       s=0.1, color="#FF0066")
    ax.scatter([0], [0], [0], c="orange", s=40, marker="*", label="origin")
    ax.set_xlabel("x"); ax.set_ylabel("y"); ax.set_zlabel("z")
    ax.legend(loc="upper right")
    path = os.path.join(out_dir, f"{name}.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def visualize_rays(rays_o: np.ndarray, rays_d: np.ndarray, out_path: str,
                   t_far: float = 4.0, max_rays: int = 64) -> str:
    """Save a 3D plot of sampled rays as segments (debugging)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    o = np.asarray(rays_o).reshape(-1, 3)[:max_rays]
    d = np.asarray(rays_d).reshape(-1, 3)[:max_rays]
    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(111, projection="3d")
    for oo, dd in zip(o, d):
        e = oo + dd * t_far
        ax.plot([oo[0], e[0]], [oo[1], e[1]], [oo[2], e[2]],
                linewidth=0.5, color="steelblue")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path
