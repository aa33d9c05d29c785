"""Camera-pose / ray visualisation (debugging aid).

Capability parity target: reference methods/visualize.py:31-180 — a 3D
matplotlib scatter of camera centers with orientation axes (and optional
center-pixel rays), saved under logs/<exp>/_ext_vis/.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def visualize_extrinsics(poses: np.ndarray, out_dir: str,
                         idx_list: Optional[Sequence[int]] = None,
                         name: str = "extrinsics",
                         axis_len: float = 0.5) -> str:
    """Save a 3D plot of camera centers + viewing axes. Returns the path."""
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
