"""Novel-view rendering and video export.

Behavioral parity target: reference test.py:111-174 — orbit poses for
blender/custom (via the render-pose generator), the dataset spiral path
for llff, per-frame rgb/disp PNGs, and ``_rgb.{mp4|gif}`` /
``_disp.{mp4|gif}`` assembly (mp4 fps=30 quality=8, gif frame duration
0.04s).  ``single_angle != -1`` renders one still instead.

The frame loop is pipelined over device render and host PNG IO — see
eval/pipeline.py.
"""
from __future__ import annotations

import os
from typing import Optional

import imageio.v2 as imageio
import jax
import jax.numpy as jnp
import numpy as np

from ..data.render_pose import get_render_pose
from ..utils.metrics import to8b
from .frame import get_frame_renderer
from .pipeline import pipelined_frames


def run_render(idx: int, model, params, K, hw, cfg,
               render_poses: Optional[np.ndarray] = None, mesh=None,
               save_dir: Optional[str] = None, verbose: bool = True):
    """Render the novel-view path and export video. Returns frame stack."""
    H, W = hw
    if cfg.data_type in ("blender", "custom"):
        render_poses = get_render_pose(
            n_angle=cfg.n_angle, single_angle=cfg.single_angle,
            phi=cfg.phi, nf=cfg.nf)
    assert render_poses is not None, "llff render needs the dataset spiral"

    if save_dir is None:
        save_dir = os.path.join(cfg.logdir, cfg.exp_name,
                                f"{cfg.exp_name}_{idx}", "render_result")
    os.makedirs(save_dir, exist_ok=True)

    render = get_frame_renderer(model, cfg, H, W, K, mesh=mesh)
    key = jax.random.PRNGKey(cfg.seed + idx + 1)

    poses = np.asarray(render_poses)
    rgbs = [None] * len(poses)
    disps = [None] * len(poses)

    def _render(i, pose):
        nonlocal key
        key, sub = jax.random.split(key)
        return render(params, jnp.asarray(pose[:3, :4]), sub)

    def _drain(i, out, submit):
        """Fetch frame i (already computed on device) and queue its PNG
        encodes — runs while the NEXT frame renders."""
        rgb_np = np.asarray(out[0])
        disp_np = np.asarray(out[1])
        dmax = np.nanmax(disp_np)
        disp_norm = disp_np / dmax if dmax > 0 else disp_np
        rgbs[i] = rgb_np
        disps[i] = disp_norm
        if verbose:
            print(f"render view {i}/{len(poses)}")
        # single_angle stills are written TWICE (named + {i}_rgb.png) on
        # purpose: the reference does exactly that (test.py:160-163; its
        # unnamed copy is even written un-to8b'd — a float-image quirk we
        # do not reproduce).  Keep the duplicate for output-layout parity.
        if cfg.single_angle != -1:
            submit(imageio.imwrite,
                   os.path.join(save_dir,
                                f"{cfg.single_angle}_{cfg.phi}_{cfg.nf}_rgb.png"),
                   to8b(rgb_np))
        submit(imageio.imwrite, os.path.join(save_dir, f"{i}_rgb.png"),
               to8b(rgb_np))
        submit(imageio.imwrite, os.path.join(save_dir, f"{i}_disp.png"),
               to8b(disp_norm))

    pipelined_frames(poses, _render, _drain)

    rgbs = np.stack(rgbs, 0)
    disps = np.stack(disps, 0)

    if cfg.single_angle == -1:
        if cfg.render_type == "mp4":
            imageio.mimwrite(os.path.join(save_dir, "_rgb.mp4"), to8b(rgbs),
                             fps=30, quality=8)
            imageio.mimwrite(os.path.join(save_dir, "_disp.mp4"), to8b(disps),
                             fps=30, quality=8)
        else:
            imageio.mimwrite(os.path.join(save_dir, "_rgb.gif"), to8b(rgbs),
                             duration=0.04)
            imageio.mimwrite(os.path.join(save_dir, "_disp.gif"), to8b(disps),
                             duration=0.04)
    return rgbs, disps
