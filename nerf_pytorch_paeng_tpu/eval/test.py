"""Held-out-view evaluation ("test" in the reference's vocabulary).

Behavioral parity target: reference test.py:17-108 — render every test
pose full-frame, write per-view ``{i:03d}.png`` + ``{i:03d}_disp.png``
(disp normalised by its max), compute PSNR/SSIM/LPIPS, and write
``_result.txt`` with per-view lines plus best and mean summaries.
"""
from __future__ import annotations

import os
from typing import Optional

import imageio.v2 as imageio
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.metrics import to8b
from .frame import get_frame_renderer
from .metrics import compute_lpips, compute_ssim, load_lpips_params
from .pipeline import pipelined_frames


def run_test(idx: int, model, params, test_imgs, test_poses, K, hw, cfg,
             mesh=None, save_dir: Optional[str] = None, verbose: bool = True):
    """Evaluate on the held-out split. Returns the per-view metrics dict.

    test_imgs: [T, H, W, 3] numpy; test_poses: [T, 3or4, 4].

    Metric-reporting evaluation always renders through the EXACT dense
    path (render_cull="none"), whatever the production default: the
    reference evaluation protocol is exact, and published PSNR must not
    depend on the cull's (guarded, but lossy) approximation.  Novel-view
    rendering (eval/render.py) keeps the production culled path.
    """
    import dataclasses

    H, W = hw
    if save_dir is None:
        save_dir = os.path.join(cfg.logdir, cfg.exp_name,
                                f"{cfg.exp_name}_{idx}", "test_result")
    os.makedirs(save_dir, exist_ok=True)

    render = get_frame_renderer(
        model, dataclasses.replace(cfg, render_cull="none"), H, W, K,
        mesh=mesh)
    lpips_params = load_lpips_params(cfg.lpips_weights)

    poses = np.asarray(test_poses)
    if len(poses) == 0:
        # empty held-out split (llff/custom holdout settings can yield
        # one): report cleanly instead of crashing on max()/mean() below
        with open(os.path.join(save_dir, "_result.txt"), "w") as f:
            f.write("no test views\n")
        return dict(mse=[], psnr=[], ssim=[], lpips=[],
                    mean_psnr=float("nan"), mean_ssim=float("nan"),
                    mean_lpips=float("nan"))

    # pipelined per-frame loop (eval/pipeline.py): frame i+1's device
    # programs are dispatched before frame i is fetched, metric-ed, and
    # PNG-encoded
    psnrs = [0.0] * len(poses)
    ssims = [0.0] * len(poses)
    lpipss = [0.0] * len(poses)
    losses = [0.0] * len(poses)
    key = jax.random.PRNGKey(cfg.seed + idx)

    def _render(i, pose):
        nonlocal key
        key, sub = jax.random.split(key)
        return render(params, jnp.asarray(pose[:3, :4]), sub)

    def _drain(i, out, submit):
        rgb_np = np.asarray(out[0])
        disp_np = np.asarray(out[1])
        submit(imageio.imwrite, os.path.join(save_dir, f"{i:03d}.png"),
               to8b(rgb_np))
        dmax = np.nanmax(disp_np)
        submit(imageio.imwrite, os.path.join(save_dir, f"{i:03d}_disp.png"),
               to8b(disp_np / dmax if dmax > 0 else disp_np))

        gt = np.asarray(test_imgs[i], np.float32)
        mse = float(np.mean((rgb_np - gt) ** 2))
        psnr = -10.0 * np.log10(mse)
        ssim = float(compute_ssim(jnp.asarray(rgb_np), jnp.asarray(gt)))
        lpips = compute_lpips(jnp.asarray(rgb_np), jnp.asarray(gt),
                              lpips_params)
        losses[i] = mse
        psnrs[i] = psnr
        ssims[i] = ssim
        lpipss[i] = lpips
        if verbose:
            print(f"test view {i}: mse={mse:.6f} psnr={psnr:.2f} "
                  f"ssim={ssim:.4f} lpips={lpips:.4f}")

    pipelined_frames(poses, _render, _drain)

    # _result.txt in the reference's format (test.py:92-108)
    with open(os.path.join(save_dir, "_result.txt"), "w") as f:
        for i in range(len(losses)):
            f.write(f"idx:{i}\tloss:{losses[i]}\tpsnr:{psnrs[i]}\t"
                    f"ssim:{ssims[i]}\tlpips:{lpipss[i]}\n")
        best = dict(psnr=max(psnrs), ssim=max(ssims),
                    lpips=min(lpipss) if not np.isnan(lpipss).all() else
                    float("nan"))
        f.write(f"\nBest Value ) PSNR : {best['psnr']}\tSSIM : "
                f"{best['ssim']}\tLPIPS : {best['lpips']}\n")
        f.write(f"Mean Value ) PSNR : {np.mean(psnrs)}\tSSIM : "
                f"{np.mean(ssims)}\tLPIPS : {np.mean(lpipss)}")

    return dict(mse=losses, psnr=psnrs, ssim=ssims, lpips=lpipss,
                mean_psnr=float(np.mean(psnrs)),
                mean_ssim=float(np.mean(ssims)),
                mean_lpips=float(np.mean(lpipss)))
