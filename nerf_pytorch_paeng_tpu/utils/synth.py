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


def _density(pts: np.ndarray, amp: float = 8.0, r: float = 0.6,
             cutoff: float = 1.8) -> np.ndarray:
    """Compactly-supported Gaussian blob (continuous at the cutoff).

    Truncation matters: with the renderer's 1e10 last-sample distance (the
    NeRF convention, nerf_process.py:95), ANY nonzero tail density makes
    every ray fully opaque at the far plane (alpha_last = 1-exp(-σ·1e10) = 1
    even for σ=1e-9) — the scene would have no empty space at all and its
    'background' would be a ghost far-surface of tail colors."""
    d2 = np.sum(pts ** 2, -1) / (2 * r * r)
    floor = np.exp(-(cutoff * cutoff) / (2 * r * r))
    return amp * np.maximum(np.exp(-d2) - floor, 0.0)


def _color(pts: np.ndarray, freq: float = 2.0,
           phase: Tuple[float, float, float] = (0.0, 0.0, 0.0)
           ) -> np.ndarray:
    # smooth position-dependent color in (0,1)
    return 0.5 + 0.4 * np.stack(
        [np.sin(freq * pts[..., 0] + phase[0]),
         np.sin(freq * pts[..., 1] + phase[1]),
         np.sin(freq * pts[..., 2] + phase[2])], -1)


def render_gt(H: int, W: int, K: np.ndarray, c2w: np.ndarray,
              near: float, far: float, n_samples: int = 128,
              amp: float = 8.0, blob: dict | None = None) -> np.ndarray:
    """Analytically volume-render the blob for one camera. [H, W, 3].

    ``amp`` is the blob's peak density: 8.0 is the soft default scene;
    large values (e.g. 60) give a hard, surface-like opacity front the
    way real 200k-iter photometric training does — used by the sample-
    truncation tests, whose mechanism only engages when per-ray
    transmittance actually collapses.

    ``blob`` optionally overrides the scene content — keys ``amp``, ``r``,
    ``cutoff`` (density shape) and ``color_freq``, ``color_phase`` — so
    the 16-config benchmark sweep gets a *distinct* stand-in scene per
    config (tools/run_sweep.py) while every default stays bit-identical
    to the round-3 scenes."""
    blob = blob or {}
    amp = blob.get("amp", amp)
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    dirs = np.stack([(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1],
                     -np.ones_like(i)], -1)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)

    t = np.linspace(near, far, n_samples, dtype=np.float32)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * t[:, None]
    sigma = _density(pts, amp=amp, r=blob.get("r", 0.6),
                     cutoff=blob.get("cutoff", 1.8))
    rgb = _color(pts, freq=blob.get("color_freq", 2.0),
                 phase=blob.get("color_phase", (0.0, 0.0, 0.0)))

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
                     radius: float = 4.0, near: float = 2.0, far: float = 6.0,
                     blob: dict | None = None
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (images [N,H,W,3], K [3,3], poses [N,4,4])."""
    focal = 0.9 * W
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]],
                 np.float32)
    thetas = np.linspace(0, 2 * np.pi, n_views, endpoint=False)
    poses = np.stack([orbit_pose(t, 0.35, radius) for t in thetas])
    imgs = np.stack([render_gt(H, W, K, p, near, far, blob=blob)
                     for p in poses])
    return imgs, K, poses


def fit_field_to_blob(model, params, key, n_steps: int = 400,
                      n_pts: int = 8192, lr: float = 2e-3,
                      L_x: int = 10, L_d: int = 4,
                      blob_r: float = 0.6, blob_cutoff: float = 1.8,
                      blob_amp: float = 8.0, blob_hard_w: float = 0.0,
                      uniform_frac: float = 0.0,
                      uniform_halfside: float = 6.0):
    """Distill the analytic blob field directly into both MLPs.

    Photometric training on the white-background blob is ambiguous at small
    scale — "white fog everywhere" (acc≈1) reproduces the white background
    exactly, so quick-trained models never develop empty space (real
    multi-view 200k-iter runs do carve it out).  For tests/benchmarks that
    need a *trained model with genuine empties* (occupancy culling), we
    instead regress each MLP's raw outputs to the analytic field at points
    sampled along orbit-camera rays (exactly where rendering will look):
    the raw density logit to sigma where occupied and below a hinge
    margin where empty (see sigma_loss), the raw color logits to
    logit(color).  Returns (fitted params, final loss).

    ``uniform_frac > 0`` additionally draws that share of extra points
    uniformly in the cube [-uniform_halfside, +uniform_halfside]^3 (the
    default matches the pre-cull estimation cube, half = far = 6 for the
    standard near/far — eval/frame._precull_half): with
    ray-only sampling the MLP extrapolates arbitrary positive density
    into never-sampled regions (cube corners, poles), unlike a
    well-trained multi-view model whose empty space is carved wherever
    any training ray looks.  Callers that need a globally-compact fitted
    support — the pre-cull bounds of ops/occupancy.py measure it — opt
    in (bench.py, tests/test_precull.py); at small step budgets the extra
    hinge objective slightly softens the blob fit, so it stays off by
    default for the cheap test fixtures.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.nerf import NeRF
    from ..ops.posenc import positional_encoding

    tx = optax.adam(lr)
    opt = tx.init(params)
    near, far, radius, phi, focal_frac = 2.0, 6.0, 4.0, 0.35, 0.9

    def field_gt(pts):
        # same truncated-blob form as _density (its docstring explains why
        # compact support matters under the 1e10 last-sample distance);
        # blob_r/blob_cutoff control how much of the frame the object
        # covers (benchmarks pick a lego-like ~30% occupancy)
        d2 = jnp.sum(pts ** 2, -1) / (2 * blob_r * blob_r)
        floor = jnp.exp(-jnp.asarray(
            (blob_cutoff * blob_cutoff) / (2 * blob_r * blob_r)))
        if blob_hard_w > 0:
            # SURFACE-like front: full amplitude inside radius blob_cutoff
            # with a linear ramp of width blob_hard_w (same silhouette as
            # the gaussian).  The gaussian blob — even at large amp — ramps
            # density over many sample bins off-center, so per-ray
            # transmittance collapses slowly; real 200k-iter photometric
            # training carves step-like fronts, and the sample-truncation
            # machinery (eval/frame.py) only pays on those.
            r = jnp.sqrt(jnp.sum(pts ** 2, -1))
            sig = blob_amp * jnp.clip((blob_cutoff - r) / blob_hard_w,
                                      0.0, 1.0)
        else:
            sig = blob_amp * jnp.maximum(jnp.exp(-d2) - floor, 0.0)
        col = 0.5 + 0.4 * jnp.stack(
            [jnp.sin(2.0 * pts[..., 0]), jnp.sin(2.0 * pts[..., 1]),
             jnp.sin(2.0 * pts[..., 2])], -1)
        raw_col = jnp.log(col) - jnp.log1p(-col)          # logit
        return sig, raw_col

    def make_sigma_loss(margin: float, lin_w: float):
        def sigma_loss(raw, sig_gt):
            """MSE where occupied; a hinge (raw <= -margin) where empty.
            The hinge makes relu(raw) *exactly* 0 in empty space despite
            fit error — essential because the 1e10 last-sample distance
            turns any eps>0 density at the far plane into full opacity
            (real photometric training co-adapts sigma and color there;
            distillation must instead guarantee hard zeros).  The occupied
            MSE is scaled relative to the blob amplitude so the returned
            loss (and callers' fit-quality thresholds) is amplitude-
            invariant.

            The main fit uses the soft squared hinge at margin 0.2 (a
            deeper/linear hinge sharpens the silhouette ring and degrades
            the coarse/fine agreement the tau-cull guard relies on); the
            polish phase uses margin 0.5 with a linear term — the squared
            term's gradient vanishes near the margin, which would leave
            isolated straggler bumps slightly positive, and the support
            grid reads any raw > 0 as occupied."""
            occ = sig_gt > 0
            rel = 8.0 / blob_amp
            viol = jax.nn.relu(raw + margin)
            # per-point (the polish phase masks before reducing)
            return jnp.where(occ, (rel * (raw - sig_gt)) ** 2,
                             viol ** 2 + lin_w * viol)

        return sigma_loss

    def orbit_ray_points(key):
        """Sample training points exactly where rendering will look: along
        rays of random orbit cameras (same orbit as make_synth_scene)."""
        kt, ku, kv, kz = jax.random.split(key, 4)
        theta = jax.random.uniform(kt, (n_pts,), jnp.float32, 0, 2 * jnp.pi)
        st, ct = jnp.sin(theta), jnp.cos(theta)
        sp, cp = jnp.sin(phi), jnp.cos(phi)
        center = radius * jnp.stack([ct * cp, st * cp,
                                     jnp.full_like(ct, sp)], -1)   # [P, 3]
        z = center / jnp.linalg.norm(center, axis=-1, keepdims=True)
        up = jnp.array([0.0, 0.0, 1.0])
        x = jnp.cross(jnp.broadcast_to(up, z.shape), z)
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        y = jnp.cross(z, x)
        # pixel dirs across the full frustum (focal = focal_frac * W)
        u = jax.random.uniform(ku, (n_pts,), jnp.float32, -0.5, 0.5)
        v = jax.random.uniform(kv, (n_pts,), jnp.float32, -0.5, 0.5)
        d = (x * (u / focal_frac)[:, None] + y * (-v / focal_frac)[:, None]
             - z)
        t = jax.random.uniform(kz, (n_pts,), jnp.float32, near, far)
        if uniform_frac > 0:
            # globally-compact mode: blur the view cone (direction noise,
            # amplified by t) so the ray-point budget also hinges the
            # off-frustum volume — uniform points alone visit each
            # support-grid cell of the estimation cube less than once
            # over a whole fit, which leaves smooth junk bumps between
            # them and invalidates the pre-cull bounds (the support grid
            # probes 128^3 cells; measured in round 3)
            d = d + 0.35 * jax.random.normal(
                jax.random.fold_in(kz, 2), d.shape, jnp.float32)
        pts = center + t[:, None] * d
        dirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        if uniform_frac > 0:
            n_uni = max(2, int(n_pts * uniform_frac))
            ku2, kd2 = jax.random.split(jax.random.fold_in(kz, 1))
            # two-cube mixture: half the points in an inner cube around
            # the ray-sampled region (dense pressure where junk density
            # costs render quality), half over the full estimation cube
            # (sparse pressure so the pre-cull support grid sees a clean
            # outer shell; the MLP's extrapolated junk is smooth, so
            # sparse coverage suffices)
            k_in, k_out = jax.random.split(ku2)
            inner = min(3.2, uniform_halfside)
            n_in = n_uni // 2
            upts = jnp.concatenate([
                jax.random.uniform(k_in, (n_in, 3), jnp.float32,
                                   -inner, inner),
                jax.random.uniform(k_out, (n_uni - n_in, 3), jnp.float32,
                                   -uniform_halfside, uniform_halfside),
            ], 0)
            udir = jax.random.normal(kd2, (n_uni, 3), jnp.float32)
            udir = udir / (jnp.linalg.norm(udir, axis=-1, keepdims=True)
                           + 1e-9)
            pts = jnp.concatenate([pts, upts], 0)
            dirs = jnp.concatenate([dirs, udir], 0)
        return pts, dirs

    def polish_points(key_i):
        """Dense full-cube sweep batch for the final polish phase: mostly
        uniform over the whole estimation cube (hinge pressure every
        support-grid region), with a blob-ball share so the occupied
        regression stays anchored while the trunk weights move."""
        kb, ko = jax.random.split(key_i)
        n_swp = 4 * n_pts
        n_blob = n_swp // 4
        bpts = jax.random.normal(kb, (n_blob, 3), jnp.float32) * (
            0.6 * blob_cutoff)
        upts = jax.random.uniform(ko, (n_swp - n_blob, 3), jnp.float32,
                                  -uniform_halfside, uniform_halfside)
        pts = jnp.concatenate([bpts, upts], 0)
        dirs = pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1e-9)
        return pts, dirs

    def make_step(pts_fn, sigma_loss, polish: bool = False):
        def step(carry, i):
            params, opt = carry
            pts, dirs = pts_fn(jax.random.fold_in(key, i))
            sig_gt, raw_col = field_gt(pts)
            emb = jnp.concatenate([positional_encoding(pts, L_x),
                                   positional_encoding(dirs, L_d)], -1)
            if polish:
                # the polish phase must not retouch the silhouette band:
                # its deep hinge right outside the cutoff ring sharpens
                # the density front, growing the coarse/fine disagreement
                # the tau-cull guard (<0.05 dB) depends on.  Only the far
                # field (where the junk stragglers live) gets swept.
                r = jnp.sqrt(jnp.sum(pts ** 2, -1))
                far_field = r > blob_cutoff + 0.6
            else:
                far_field = None

            def loss_fn(p):
                tot = 0.0
                occ = (sig_gt > 0)[:, None]
                for method in (NeRF.coarse_fwd, NeRF.fine_fwd):
                    raw = model.apply({"params": p}, emb, method=method)
                    ce = (raw[:, :3] - raw_col) ** 2
                    sl = sigma_loss(raw[:, 3], sig_gt)
                    if polish:
                        # color supervision only where occupied, sigma
                        # pressure only in the far field — regressing the
                        # whole empty cube drags the shared trunk and
                        # spawns NEW sigma junk faster than it sweeps
                        ce = jnp.where(occ, ce, 0.0)
                        sl = jnp.where(occ[:, 0] | far_field, sl, 0.0)
                    tot = tot + jnp.mean(sl) + jnp.mean(ce)
                return tot

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt, params)
            return (optax.apply_updates(params, updates), opt), loss

        return step

    # one compiled program for the whole fit: per-step host dispatch costs
    # ~ms-to-seconds through the remote-TPU tunnel, a scan costs nothing.
    # In globally-compact mode the main fit ends with a polish phase of
    # dense full-cube hinge sweeps: stragglers that re-grew between rare
    # visits during the main fit get swept, and nothing trains after, so
    # the support grid reads a clean shell (measured necessary at the
    # production 128^3 grid).
    @jax.jit
    def run(params, opt):
        carry, losses = jax.lax.scan(
            make_step(orbit_ray_points, make_sigma_loss(0.2, 0.0)),
            (params, opt), jnp.arange(n_steps))
        if uniform_frac > 0:
            n_pol = max(n_steps // 8, 40)
            carry, _ = jax.lax.scan(
                make_step(polish_points, make_sigma_loss(0.5, 0.5),
                          polish=True), carry,
                n_steps + 7919 + jnp.arange(n_pol))
        return carry[0], losses[-1]

    params, loss = run(params, opt)
    return params, float(loss)


def make_forward_scene(n_views: int = 20, H: int = 378, W: int = 504,
                       dist: float = 4.0, spread: float = 0.6,
                       n_samples: int = 256, blob: dict | None = None
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                  np.ndarray]:
    """Forward-facing capture of the blob (the LLFF geometry): cameras on
    a jittered plane at ``z ~ dist``, all looking at the origin (mild
    toe-in, like a handheld LLFF capture).  Returns
    (images [N,H,W,3], K [3,3], poses [N,4,4] standard c2w, bounds [N,2]
    per-view [near, far] content depth — what COLMAP's depth percentiles
    provide for real scenes, reference dataset/colmap/pose_utils.py).
    """
    focal = 0.9 * W
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]],
                 np.float32)
    rng = np.random.default_rng(11)
    cutoff = (blob or {}).get("cutoff", 1.8)    # blob support (see _density)
    poses, imgs, bounds = [], [], []
    for i in range(n_views):
        center = np.array([rng.uniform(-spread, spread),
                           rng.uniform(-spread, spread),
                           dist + rng.uniform(-0.15, 0.15)])
        z = center / np.linalg.norm(center)          # back axis (look at 0)
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, center
        d = float(np.linalg.norm(center))
        nf = (max(d - cutoff - 0.2, 0.5), d + cutoff + 0.2)
        imgs.append(render_gt(H, W, K, c2w, nf[0], nf[1],
                              n_samples=n_samples, blob=blob))
        poses.append(c2w)
        bounds.append(nf)
    return (np.stack(imgs), K, np.stack(poses),
            np.asarray(bounds, np.float32))


def save_as_llff_dataset(root: str, n_views: int = 20, H: int = 378,
                         W: int = 504, n_samples: int = 256,
                         blob: dict | None = None) -> None:
    """Write the forward-facing synthetic scene to disk in the LLFF layout
    (``images/`` + ``poses_bounds.npy``) so the full llff CLI pipeline —
    loader axis fix, recenter, bound rescale, NDC projection, spiral
    render path — runs on it (reference dataset/load_llff.py:272-353).

    poses_bounds rows: flattened 3x5 [down|right|back|t|hwf] matrix + the
    per-view [near, far] content depths, row i paired with the i-th image
    in sorted filename order (the COLMAP-bridge contract,
    data/colmap/poses.py)."""
    import os

    import imageio.v2 as imageio

    imgs, K, poses, bounds = make_forward_scene(
        n_views=n_views, H=H, W=W, n_samples=n_samples, blob=blob)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    rows = []
    for i in range(n_views):
        imageio.imwrite(os.path.join(root, "images", f"{i:03d}.png"),
                        (np.clip(imgs[i], 0, 1) * 255).astype(np.uint8))
        c2w = poses[i]
        # LLFF on-disk axis convention [down, right, back] (the loader
        # inverts this: data/llff.py axis fix)
        llff_pose = np.concatenate(
            [-c2w[:3, 1:2], c2w[:3, 0:1], c2w[:3, 2:4]], 1)
        hwf = np.array([H, W, float(K[0, 0])]).reshape(3, 1)
        rows.append(np.concatenate(
            [np.concatenate([llff_pose, hwf], 1).ravel(), bounds[i]], 0))
    np.save(os.path.join(root, "poses_bounds.npy"),
            np.asarray(rows, np.float64))


def save_as_blender_dataset(root: str, n_train: int = 4, n_val: int = 1,
                            n_test: int = 2, H: int = 16, W: int = 16,
                            radius: float = 4.0,
                            blob: dict | None = None) -> None:
    """Write the synthetic scene to disk in the blender transforms_*.json
    format so the full CLI pipeline (loader included) can run on it."""
    import json
    import os

    import imageio.v2 as imageio

    n = n_train + n_val + n_test
    imgs, K, poses = make_synth_scene(n_views=n, H=H, W=W, radius=radius,
                                      blob=blob)
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
