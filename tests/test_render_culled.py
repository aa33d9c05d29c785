"""Occupancy-culled frame rendering: the exactness guard.

The culled path (eval/frame.py, cfg.render_cull == "auto") skips the fine
MLP for rays whose coarse occupancy is <= tau and composites them straight
to the white background.  These tests certify the guard criterion: on a
*trained* scene the culled render is within 0.05 dB of the exact dense
render — while actually culling a meaningful fraction of rays.

The trained model comes from utils/synth.fit_field_to_blob: direct field
distillation, because quick photometric training on a white background is
ambiguous ("white fog" acc≈1 reproduces white pixels exactly) and never
develops the empty space that real 200k-iter multi-view runs carve out.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf_pytorch_paeng_tpu.config import NerfConfig
from nerf_pytorch_paeng_tpu.eval.frame import make_frame_renderer
from nerf_pytorch_paeng_tpu.models import init_nerf
from nerf_pytorch_paeng_tpu.utils.synth import (fit_field_to_blob,
                                                make_synth_scene, render_gt)


def _cfg(**kw):
    base = dict(netDepth=4, netWidth=64, L_x=6, L_d=2,
                N_samples_c=16, N_samples_f=24, near=2.0, far=6.0,
                compute_dtype="float32", chunk_rays=256, perturb=0.0)
    base.update(kw)
    return NerfConfig(**base)


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


def test_culled_render_guard_on_trained_scene():
    """PSNR(culled) within 0.05 dB of PSNR(exact) vs ground truth, with a
    meaningful fraction of rays actually culled (the blob scene has empty
    background around the object).  Truncation is off here so surviving
    rays stay bit-identical to the dense render; the truncated path has
    its own guard below."""
    cfg = _cfg(render_trunc_eps=0.0)
    H = W = 24
    imgs, K, poses = make_synth_scene(n_views=1, H=H, W=W)
    model, params0 = init_nerf(cfg, jax.random.PRNGKey(0))
    params, fit_loss = fit_field_to_blob(model, params0, jax.random.PRNGKey(1),
                                         n_steps=500, n_pts=8192,
                                         L_x=cfg.L_x, L_d=cfg.L_d)
    assert fit_loss < 0.1, fit_loss

    cfg_exact = dataclasses.replace(cfg, render_cull="none")
    cfg_auto = dataclasses.replace(cfg, render_cull="auto")

    c2w = jnp.asarray(poses[0][:3, :4])
    key = jax.random.PRNGKey(9)
    render_exact = make_frame_renderer(model, cfg_exact, H, W, K,
                                       stratified=False)
    render_auto = make_frame_renderer(model, cfg_auto, H, W, K,
                                      stratified=False)
    rgb_e, disp_e = render_exact(params, c2w, key)
    rgb_a, disp_a = render_auto(params, c2w, key)

    gt = render_gt(H, W, K, np.asarray(poses[0]), 2.0, 6.0)
    psnr_exact = _psnr(rgb_e, gt)
    psnr_auto = _psnr(rgb_a, gt)
    assert psnr_exact > 22.0, psnr_exact   # fitted model must render the blob
    assert abs(psnr_exact - psnr_auto) < 0.05, (psnr_exact, psnr_auto)

    # the culled path must actually skip work: background rays with coarse
    # occupancy <= tau exist on this scene
    from nerf_pytorch_paeng_tpu.ops.rays import get_rays
    from nerf_pytorch_paeng_tpu.ops.render import make_xla_field_fns
    from nerf_pytorch_paeng_tpu.ops.sampling import stratified_z_vals
    from nerf_pytorch_paeng_tpu.ops.volume import weights_from_sigma
    ro, rd = get_rays(H, W, jnp.asarray(K, jnp.float32), c2w)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    z = stratified_z_vals(key, ro.shape[0], 2.0, 6.0, cfg.N_samples_c,
                          perturb=False)
    coarse_fn, _ = make_xla_field_fns(model, params, cfg)
    xp = (ro.T[:, :, None] + rd.T[:, :, None] * z[None]).reshape(3, -1)
    sigma = coarse_fn(xp, jnp.ones_like(xp))[3].reshape(-1, cfg.N_samples_c)
    acc = np.asarray(jnp.sum(weights_from_sigma(sigma, z, rd), -1))
    active = acc > cfg.render_cull_tau
    n_culled = int((~active).sum())
    assert n_culled > 0.05 * acc.size, n_culled

    # surviving rays are bit-identical to the dense render (deterministic
    # sampling); culled rays differ by at most tau on the coarse estimate
    # plus the coarse/fine residual disagreement of the fit (NOT bounded
    # by tau — hence the margin; the hard quality criterion is the 0.05 dB
    # guard above).  The block/8 cover granularity (round 3) padded fewer
    # borderline rays into fine blocks, exposing more genuinely-culled
    # rays to this check than in round 2.
    diff = np.abs(np.asarray(rgb_a) - np.asarray(rgb_e)).reshape(-1, 3)
    np.testing.assert_allclose(diff[active], 0.0, atol=1e-5)
    assert diff[~active].max() <= 20 * cfg.render_cull_tau


def test_truncated_render_guard_on_trained_scene():
    """Per-ray sample-window truncation (render_trunc_eps, the production
    default): within 0.05 dB of the same culled renderer with truncation
    OFF on a trained scene, while a meaningful fraction of surviving rays
    actually runs a truncated fine program.  The blob is HARD (amp=60, a
    surface-like opacity front the way real 200k-iter training carves) —
    truncation only engages when per-ray transmittance genuinely
    collapses, which the soft default blob never does."""
    cfg = _cfg()                       # render_trunc_eps defaults on
    H = W = 24
    _, K, poses = make_synth_scene(n_views=1, H=H, W=W)
    model, params0 = init_nerf(cfg, jax.random.PRNGKey(0))
    params, fit_loss = fit_field_to_blob(model, params0, jax.random.PRNGKey(1),
                                         n_steps=500, n_pts=8192,
                                         L_x=cfg.L_x, L_d=cfg.L_d,
                                         blob_amp=60.0)
    assert fit_loss < 0.1, fit_loss

    c2w = jnp.asarray(poses[0][:3, :4])
    key = jax.random.PRNGKey(9)
    render_exact = make_frame_renderer(
        model, dataclasses.replace(cfg, render_cull="none"), H, W, K,
        stratified=False)
    # isolate the truncation mechanism from the cull: same culled
    # renderer with truncation off vs on.  (The cull itself costs ~0.1 dB
    # on this scene — a DISTILLATION artifact: the separately-fitted
    # coarse/fine MLPs disagree at the hard silhouette where transmittance
    # is a step function; real photometric training co-trains both on the
    # same pixels.  The cull's own 0.05 dB guard lives on the soft scene
    # above.)
    render_cull = make_frame_renderer(
        model, dataclasses.replace(cfg, render_cull="auto",
                                   render_trunc_eps=0.0), H, W, K,
        stratified=False)
    render_trunc = make_frame_renderer(
        model, dataclasses.replace(cfg, render_cull="auto"), H, W, K,
        stratified=False)
    rgb_e, _ = render_exact(params, c2w, key)
    rgb_c, _ = render_cull(params, c2w, key)
    rgb_t, _ = render_trunc(params, c2w, key)

    gt = render_gt(H, W, K, np.asarray(poses[0]), 2.0, 6.0, amp=60.0)
    psnr_exact = _psnr(rgb_e, gt)
    psnr_cull = _psnr(rgb_c, gt)
    psnr_trunc = _psnr(rgb_t, gt)
    assert psnr_exact > 22.0, psnr_exact
    assert abs(psnr_cull - psnr_trunc) < 0.05, (psnr_cull, psnr_trunc)
    assert abs(psnr_exact - psnr_trunc) < 0.3, (psnr_exact, psnr_trunc)

    # recompute per-ray sample-window requirements through the shared
    # oracle (tests/trunc_oracle.py — also asserts the windows' mass
    # contract on every ray): a meaningful fraction of ACTIVE rays must
    # fit the smallest truncated class, so truncated programs genuinely
    # ran
    from nerf_pytorch_paeng_tpu.eval.frame import _trunc_classes
    from nerf_pytorch_paeng_tpu.ops.rays import get_rays
    from nerf_pytorch_paeng_tpu.ops.render import make_xla_field_fns
    from nerf_pytorch_paeng_tpu.ops.sampling import stratified_z_vals
    from nerf_pytorch_paeng_tpu.ops.volume import weights_from_sigma
    from trunc_oracle import sample_requirements
    ro, rd = get_rays(H, W, jnp.asarray(K, jnp.float32), c2w)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    z = stratified_z_vals(key, ro.shape[0], 2.0, 6.0, cfg.N_samples_c,
                          perturb=False)
    coarse_fn, _ = make_xla_field_fns(model, params, cfg)
    xp = (ro.T[:, :, None] + rd.T[:, :, None] * z[None]).reshape(3, -1)
    sigma = coarse_fn(xp, jnp.ones_like(xp))[3].reshape(-1, cfg.N_samples_c)
    w = np.asarray(weights_from_sigma(sigma, z, rd))
    acc = w.sum(-1)
    active = acc > cfg.render_cull_tau
    s_req = sample_requirements(w, cfg.N_samples_f, cfg.render_trunc_eps)
    classes = _trunc_classes(cfg.N_samples_c + cfg.N_samples_f,
                             cfg.N_samples_f, cfg.render_trunc_eps)
    assert len(classes) > 1, classes
    frac_trunc = float((s_req[active] <= classes[0]).mean())
    assert frac_trunc > 0.2, (frac_trunc, classes)


def test_culled_render_untrained_and_nondivisible_frame():
    """Untrained model, frame size not a multiple of the block: shapes,
    finiteness, and value sanity."""
    cfg = _cfg(chunk_rays=64, render_cull="auto")
    H, W = 9, 13                      # 117 rays -> padding exercised
    K = np.array([[10.0, 0, W / 2], [0, 10.0, H / 2], [0, 0, 1]])
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))
    c2w = jnp.asarray(np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.0]]),
                      jnp.float32)
    render = make_frame_renderer(model, cfg, H, W, K)
    rgb, disp = render(params, c2w, jax.random.PRNGKey(1))
    assert rgb.shape == (H, W, 3) and disp.shape == (H, W)
    assert np.isfinite(np.asarray(rgb)).all()
    assert np.isfinite(np.asarray(disp)).all()


def test_culled_render_matches_on_mesh():
    """The culled renderer under an 8-device mesh equals the single-device
    culled render (deterministic sampling)."""
    from nerf_pytorch_paeng_tpu.parallel import make_mesh
    cfg = _cfg(netDepth=2, netWidth=32, L_x=4, L_d=2, N_samples_c=8,
               N_samples_f=8, chunk_rays=32, render_cull="auto",
               render_cull_tau=0.5)     # high tau: forces real culling even
    #                                     on an untrained model
    H = W = 8
    imgs, K, poses = make_synth_scene(n_views=1, H=H, W=W)
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))
    c2w = jnp.asarray(poses[0][:3, :4])
    key = jax.random.PRNGKey(1)
    single = make_frame_renderer(model, cfg, H, W, K, stratified=False)
    rgb1, disp1 = single(params, c2w, key)
    mesh = make_mesh(8, 1)
    sharded = make_frame_renderer(model, cfg, H, W, K, mesh=mesh,
                                  stratified=False)
    rgb8, disp8 = sharded(params, c2w, key)
    np.testing.assert_allclose(np.asarray(rgb8), np.asarray(rgb1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(disp8), np.asarray(disp1),
                               rtol=1e-4, atol=1e-4)
