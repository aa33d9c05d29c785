"""CPU (interpret-mode) regression tests for the PRODUCTION TPU eval path:
the ray-major kernel branches of eval/frame.py (`_use_rays_kernels` ->
fused_mlp_sigma_rays / fused_mlp_eval_rays).

On real TPU hardware the default eval config (8x256, 64+128) routes
through these branches, so they must be exercised by the suite, not only
by manual TPU runs (round-2 VERDICT items 2/"Missing 3").  The configs
here keep the full 8x256 reference architecture (the rays kernels only
exist for it) with 8+8 samples and small frames so interpret mode stays
cheap.  Reference equivalent: the whole eval hot loop, test.py:36-47.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_pytorch_paeng_tpu.config import NerfConfig
from nerf_pytorch_paeng_tpu.eval.frame import (_use_rays_kernels,
                                               make_frame_renderer)
from nerf_pytorch_paeng_tpu.models import init_nerf
from nerf_pytorch_paeng_tpu.utils.synth import (fit_field_to_blob,
                                                make_synth_scene, render_gt)


def _cfg(**kw):
    # full reference architecture; 8+8 samples pass the rays-kernel %8 gate
    base = dict(netDepth=8, netWidth=256, L_x=10, L_d=4,
                N_samples_c=8, N_samples_f=8, near=2.0, far=6.0,
                perturb=0.0, use_pallas=True)
    base.update(kw)
    return NerfConfig(**base)


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


@pytest.fixture(scope="module")
def trained_full_width():
    """A fitted full-width (8x256) model with genuine empty space."""
    cfg = _cfg()
    model, params0 = init_nerf(cfg, jax.random.PRNGKey(0))
    params, fit_loss = fit_field_to_blob(
        model, params0, jax.random.PRNGKey(1), n_steps=150, n_pts=2048)
    assert fit_loss < 0.1, fit_loss
    return cfg, model, params


def test_rays_gate_is_open():
    assert _use_rays_kernels(_cfg())
    # and the gates the small-sample sharded tests rely on stay closed
    assert not _use_rays_kernels(_cfg(N_samples_c=4, N_samples_f=4))
    assert not _use_rays_kernels(_cfg(use_pallas=False))


def test_dense_rays_branch_matches_xla(trained_full_width):
    """frame.py's dense use_rays branch == the XLA fallback on the same
    frame (deterministic sampling; bf16 kernel outputs -> loose atol)."""
    cfg, model, params = trained_full_width
    H = W = 8
    _, K, poses = make_synth_scene(n_views=1, H=H, W=W)
    c2w = jnp.asarray(poses[0][:3, :4])
    key = jax.random.PRNGKey(3)

    cfg_rays = dataclasses.replace(cfg, render_cull="none")
    assert _use_rays_kernels(cfg_rays)
    cfg_xla = dataclasses.replace(cfg, render_cull="none", use_pallas=False,
                                  compute_dtype="float32")

    r_rays = make_frame_renderer(model, cfg_rays, H, W, K, stratified=False)
    r_xla = make_frame_renderer(model, cfg_xla, H, W, K, stratified=False)
    rgb_r, disp_r = r_rays(params, c2w, key)
    rgb_x, disp_x = r_xla(params, c2w, key)
    np.testing.assert_allclose(np.asarray(rgb_r), np.asarray(rgb_x),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(disp_r), np.asarray(disp_x),
                               atol=5e-2)


def test_culled_rays_branch_guard(trained_full_width):
    """The culled renderer's use_rays branches (phase-1 sigma kernel,
    phase-2 fine kernel): < 0.05 dB vs the exact rays-path render on the
    trained scene, with a real fraction of rays culled."""
    cfg, model, params = trained_full_width
    H = W = 16
    _, K, poses = make_synth_scene(n_views=1, H=H, W=W)
    c2w = jnp.asarray(poses[0][:3, :4])
    key = jax.random.PRNGKey(5)

    cfg_exact = dataclasses.replace(cfg, render_cull="none")
    cfg_auto = dataclasses.replace(cfg, render_cull="auto")
    assert _use_rays_kernels(cfg_auto)
    render_exact = make_frame_renderer(model, cfg_exact, H, W, K,
                                       stratified=False)
    render_auto = make_frame_renderer(model, cfg_auto, H, W, K,
                                      stratified=False)
    rgb_e, _ = render_exact(params, c2w, key)
    rgb_a, _ = render_auto(params, c2w, key)

    gt = render_gt(H, W, K, np.asarray(poses[0]), 2.0, 6.0)
    psnr_exact = _psnr(rgb_e, gt)
    psnr_auto = _psnr(rgb_a, gt)
    assert psnr_exact > 20.0, psnr_exact
    assert abs(psnr_exact - psnr_auto) < 0.05, (psnr_exact, psnr_auto)

    # the cull must have skipped real work on this scene: count coarse
    # occupancies under tau via the XLA oracle
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
    n_culled = int((acc <= cfg.render_cull_tau).sum())
    assert n_culled > 0.05 * acc.size, n_culled


@pytest.fixture(scope="module")
def trained_full_width_hard():
    """A fitted full-width model with a HARD (surface-like) opacity front
    — sample truncation only engages when transmittance collapses, which
    the soft default blob never does (real 200k-iter photometric training
    carves hard surfaces; amp=60 is the synthetic stand-in)."""
    cfg = _cfg()
    model, params0 = init_nerf(cfg, jax.random.PRNGKey(0))
    params, fit_loss = fit_field_to_blob(
        model, params0, jax.random.PRNGKey(1), n_steps=200, n_pts=2048,
        blob_amp=60.0)
    assert fit_loss < 0.1, fit_loss
    return cfg, model, params


def test_truncated_rays_branch_guard(trained_full_width_hard):
    """Per-ray sample-window truncation through the ray-major kernels:
    16+24 samples give truncated classes [32, 40], and chunk_rays=32 makes
    the cover fine-grained enough that early (cheap) blocks run the
    truncated fine kernel at a sample count (32) no other path compiles.
    Guard: < 0.05 dB vs the same culled renderer with truncation off
    (isolating the truncation mechanism from the cull's own silhouette
    error on distilled hard scenes — see test_render_culled.py)."""
    cfg, model, params = trained_full_width_hard
    cfg = dataclasses.replace(cfg, N_samples_c=16, N_samples_f=24,
                              chunk_rays=32)
    from nerf_pytorch_paeng_tpu.eval.frame import _trunc_classes
    assert _use_rays_kernels(cfg)
    classes = _trunc_classes(40, 24, cfg.render_trunc_eps)
    assert classes == [32, 40], classes
    H = W = 12
    _, K, poses = make_synth_scene(n_views=1, H=H, W=W)
    c2w = jnp.asarray(poses[0][:3, :4])
    key = jax.random.PRNGKey(11)

    render_exact = make_frame_renderer(
        model, dataclasses.replace(cfg, render_cull="none"), H, W, K,
        stratified=False)
    render_cull = make_frame_renderer(
        model, dataclasses.replace(cfg, render_cull="auto",
                                   render_trunc_eps=0.0), H, W, K,
        stratified=False)
    render_auto = make_frame_renderer(
        model, dataclasses.replace(cfg, render_cull="auto"), H, W, K,
        stratified=False)
    rgb_e, _ = render_exact(params, c2w, key)
    rgb_c, _ = render_cull(params, c2w, key)
    rgb_a, _ = render_auto(params, c2w, key)

    gt = render_gt(H, W, K, np.asarray(poses[0]), 2.0, 6.0, amp=60.0)
    psnr_exact = _psnr(rgb_e, gt)
    psnr_cull = _psnr(rgb_c, gt)
    psnr_auto = _psnr(rgb_a, gt)
    assert psnr_exact > 20.0, psnr_exact
    assert abs(psnr_cull - psnr_auto) < 0.05, (psnr_cull, psnr_auto)
    assert abs(psnr_exact - psnr_auto) < 0.3, (psnr_exact, psnr_auto)

    # shared oracle (tests/trunc_oracle.py, incl. the mass contract): a
    # real fraction of active rays' sample WINDOW (leading-mass cut ->
    # transmittance collapse, frame.py phase 1) fits in <= 32 merged
    # samples, so the 32-sample fine programs genuinely had work to do
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
    frac_trunc = float((s_req[active] <= 32).mean())
    assert frac_trunc > 0.2, frac_trunc


def test_truncated_rays_branch_on_mesh(trained_full_width_hard):
    """Window truncation over the 8-device mesh equals the single-device
    truncated render (deterministic sampling, same key): the sharded
    phase-2 path must compute identical per-ray windows."""
    from nerf_pytorch_paeng_tpu.parallel import make_mesh
    cfg, model, params = trained_full_width_hard
    cfg = dataclasses.replace(cfg, N_samples_c=16, N_samples_f=24,
                              chunk_rays=32, render_cull="auto")
    assert _use_rays_kernels(cfg)
    H = W = 12
    _, K, poses = make_synth_scene(n_views=1, H=H, W=W)
    c2w = jnp.asarray(poses[0][:3, :4])
    key = jax.random.PRNGKey(13)

    single = make_frame_renderer(model, cfg, H, W, K, stratified=False)
    rgb1, disp1 = single(params, c2w, key)
    mesh = make_mesh(8, 1)
    sharded = make_frame_renderer(model, cfg, H, W, K, mesh=mesh,
                                  stratified=False)
    rgb8, disp8 = sharded(params, c2w, key)
    np.testing.assert_allclose(np.asarray(rgb8), np.asarray(rgb1),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(disp8), np.asarray(disp1),
                               rtol=1e-3, atol=5e-3)


def test_culled_rays_branch_on_mesh(trained_full_width):
    """The culled rays-kernel renderer over the 8-device mesh equals the
    single-device render (deterministic sampling, same key)."""
    from nerf_pytorch_paeng_tpu.parallel import make_mesh
    cfg, model, params = trained_full_width
    cfg = dataclasses.replace(cfg, render_cull="auto")
    assert _use_rays_kernels(cfg)
    H = W = 8
    _, K, poses = make_synth_scene(n_views=1, H=H, W=W)
    c2w = jnp.asarray(poses[0][:3, :4])
    key = jax.random.PRNGKey(7)

    single = make_frame_renderer(model, cfg, H, W, K, stratified=False)
    rgb1, disp1 = single(params, c2w, key)
    mesh = make_mesh(8, 1)
    sharded = make_frame_renderer(model, cfg, H, W, K, mesh=mesh,
                                  stratified=False)
    rgb8, disp8 = sharded(params, c2w, key)
    np.testing.assert_allclose(np.asarray(rgb8), np.asarray(rgb1),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(disp8), np.asarray(disp1),
                               rtol=1e-3, atol=5e-3)


@pytest.fixture(scope="module")
def trained_full_width_compact():
    """A fitted full-width model with GLOBALLY compact support (the
    uniform-hinge + polish mode), so the pre-cull support bounds are
    valid — the quick ray-only fixture above leaves off-frustum junk."""
    cfg = _cfg(render_precull=True, render_precull_grid=16)
    model, params0 = init_nerf(cfg, jax.random.PRNGKey(0))
    params, fit_loss = fit_field_to_blob(
        model, params0, jax.random.PRNGKey(1), n_steps=250, n_pts=2048,
        uniform_frac=0.25)
    assert fit_loss < 0.1, fit_loss
    return cfg, model, params


def test_precull_pallas_support_path(trained_full_width_compact):
    """_support_for_eval's PACKED branch — the production TPU path: the
    support grid program must run through make_pallas_sigma_fn on the
    packed coarse tree (interpret mode here), yield valid bounds on the
    compact fit, and the pre-culled rays-kernel frame must equal the
    tau-culled one.  No other suite test executes that branch."""
    from nerf_pytorch_paeng_tpu.eval.frame import (_pack_for_eval,
                                                   _support_for_eval,
                                                   _use_precull)
    cfg, model, params = trained_full_width_compact
    assert _use_precull(cfg) and _use_rays_kernels(cfg)

    packed = _pack_for_eval(params, cfg)
    assert "packed_coarse" in packed
    bounds, valid = _support_for_eval(model, packed, cfg)
    assert valid
    assert all(np.isfinite(np.asarray(b)).all() for b in bounds[:3])

    H = W = 16
    _, K, poses = make_synth_scene(n_views=1, H=H, W=W)
    c2w = jnp.asarray(poses[0][:3, :4])
    key = jax.random.PRNGKey(5)
    r_pre = make_frame_renderer(model, cfg, H, W, K, stratified=False)
    r_cull = make_frame_renderer(
        model, dataclasses.replace(cfg, render_precull=False), H, W, K,
        stratified=False)
    rgb_p, disp_p = r_pre(params, c2w, key)
    rgb_c, disp_c = r_cull(params, c2w, key)
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_c),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(disp_p), np.asarray(disp_c),
                               atol=1e-4)

    # No miss-fraction assert here: a 250-step full-width fit keeps loose
    # near-support spill (AABB ~±2), so this frame typically runs all-hit
    # through phase 0.  That still covers the packed support program and
    # the P0/P1-block/tail structure through the rays kernels; genuine
    # hit/miss compaction is covered by tests/test_precull.py (XLA path,
    # tighter 4x64 fits) and the synthetic-bounds mesh test there.


def test_gated_sigma_skips_cullable_tiles(trained_full_width):
    """_gated_sigma_t (the dispatch-free pre-cull inside phase 1): rays
    provably outside the support bounds are sorted into trailing kernel
    tiles whose MLP is skipped — keeper columns bit-equal the ungated
    kernel, cullable columns come back exactly 0, and the gate provably
    engaged (the real logits of those rays are nonzero)."""
    from nerf_pytorch_paeng_tpu.eval.frame import (_gated_sigma_t,
                                                   _pack_for_eval,
                                                   _pack_od)
    from nerf_pytorch_paeng_tpu.kernels.fused_mlp import fused_mlp_sigma_rays
    from nerf_pytorch_paeng_tpu.ops.sampling import stratified_z_vals

    cfg, model, params = trained_full_width
    packed = _pack_for_eval(params, cfg)["packed_coarse"]
    m, s, tile = 512, 8, 128

    # interleave keepers (through the synthetic AABB at the origin) with
    # soundly-cullable rays (x offset 3 — outside the box, inside the
    # huge estimation cube), so the in-program sort genuinely reorders
    x_off = np.where(np.arange(m) % 2 == 0, 0.0, 3.0)
    rays_o = jnp.asarray(
        np.stack([x_off, np.zeros(m), np.full(m, 4.0)], -1), jnp.float32)
    rays_d = jnp.asarray(
        np.broadcast_to(np.array([0.0, 0.0, -1.0], np.float32), (m, 3)))
    pc = (jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0]),
          jnp.asarray([1.8]), jnp.asarray([True]))
    z_vals = stratified_z_vals(jax.random.PRNGKey(7), m, 2.0, 6.0, s,
                               perturb=False)

    sigma = np.asarray(_gated_sigma_t(
        packed, rays_o, rays_d, z_vals, pc, tile, m, half=50.0,
        near=2.0, far=6.0, L_x=cfg.L_x, interpret=True))
    ref = np.asarray(fused_mlp_sigma_rays(
        _pack_od(rays_o, rays_d), z_vals.T, packed, L_x=cfg.L_x,
        tile_rays=tile, interpret=True, out_dtype=jnp.bfloat16))

    keep = np.arange(m) % 2 == 0
    np.testing.assert_array_equal(sigma[:, keep], ref[:, keep])
    np.testing.assert_array_equal(sigma[:, ~keep], 0.0)
    assert not np.array_equal(ref[:, ~keep], np.zeros_like(ref[:, ~keep]))


def test_gated_sigma_row_gating(trained_full_width):
    """Sample-row granularity of the dispatch-free pre-cull: rays that
    HIT the support still skip the 8-sample depth rows outside their
    conservative support interval.  Two ray groups land in two kernel
    tiles with DIFFERENT row spans (also pinning the flat (tile, row)
    gate index order): group A's interval touches only the middle of
    3 rows; group B exits the estimation cube, so nothing of it may be
    gated.  Active (tile, row) blocks are bit-equal to the ungated
    kernel, gated ones exact zeros, and the ungated kernel's values
    there are nonzero (the gate did real work)."""
    from nerf_pytorch_paeng_tpu.eval.frame import (_gated_sigma_t,
                                                   _pack_for_eval,
                                                   _pack_od)
    from nerf_pytorch_paeng_tpu.kernels.fused_mlp import fused_mlp_sigma_rays
    from nerf_pytorch_paeng_tpu.ops.sampling import stratified_z_vals

    cfg, model, params = trained_full_width
    packed = _pack_for_eval(params, cfg)["packed_coarse"]
    m, s, tile = 256, 24, 128                    # 3 sample rows of 8
    # group A: straight through a synthetic box/sphere around the origin
    # -> support interval t in [3.5, 4.5] (middle row of [2, 6] only);
    # group B: origin z=8 puts the t=2 endpoint at z=6 > half=5, outside
    # the estimation cube -> exempt (full span)
    oz = np.where(np.arange(m) < m // 2, 4.0, 8.0)
    rays_o = jnp.asarray(
        np.stack([np.zeros(m), np.zeros(m), oz], -1), jnp.float32)
    rays_d = jnp.asarray(
        np.broadcast_to(np.array([0.0, 0.0, -1.0], np.float32), (m, 3)))
    pc = (jnp.asarray([-0.5, -0.5, -0.5]), jnp.asarray([0.5, 0.5, 0.5]),
          jnp.asarray([0.9]), jnp.asarray([True]))
    z_vals = stratified_z_vals(jax.random.PRNGKey(7), m, 2.0, 6.0, s,
                               perturb=True)     # jittered: envelopes hold
    sigma = np.asarray(_gated_sigma_t(
        packed, rays_o, rays_d, z_vals, pc, tile, m, half=5.0,
        near=2.0, far=6.0, L_x=cfg.L_x, interpret=True))
    ref = np.asarray(fused_mlp_sigma_rays(
        _pack_od(rays_o, rays_d), z_vals.T, packed, L_x=cfg.L_x,
        tile_rays=tile, interpret=True, out_dtype=jnp.bfloat16))

    a = np.arange(m) < m // 2
    np.testing.assert_array_equal(sigma[:, ~a], ref[:, ~a])   # B: untouched
    np.testing.assert_array_equal(sigma[8:16, a], ref[8:16, a])
    np.testing.assert_array_equal(sigma[:8, a], 0.0)          # A: rows 0, 2
    np.testing.assert_array_equal(sigma[16:, a], 0.0)         # gated
    assert not np.array_equal(ref[:8, a], np.zeros_like(ref[:8, a]))
    assert not np.array_equal(ref[16:, a], np.zeros_like(ref[16:, a]))


def test_gated_row_precull_render_matches(trained_full_width_compact):
    """End-to-end multi-row gating with GENUINE support bounds: at 24+8
    samples (3 coarse rows) the pre-culled rays-kernel render must equal
    the plain tau-culled one bit-for-bit on compositing weights (atol
    1e-5 on the frame), and the bounds must actually induce partial row
    spans on support-hitting rays (row-level work skipped, not only
    whole rays)."""
    from nerf_pytorch_paeng_tpu.eval.frame import (_pack_for_eval,
                                                   _precull_half,
                                                   _support_for_eval,
                                                   _use_precull)
    from nerf_pytorch_paeng_tpu.ops.occupancy import (ray_support_interval,
                                                      segment_in_cube)
    from nerf_pytorch_paeng_tpu.ops.rays import get_rays

    cfg, model, params = trained_full_width_compact
    cfg = dataclasses.replace(cfg, N_samples_c=24, N_samples_f=8)
    assert _use_precull(cfg) and _use_rays_kernels(cfg)
    H = W = 16
    _, K, poses = make_synth_scene(n_views=1, H=H, W=W)
    c2w = jnp.asarray(poses[0][:3, :4])
    key = jax.random.PRNGKey(5)

    r_pre = make_frame_renderer(model, cfg, H, W, K, stratified=False)
    r_cull = make_frame_renderer(
        model, dataclasses.replace(cfg, render_precull=False), H, W, K,
        stratified=False)
    rgb_p, disp_p = r_pre(params, c2w, key)
    rgb_c, disp_c = r_cull(params, c2w, key)
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_c),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(disp_p), np.asarray(disp_c),
                               atol=1e-4)

    # row gating under shard_map (per-shard gate construction) == single
    # device
    from nerf_pytorch_paeng_tpu.parallel import make_mesh
    mesh = make_mesh(8, 1)
    r_pre8 = make_frame_renderer(model, cfg, H, W, K, mesh=mesh,
                                 stratified=False)
    rgb_p8, disp_p8 = r_pre8(params, c2w, key)
    np.testing.assert_allclose(np.asarray(rgb_p8), np.asarray(rgb_p),
                               rtol=1e-3, atol=2e-3)

    # partial spans: some in-cube ray intersects the bounds over a strict
    # subset of its 3 depth rows
    from nerf_pytorch_paeng_tpu.eval.frame import _row_envelopes
    bounds, valid = _support_for_eval(model, _pack_for_eval(params, cfg),
                                      cfg)
    assert valid
    ro, rd = get_rays(H, W, jnp.asarray(K, jnp.float32), c2w)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    t_lo, t_hi = ray_support_interval(ro, rd, *bounds, 2.0, 6.0)
    inside = np.asarray(segment_in_cube(ro, rd, _precull_half(cfg),
                                        2.0, 6.0))
    row_lo, row_hi = _row_envelopes(2.0, 6.0, 24, 8)
    act = np.asarray((t_lo[:, None] <= row_hi[None])
                     & (t_hi[:, None] >= row_lo[None]))
    partial = inside & act.any(-1) & ~act.all(-1)
    assert partial.any()


def test_gated_fine_rays_row_gating(trained_full_width):
    """_gated_fine_rays (phase-2 fine-row gating by the FINE module's
    bounds): row activity comes from the ACTUAL sample depths (the merged
    hierarchical depths are data-dependent — no static row envelopes), at
    (ray-tile, 8-row) granularity.  Group A's support interval covers only
    the middle of 3 depth rows; group B exits the estimation cube and is
    exempt.  All four outputs of active blocks are bit-equal to the
    ungated eval kernel, gated blocks come back exact zeros, and the
    ungated kernel is nonzero there (the gate did real work)."""
    from nerf_pytorch_paeng_tpu.eval.frame import (_gated_fine_rays,
                                                   _pack_for_eval,
                                                   _pack_od)
    from nerf_pytorch_paeng_tpu.kernels.fused_mlp import fused_mlp_eval_rays

    cfg, model, params = trained_full_width
    packed = _pack_for_eval(params, cfg)["packed_fine"]
    m, s, tile = 256, 24, 128                    # 3 sample rows of 8
    # group A: interval [3.5, 4.5] touches only row 1 of linspace(2,6,24)
    # rows ([2,3.22], [3.39,4.61], [4.78,6]); group B: origin z=8 puts
    # the t=2 endpoint at z=6 > half=5, outside the estimation cube ->
    # exempt (full span, nothing gated)
    oz = np.where(np.arange(m) < m // 2, 4.0, 8.0)
    rays_o = jnp.asarray(
        np.stack([np.zeros(m), np.zeros(m), oz], -1), jnp.float32)
    rays_d = jnp.asarray(
        np.broadcast_to(np.array([0.0, 0.0, -1.0], np.float32), (m, 3)))
    fb = (jnp.asarray([-0.5, -0.5, -0.5]), jnp.asarray([0.5, 0.5, 0.5]),
          jnp.asarray([0.9]), jnp.asarray([True]))
    z_all = jnp.broadcast_to(
        jnp.linspace(2.0, 6.0, s, dtype=jnp.float32)[None], (m, s))

    got = [np.asarray(o) for o in _gated_fine_rays(
        packed, rays_o, rays_d, z_all, fb, tile, m, half=5.0,
        near=2.0, far=6.0, L_x=cfg.L_x, L_d=cfg.L_d, interpret=True)]
    ref = [np.asarray(o) for o in fused_mlp_eval_rays(
        _pack_od(rays_o, rays_d), z_all.T, packed, L_x=cfg.L_x,
        L_d=cfg.L_d, tile_rays=tile, interpret=True,
        out_dtype=jnp.bfloat16)]

    a = np.arange(m) < m // 2
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(g[:, ~a], r[:, ~a])    # B: untouched
        np.testing.assert_array_equal(g[8:16, a], r[8:16, a])
        np.testing.assert_array_equal(g[:8, a], 0.0)         # A: rows 0, 2
        np.testing.assert_array_equal(g[16:, a], 0.0)        # gated
        assert not np.array_equal(r[:8, a], np.zeros_like(r[:8, a]))
        assert not np.array_equal(r[16:, a], np.zeros_like(r[16:, a]))


def test_gate_fine_render_matches(trained_full_width_compact):
    """End-to-end fine-phase gating (cfg.render_gate_fine) with GENUINE
    fine-module support bounds: the gated culled render must equal the
    ungated culled render (sound bounds -> gated rows provably carry zero
    compositing weight), the fine bounds must be valid, and the gated
    phase-2 programs must actually have been built."""
    from nerf_pytorch_paeng_tpu.eval.frame import (_pack_for_eval,
                                                   _support_for_eval,
                                                   _use_gate_fine)
    cfg, model, params = trained_full_width_compact
    # isolate the fine gate from the coarse pre-cull
    cfg_on = dataclasses.replace(cfg, render_precull="off")
    cfg_off = dataclasses.replace(cfg, render_precull="off",
                                  render_gate_fine="off")
    assert _use_gate_fine(cfg_on) and not _use_gate_fine(cfg_off)
    assert _use_rays_kernels(cfg_on)

    fb, fvalid = _support_for_eval(model, _pack_for_eval(params, cfg_on),
                                   cfg_on, module="fine")
    assert fvalid
    assert all(np.isfinite(np.asarray(b)).all() for b in fb[:3])

    H = W = 16
    _, K, poses = make_synth_scene(n_views=1, H=H, W=W)
    c2w = jnp.asarray(poses[0][:3, :4])
    key = jax.random.PRNGKey(5)
    r_on = make_frame_renderer(model, cfg_on, H, W, K, stratified=False)
    r_off = make_frame_renderer(model, cfg_off, H, W, K, stratified=False)
    rgb_g, disp_g = r_on(params, c2w, key)
    rgb_u, disp_u = r_off(params, c2w, key)
    np.testing.assert_allclose(np.asarray(rgb_g), np.asarray(rgb_u),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(disp_g), np.asarray(disp_u),
                               atol=1e-4)

    # and over the mesh (shard_map'd gated phase 2, bounds replicated)
    from nerf_pytorch_paeng_tpu.parallel import make_mesh
    mesh = make_mesh(8, 1)
    r_on8 = make_frame_renderer(model, cfg_on, H, W, K, mesh=mesh,
                                stratified=False)
    rgb_g8, _ = r_on8(params, c2w, key)
    np.testing.assert_allclose(np.asarray(rgb_g8), np.asarray(rgb_g),
                               rtol=1e-3, atol=2e-3)


def test_gated_precull_rays_on_mesh(trained_full_width_compact):
    """The gated-precull phase 1 (shard_map'd _coarse_body_gated, bounds
    replicated) over the 8-device mesh equals both the single-device
    gated render and the plain tau-culled render (deterministic
    sampling: keeper rays are bit-equal through the kernel, and sound
    bounds make cullable rays' weights exactly 0 on every path)."""
    from nerf_pytorch_paeng_tpu.parallel import make_mesh
    cfg, model, params = trained_full_width_compact
    from nerf_pytorch_paeng_tpu.eval.frame import _use_precull
    assert _use_precull(cfg) and _use_rays_kernels(cfg)
    H = W = 8
    _, K, poses = make_synth_scene(n_views=1, H=H, W=W)
    c2w = jnp.asarray(poses[0][:3, :4])
    key = jax.random.PRNGKey(9)

    single = make_frame_renderer(model, cfg, H, W, K, stratified=False)
    rgb1, disp1 = single(params, c2w, key)
    mesh = make_mesh(8, 1)
    sharded = make_frame_renderer(model, cfg, H, W, K, mesh=mesh,
                                  stratified=False)
    rgb8, disp8 = sharded(params, c2w, key)
    np.testing.assert_allclose(np.asarray(rgb8), np.asarray(rgb1),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(disp8), np.asarray(disp1),
                               rtol=1e-3, atol=5e-3)

    plain = make_frame_renderer(
        model, dataclasses.replace(cfg, render_precull=False), H, W, K,
        mesh=mesh, stratified=False)
    rgb_p, _ = plain(params, c2w, key)
    np.testing.assert_allclose(np.asarray(rgb8), np.asarray(rgb_p),
                               atol=1e-5)
