"""Phase-0 support-bounds ray pre-culling (ops/occupancy.py +
eval/frame.py `render_precull`).

Mechanism under test: a conservative bounding volume of the coarse
field's sigma>0 support lets rays that provably sample only zero density
skip the coarse MLP.  A miss ray's coarse occupancy is exactly 0, so the
pre-cull must be invisible next to the plain tau-cull: same rendered
frames (bit-level for bounds-hit rays under deterministic sampling),
same guard vs the exact render.  Off-TPU the feature is opt-in via a
small explicit grid (cfg.render_precull_grid; 0 = auto = disabled on
CPU), which these tests use.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf_pytorch_paeng_tpu.config import NerfConfig
from nerf_pytorch_paeng_tpu.eval.frame import (_use_precull,
                                               make_frame_renderer)
from nerf_pytorch_paeng_tpu.models import init_nerf
from nerf_pytorch_paeng_tpu.ops.occupancy import (ray_hits_bounds,
                                                  segment_in_cube,
                                                  support_bounds_from_sigma)
from nerf_pytorch_paeng_tpu.utils.synth import (fit_field_to_blob,
                                                make_synth_scene, render_gt)


def _cfg(**kw):
    # grid 48 over the default half=far cube -> 0.25 cells, the same
    # bound resolution the pre-half=far tests had (48^3 sigma pts is
    # still cheap on the CPU XLA path)
    base = dict(netDepth=4, netWidth=64, L_x=6, L_d=2,
                N_samples_c=16, N_samples_f=24, near=2.0, far=6.0,
                compute_dtype="float32", chunk_rays=256, perturb=0.0,
                render_cull="auto", render_precull=True,
                render_precull_grid=48)
    base.update(kw)
    return NerfConfig(**base)


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


def _blob_sigma(xplane, r=0.6, cutoff=1.8, amp=8.0):
    """The analytic synth blob density (utils/synth._density), feature-
    major — compact support of radius ``cutoff``."""
    d2 = jnp.sum(xplane ** 2, 0) / (2 * r * r)
    floor = jnp.exp(-(cutoff * cutoff) / (2 * r * r))
    return amp * jnp.maximum(jnp.exp(-d2) - floor, 0.0)


def test_support_bounds_cover_blob():
    half, grid = 3.0, 48
    lo, hi, rad, valid = support_bounds_from_sigma(_blob_sigma, half,
                                                   grid=grid)
    lo, hi = np.asarray(lo), np.asarray(hi)
    rad, valid = float(rad[0]), bool(valid[0])
    cell = 2 * half / grid
    assert valid
    # the bounds contain the support ball (radius 1.8, origin-centered)...
    assert (lo <= -1.8 + 1e-6).all() and (hi >= 1.8 - 1e-6).all()
    assert rad >= 1.8 - np.abs(lo + hi).max() / 2
    # ...and are tight up to sampling + one-cell dilation + outer corners
    assert (lo >= -1.8 - 2.5 * cell).all(), (lo, cell)
    assert (hi <= 1.8 + 2.5 * cell).all(), (hi, cell)
    assert rad <= 1.8 * np.sqrt(3) + 2.5 * cell   # corner-distance bound


def test_support_bounds_fog_is_invalid():
    """Density everywhere (touching the cube boundary) -> unusable bounds,
    and ray_hits_bounds then reports every ray as a hit."""
    fog = lambda xp: jnp.ones(xp.shape[-1])
    lo, hi, rad, valid = support_bounds_from_sigma(fog, 3.0, grid=16)
    assert not bool(valid[0])
    o = jnp.asarray(np.random.default_rng(0).normal(size=(32, 3)),
                    jnp.float32) * 10.0
    d = jnp.asarray(np.random.default_rng(1).normal(size=(32, 3)),
                    jnp.float32)
    hit = ray_hits_bounds(o, d, lo, hi, rad, valid, 2.0, 6.0)
    assert bool(jnp.all(hit))


def test_support_bounds_empty_is_invalid():
    zero = lambda xp: jnp.zeros(xp.shape[-1])
    *_, valid = support_bounds_from_sigma(zero, 3.0, grid=16)
    assert not bool(valid[0])


def test_ray_hits_bounds_is_conservative():
    """Brute-force oracle: if any densely-sampled segment point lies in
    box-AND-sphere, the test must report a hit (no false negatives)."""
    rng = np.random.default_rng(2)
    lo = jnp.asarray([-1.0, -0.5, -1.5])
    hi = jnp.asarray([1.2, 0.8, 0.3])
    rad = jnp.asarray([1.4])
    valid = jnp.asarray([True])
    c = 0.5 * (np.asarray(lo) + np.asarray(hi))
    near, far = 2.0, 6.0

    o = rng.normal(size=(512, 3)) * 3.0
    d = rng.normal(size=(512, 3))
    hit = np.asarray(ray_hits_bounds(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        lo, hi, rad, valid, near, far))

    t = np.linspace(near, far, 2048)
    pts = o[:, None, :] + d[:, None, :] * t[None, :, None]
    in_box = ((pts >= np.asarray(lo)) & (pts <= np.asarray(hi))).all(-1)
    in_sph = np.sum((pts - c) ** 2, -1) <= float(rad[0]) ** 2
    brute = (in_box & in_sph).any(-1)
    assert not (brute & ~hit).any()          # conservative
    assert brute.any() and (~hit).any()      # the case split is non-trivial


def test_ray_support_interval_is_conservative():
    """Brute-force oracle for the per-ray interval behind sample-row
    gating: every densely-sampled segment point inside box-AND-sphere
    must have its t inside [t_lo, t_hi] (no sample that may touch
    support can be gated away), and with valid=False the interval is the
    full [near, far]."""
    from nerf_pytorch_paeng_tpu.ops.occupancy import ray_support_interval
    rng = np.random.default_rng(7)
    lo = jnp.asarray([-1.0, -0.5, -1.5])
    hi = jnp.asarray([1.2, 0.8, 0.3])
    rad = jnp.asarray([1.4])
    c = 0.5 * (np.asarray(lo) + np.asarray(hi))
    near, far = 2.0, 6.0

    o = rng.normal(size=(512, 3)) * 3.0
    d = rng.normal(size=(512, 3))
    t_lo, t_hi = ray_support_interval(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        lo, hi, rad, jnp.asarray([True]), near, far)
    t_lo, t_hi = np.asarray(t_lo), np.asarray(t_hi)

    t = np.linspace(near, far, 2048)
    pts = o[:, None, :] + d[:, None, :] * t[None, :, None]
    in_both = (((pts >= np.asarray(lo)) & (pts <= np.asarray(hi))).all(-1)
               & (np.sum((pts - c) ** 2, -1) <= float(rad[0]) ** 2))
    covered = ~in_both | ((t[None] >= t_lo[:, None] - 1e-5)
                          & (t[None] <= t_hi[:, None] + 1e-5))
    assert covered.all()
    # non-trivial: some rays have a strict sub-interval, some are empty
    hit = t_lo <= t_hi
    assert hit.any() and (~hit).any()
    strict = hit & ((t_lo > near + 1e-3) | (t_hi < far - 1e-3))
    assert strict.any()

    # invalid bounds certify nothing
    t_lo0, t_hi0 = ray_support_interval(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        lo, hi, rad, jnp.asarray([False]), near, far)
    assert (np.asarray(t_lo0) == near).all()
    assert (np.asarray(t_hi0) == far).all()


def _fit_scene(cfg, H, W):
    # 1000 steps: at 500 the separately-distilled coarse/fine MLPs still
    # disagree at the blob silhouette in compact (uniform_frac) mode and
    # the tau-cull costs ~0.24 dB vs exact; at 1000 they re-converge and
    # the <0.05 dB guard genuinely measures the cull mechanism
    imgs, K, poses = make_synth_scene(n_views=1, H=H, W=W)
    model, params0 = init_nerf(cfg, jax.random.PRNGKey(0))
    params, fit_loss = fit_field_to_blob(model, params0,
                                         jax.random.PRNGKey(1),
                                         n_steps=1000, n_pts=8192,
                                         L_x=cfg.L_x, L_d=cfg.L_d,
                                         uniform_frac=0.25)
    assert fit_loss < 0.1, fit_loss
    return model, params, K, poses


def test_preculled_render_matches_culled():
    """Pre-cull on vs off (same tau-culled renderer otherwise): identical
    frames under deterministic sampling, with a meaningful fraction of
    rays actually pre-culled, and the exact-render guard preserved."""
    cfg = _cfg()
    assert _use_precull(cfg)
    H = W = 24
    model, params, K, poses = _fit_scene(cfg, H, W)
    c2w = jnp.asarray(poses[0][:3, :4])
    key = jax.random.PRNGKey(9)

    r_pre = make_frame_renderer(model, cfg, H, W, K, stratified=False)
    r_cull = make_frame_renderer(
        model, dataclasses.replace(cfg, render_precull=False), H, W, K,
        stratified=False)
    r_exact = make_frame_renderer(
        model, dataclasses.replace(cfg, render_cull="none"), H, W, K,
        stratified=False)
    rgb_p, disp_p = r_pre(params, c2w, key)
    rgb_c, disp_c = r_cull(params, c2w, key)
    rgb_e, _ = r_exact(params, c2w, key)

    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_c),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(disp_p), np.asarray(disp_c),
                               atol=1e-4)
    gt = render_gt(H, W, K, np.asarray(poses[0]), 2.0, 6.0)
    assert abs(_psnr(rgb_e, gt) - _psnr(rgb_p, gt)) < 0.05

    # the bounds must actually reject rays on this scene (empty corners)
    from nerf_pytorch_paeng_tpu.eval.frame import (_precull_half,
                                                   _support_for_eval)
    from nerf_pytorch_paeng_tpu.ops.rays import get_rays
    bounds, valid = _support_for_eval(model, params, cfg)
    assert valid                             # valid on the distilled blob
    ro, rd = get_rays(H, W, jnp.asarray(K, jnp.float32), c2w)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    # this geometry's segments are contained in the default cube, so the
    # containment guard costs no coverage here
    assert bool(jnp.all(segment_in_cube(ro, rd, _precull_half(cfg),
                                        2.0, 6.0)))
    hit = ray_hits_bounds(ro, rd, *bounds, 2.0, 6.0)
    n_miss = int((~np.asarray(hit)).sum())
    # the default blob almost fills this frustum — only frame corners miss
    # (the meaningful-fraction check lives on the smaller blob below)
    assert n_miss >= 1, n_miss


def test_precull_misses_meaningfully_on_small_blob():
    """On the benchmark's standard ~30%-occupancy blob geometry a large
    fraction of frame rays must pre-cull, and the pre-culled frame must
    still equal the tau-culled one."""
    cfg = _cfg()
    H = W = 24
    _, K, poses = make_synth_scene(n_views=1, H=H, W=W)
    model, params0 = init_nerf(cfg, jax.random.PRNGKey(0))
    params, fit_loss = fit_field_to_blob(model, params0,
                                         jax.random.PRNGKey(1),
                                         n_steps=500, n_pts=8192,
                                         L_x=cfg.L_x, L_d=cfg.L_d,
                                         blob_r=0.45, blob_cutoff=1.35,
                                         uniform_frac=0.25)
    assert fit_loss < 0.1, fit_loss
    c2w = jnp.asarray(poses[0][:3, :4])

    from nerf_pytorch_paeng_tpu.eval.frame import _support_for_eval
    from nerf_pytorch_paeng_tpu.ops.rays import get_rays
    bounds, valid = _support_for_eval(model, params, cfg)
    assert valid
    ro, rd = get_rays(H, W, jnp.asarray(K, jnp.float32), c2w)
    hit = np.asarray(ray_hits_bounds(ro.reshape(-1, 3), rd.reshape(-1, 3),
                                     *bounds, 2.0, 6.0))
    assert (~hit).mean() > 0.2, (~hit).mean()

    key = jax.random.PRNGKey(9)
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


def test_preculled_render_on_mesh_matches_single(monkeypatch):
    """P0/P1-block structure under an 8-device mesh == single device.

    Synthetic VALID ball bounds are injected (the untrained model's real
    bounds are invalid, which would route both renderers to the dense
    coarse path): single-vs-mesh equality only needs both paths to apply
    the SAME pre-cull, so this exercises the sharded phase-0 compaction
    with a genuine hit/miss mix regardless of field content."""
    from nerf_pytorch_paeng_tpu.eval import frame as F
    from nerf_pytorch_paeng_tpu.ops.rays import get_rays
    from nerf_pytorch_paeng_tpu.parallel import make_mesh
    cfg = _cfg(netDepth=2, netWidth=32, L_x=4, L_d=2, N_samples_c=8,
               N_samples_f=8, chunk_rays=32, render_cull_tau=0.5,
               render_precull_grid=16)
    H = W = 8
    _, K, poses = make_synth_scene(n_views=1, H=H, W=W)
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))
    c2w = jnp.asarray(poses[0][:3, :4])
    key = jax.random.PRNGKey(1)

    bounds = (jnp.asarray([-1.5, -1.5, -1.5]), jnp.asarray([1.5, 1.5, 1.5]),
              jnp.asarray([2.0]), jnp.asarray([True]))
    monkeypatch.setattr(F, "_support_for_eval",
                        lambda model, params, cfg: (bounds, True))
    ro, rd = get_rays(H, W, jnp.asarray(K, jnp.float32), c2w)
    hit = np.asarray(ray_hits_bounds(ro.reshape(-1, 3), rd.reshape(-1, 3),
                                     *bounds, 2.0, 6.0))
    assert hit.any() and (~hit).any()        # genuine compaction mix

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


def test_segment_in_cube():
    """Endpoint containment == dense-sample containment (both convex)."""
    rng = np.random.default_rng(3)
    o = rng.normal(size=(256, 3)) * 3.0
    d = rng.normal(size=(256, 3))
    near, far, half = 2.0, 6.0, 4.0
    inside = np.asarray(segment_in_cube(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        half, near, far))
    t = np.linspace(near, far, 512)
    pts = o[:, None, :] + d[:, None, :] * t[None, :, None]
    brute = (np.abs(pts) <= half + 1e-5).all(-1).all(-1)
    brute_strict = (np.abs(pts) <= half - 1e-5).all(-1).all(-1)
    assert not (inside & ~brute).any()       # no false "contained"
    assert not (brute_strict & ~inside).any()
    assert inside.any() and (~inside).any()


def test_small_cube_costs_coverage_not_correctness():
    """With an estimation cube too small to contain the camera orbit's
    sample segments, rays that exit the cube must be exempt from
    pre-culling (hit | ~inside), and the rendered frame must still equal
    the tau-culled one exactly."""
    from nerf_pytorch_paeng_tpu.eval.frame import (_precull_half,
                                                   _support_for_eval)
    from nerf_pytorch_paeng_tpu.ops.rays import get_rays
    cfg = _cfg(render_precull_halfside=2.0)
    H = W = 16
    model, params, K, poses = _fit_scene(cfg, H, W)
    c2w = jnp.asarray(poses[0][:3, :4])

    bounds, valid = _support_for_eval(model, params, cfg)
    ro, rd = get_rays(H, W, jnp.asarray(K, jnp.float32), c2w)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    inside = np.asarray(segment_in_cube(ro, rd, _precull_half(cfg),
                                        2.0, 6.0))
    # radius-4 cameras with far=6: off-center segments leave a [-2, 2]^3
    # cube, so the guard must be doing real work on this geometry
    assert (~inside).any()

    key = jax.random.PRNGKey(9)
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


def test_support_program_reused_across_params():
    """The grid program must compile once per config, not once per params
    tree (fresh params per eval hook -> a 20-60 s remote compile each
    would defeat the renderer cache)."""
    from nerf_pytorch_paeng_tpu.eval import frame as F
    cfg = _cfg()
    model, params_a = init_nerf(cfg, jax.random.PRNGKey(0))
    _, params_b = init_nerf(cfg, jax.random.PRNGKey(1))
    F._SUPPORT_PROGS.clear()
    F._SUPPORT_CACHE.clear()
    F._support_for_eval(model, params_a, cfg)
    assert len(F._SUPPORT_PROGS) == 1
    F._support_for_eval(model, params_b, cfg)
    assert len(F._SUPPORT_PROGS) == 1        # same compiled program
    assert len(F._SUPPORT_CACHE) == 2        # per-params results
    # cached result path: same params object -> no new entries
    F._support_for_eval(model, params_b, cfg)
    assert len(F._SUPPORT_CACHE) == 2


def test_precull_invalid_bounds_fallback():
    """An untrained model (noisy support reaching the cube boundary, or
    none) must render identically with pre-cull on and off — the
    all-hit fallback path."""
    cfg = _cfg(render_precull_grid=16)
    H, W = 9, 13
    K = np.array([[10.0, 0, W / 2], [0, 10.0, H / 2], [0, 0, 1]])
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))
    c2w = jnp.asarray(
        np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.0]]), jnp.float32)
    r_pre = make_frame_renderer(model, cfg, H, W, K, stratified=False)
    r_cull = make_frame_renderer(
        model, dataclasses.replace(cfg, render_precull=False), H, W, K,
        stratified=False)
    key = jax.random.PRNGKey(1)
    rgb_p, disp_p = r_pre(params, c2w, key)
    rgb_c, disp_c = r_cull(params, c2w, key)
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_c),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(disp_p), np.asarray(disp_c),
                               atol=1e-4)
