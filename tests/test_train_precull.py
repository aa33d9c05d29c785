"""Occupancy-gated training (cfg.train_precull): the gated custom-VJP
kernel pair (kernels/fused_mlp_vjp.fused_mlp_train_rays(gate=...)), the
gated training render (ops/render.render_rays_train(support=...)), and
the step/driver wiring (train/precull.py).

Exactness contract under test (train/precull.py module docstring): with
sound support bounds the gated step's LOSS is bit-equal to the ungated
step (gated samples have exactly-zero compositing weights either way)
and its GRADS are equal up to fp32 accumulation order (ray sorting
changes tile membership in the kernel's cross-grid grad sums).

The reference has no equivalent (train.py:53 evaluates every sample of
every ray every step); this is the TPU framework's opt-in speed feature,
so the tests pin it against the reference-parity ungated step.
"""
import dataclasses
import os

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_pytorch_paeng_tpu.config import NerfConfig
from nerf_pytorch_paeng_tpu.kernels.fused_mlp import pack_nerf_mlp_params
from nerf_pytorch_paeng_tpu.kernels.fused_mlp_vjp import fused_mlp_train_rays
from nerf_pytorch_paeng_tpu.models import init_nerf
from nerf_pytorch_paeng_tpu.utils.synth import (fit_field_to_blob,
                                                make_synth_scene)


def _cfg(**kw):
    # full reference architecture (the only one the rays kernels exist
    # for); 8+8 samples keep interpret mode cheap; grid 16 over the
    # half=far cube matches the eval pre-cull tests' resolution
    base = dict(netDepth=8, netWidth=256, L_x=10, L_d=4,
                N_samples_c=8, N_samples_f=8, near=2.0, far=6.0,
                N_rays=256, use_pallas=True, train_precull=True,
                render_precull_grid=16)
    base.update(kw)
    return NerfConfig(**base)


@pytest.fixture(scope="module")
def compact_model():
    """Fitted full-width model with GLOBALLY compact support, so the
    measured support bounds are valid (same recipe as the eval pre-cull
    fixtures, tests/test_frame_rays.py)."""
    cfg = _cfg()
    model, params0 = init_nerf(cfg, jax.random.PRNGKey(0))
    params, fit_loss = fit_field_to_blob(
        model, params0, jax.random.PRNGKey(1), n_steps=250, n_pts=2048,
        uniform_frac=0.25)
    assert fit_loss < 0.1, fit_loss
    return cfg, model, params


def _camera_rays(cfg, n, key):
    """n pixel rays from a synth orbit camera (the geometry gating sees
    in real training), plus random targets."""
    from nerf_pytorch_paeng_tpu.ops.rays import get_rays
    H = W = 32
    _, K, poses = make_synth_scene(n_views=1, H=H, W=W)
    ro, rd = get_rays(H, W, jnp.asarray(K, jnp.float32),
                      jnp.asarray(poses[0][:3, :4]))
    k1, k2 = jax.random.split(key)
    idx = jax.random.choice(k1, H * W, (n,), replace=False)
    ro = ro.reshape(-1, 3)[idx]
    rd = rd.reshape(-1, 3)[idx]
    target = jax.random.uniform(k2, (n, 3))
    return ro, rd, target


# ---------------------------------------------------------------------------
# kernel-pair level


def _rand_kernel_inputs(key, n=256, s=16):
    ko, kz, kc = jax.random.split(key, 3)
    od = jnp.concatenate([
        jax.random.normal(ko, (6, n)), jnp.zeros((2, n))], 0)
    z = jnp.sort(jax.random.uniform(kz, (s, n), minval=2.0, maxval=6.0), 0)
    cots = jax.random.normal(kc, (4, s, n))
    return od, z, cots


def _kernel_loss(packed, od, z, cots, tile, gate=None):
    outs = fused_mlp_train_rays(packed, od, z, tile_rays=tile, s_rows=8,
                                interpret=True, gate=gate)
    return sum(jnp.sum(o * c) for o, c in zip(outs, cots))


def test_gated_kernel_all_on_matches_ungated(compact_model):
    """gate all-ones == the ungated pair, forward and backward."""
    cfg, model, params = compact_model
    packed = pack_nerf_mlp_params(params["coarse"], L_x=cfg.L_x,
                                  L_d=cfg.L_d)
    od, z, cots = _rand_kernel_inputs(jax.random.PRNGKey(2), n=256, s=16)
    tile = 128
    gate = jnp.ones(((256 // tile) * (16 // 8),), jnp.int32)

    out_u = fused_mlp_train_rays(packed, od, z, tile_rays=tile, s_rows=8,
                                 interpret=True)
    out_g = fused_mlp_train_rays(packed, od, z, tile_rays=tile, s_rows=8,
                                 interpret=True, gate=gate)
    for u, g in zip(out_u, out_g):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(g))

    g_u = jax.grad(_kernel_loss)(packed, od, z, cots, tile)
    g_g = jax.grad(_kernel_loss)(packed, od, z, cots, tile, gate=gate)
    for nme in g_u:
        np.testing.assert_allclose(np.asarray(g_u[nme]),
                                   np.asarray(g_g[nme]),
                                   rtol=1e-6, atol=1e-6, err_msg=nme)


def test_gated_kernel_skips_blocks_exactly(compact_model):
    """Gated-off (tile, 8-row) blocks store exact zeros in the forward,
    and the backward equals the ungated backward with cotangents zeroed
    on the gated samples (their contributions are identically zero
    there)."""
    cfg, model, params = compact_model
    packed = pack_nerf_mlp_params(params["coarse"], L_x=cfg.L_x,
                                  L_d=cfg.L_d)
    od, z, cots = _rand_kernel_inputs(jax.random.PRNGKey(3), n=256, s=16)
    tile = 128
    # grid is (2 tiles) x (2 rows), row-major (tile, row): gate off
    # tile 0/row 1 and tile 1/row 0
    gate = jnp.asarray([1, 0, 0, 1], jnp.int32)
    mask = np.ones((16, 256), np.float32)
    mask[8:, :128] = 0.0                                  # tile 0, row 1
    mask[:8, 128:] = 0.0                                  # tile 1, row 0
    mask = jnp.asarray(mask)

    out_u = fused_mlp_train_rays(packed, od, z, tile_rays=tile, s_rows=8,
                                 interpret=True)
    out_g = fused_mlp_train_rays(packed, od, z, tile_rays=tile, s_rows=8,
                                 interpret=True, gate=gate)
    for u, g in zip(out_u, out_g):
        np.testing.assert_array_equal(np.asarray(g),
                                      np.asarray(u * mask))

    g_g = jax.grad(_kernel_loss)(packed, od, z, cots, tile, gate=gate)
    g_z = jax.grad(_kernel_loss)(packed, od, z, cots * mask[None], tile)
    for nme in g_g:
        np.testing.assert_allclose(np.asarray(g_g[nme]),
                                   np.asarray(g_z[nme]),
                                   rtol=1e-6, atol=1e-6, err_msg=nme)


# ---------------------------------------------------------------------------
# training-render / step level


def _support_for(cfg, params):
    from nerf_pytorch_paeng_tpu.train.precull import (
        make_train_support_program)
    prog, half = make_train_support_program(cfg)
    bc, bf = prog(params)
    assert bool(np.asarray(bc[3][0])), "coarse bounds must be valid"
    assert bool(np.asarray(bf[3][0])), "fine bounds must be valid"
    return (tuple(bc), tuple(bf))


def test_gated_loss_bit_equal_grads_close(compact_model):
    """The contract: gated _loss_and_metrics == ungated, loss bit-equal,
    grads equal up to fp32 sum order — on a compact trained model whose
    bounds are valid, with camera rays that include real misses."""
    from nerf_pytorch_paeng_tpu.eval.frame import _precull_half
    from nerf_pytorch_paeng_tpu.ops.render import (_gated_train_pass,
                                                   train_support_intervals)
    from nerf_pytorch_paeng_tpu.train.step import _loss_and_metrics

    cfg, model, params = compact_model
    support = _support_for(cfg, params)
    half = _precull_half(cfg)
    ro, rd, target = _camera_rays(cfg, 256, jax.random.PRNGKey(4))
    key = jax.random.PRNGKey(5)

    def loss_of(p, sup):
        loss, m = _loss_and_metrics(model, p, ro, rd, target, key, cfg,
                                    support=sup)
        return loss, m

    (l_u, m_u), g_u = jax.value_and_grad(
        lambda p: loss_of(p, None), has_aux=True)(params)
    (l_g, m_g), g_g = jax.value_and_grad(
        lambda p: loss_of(p, (*support, half)), has_aux=True)(params)

    # the machinery must actually gate something on this scene: some ray
    # has samples provably outside the coarse support
    t_lo, t_hi = train_support_intervals(ro, rd, support[0], half,
                                         float(cfg.near), float(cfg.far))
    zs = jnp.linspace(cfg.near, cfg.far, cfg.N_samples_c)
    outside = (zs[None] < np.asarray(t_lo)[:, None]) | (
        zs[None] > np.asarray(t_hi)[:, None])
    assert float(np.mean(np.asarray(outside))) > 0.05

    np.testing.assert_array_equal(np.asarray(l_u), np.asarray(l_g))
    for k in m_u:
        np.testing.assert_array_equal(np.asarray(m_u[k]),
                                      np.asarray(m_g[k]), err_msg=k)
    flat_u, _ = jax.flatten_util.ravel_pytree(g_u)
    flat_g, _ = jax.flatten_util.ravel_pytree(g_g)
    np.testing.assert_allclose(np.asarray(flat_u), np.asarray(flat_g),
                               rtol=1e-5, atol=1e-6)


def test_gated_train_step_trajectory(compact_model):
    """make_train_step(precull=True) replays the ungated trajectory:
    2 optimizer steps from the fitted params, losses bit-equal, updated
    params allclose (grad order only)."""
    import optax

    from nerf_pytorch_paeng_tpu.train.state import TrainState
    from nerf_pytorch_paeng_tpu.train.step import make_train_step

    cfg, model, params = compact_model
    support = _support_for(cfg, params)
    tx = optax.adam(1e-3)
    ro, rd, target = _camera_rays(cfg, 256, jax.random.PRNGKey(6))
    key = jax.random.PRNGKey(7)

    step_u = make_train_step(model, tx, cfg)
    step_g = make_train_step(model, tx, cfg, precull=True)
    st_u = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    st_g = st_u
    for _ in range(2):
        st_u, m_u = step_u(st_u, ro, rd, target, key)
        st_g, m_g = step_g(st_g, ro, rd, target, key, support)
        np.testing.assert_allclose(float(m_u["loss"]), float(m_g["loss"]),
                                   rtol=1e-6)
    flat_u, _ = jax.flatten_util.ravel_pytree(st_u.params)
    flat_g, _ = jax.flatten_util.ravel_pytree(st_g.params)
    np.testing.assert_allclose(np.asarray(flat_u), np.asarray(flat_g),
                               rtol=1e-4, atol=1e-6)


def test_gated_step_on_mesh_matches_ungated_mesh(compact_model):
    """The shard_map DP gated path (make_train_step_for_mesh(precull=True)
    on the 8-device mesh) vs the ungated mesh step at IDENTICAL per-shard
    RNG: loss bit-equal, updated params allclose (the single-device
    comparison would decorrelate the per-shard jitter keys)."""
    import optax

    from nerf_pytorch_paeng_tpu.parallel import make_mesh
    from nerf_pytorch_paeng_tpu.parallel.sharding import (
        commit_replicated, make_train_step_for_mesh)
    from nerf_pytorch_paeng_tpu.train.precull import train_precull_active
    from nerf_pytorch_paeng_tpu.train.state import TrainState

    cfg, model, params = compact_model
    cfg = dataclasses.replace(cfg, N_rays=1024)
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(8, 1)
    assert train_precull_active(cfg, mesh)
    support = _support_for(cfg, params)
    tx = optax.adam(1e-3)
    ro, rd, target = _camera_rays(cfg, 1024, jax.random.PRNGKey(8))
    key = jax.random.PRNGKey(9)

    st0 = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    # independent buffer copies: both mesh steps donate their state arg
    fresh = lambda: commit_replicated(
        jax.tree_util.tree_map(jnp.array, st0), mesh)
    stm = fresh()
    sup_m = commit_replicated(support, mesh)

    step_u = make_train_step_for_mesh(model, tx, cfg, mesh)
    st_u, m_u = step_u(stm, ro, rd, target, key)

    stm2 = fresh()
    step_g = make_train_step_for_mesh(model, tx, cfg, mesh, precull=True)
    st_g, m_g = step_g(stm2, ro, rd, target, key, sup_m)

    np.testing.assert_array_equal(np.asarray(m_u["loss"]),
                                  np.asarray(m_g["loss"]))
    flat_u, _ = jax.flatten_util.ravel_pytree(st_u.params)
    flat_g, _ = jax.flatten_util.ravel_pytree(st_g.params)
    np.testing.assert_allclose(np.asarray(flat_u), np.asarray(flat_g),
                               rtol=1e-4, atol=1e-6)


def test_frustum_union_mask_oracle():
    """Cells holding actual training-ray samples are in the mask
    (superset property — the soundness direction); cells far outside
    every frustum are not (the usefulness direction)."""
    from nerf_pytorch_paeng_tpu.ops.occupancy import frustum_union_mask
    from nerf_pytorch_paeng_tpu.ops.rays import get_rays

    H = W = 16
    _, K, poses = make_synth_scene(n_views=3, H=H, W=W)
    poses34 = np.asarray(poses)[:, :3, :4]
    half, grid = 6.0, 24
    mask = np.asarray(frustum_union_mask(poses34, K, H, W, 2.0, 6.0,
                                         half, grid))
    cell = 2 * half / grid

    def cell_of(p):
        idx = np.floor((p + half) / cell).astype(int)
        return tuple(np.clip(idx, 0, grid - 1))

    rng = np.random.default_rng(0)
    for pose in poses34:
        ro, rd = get_rays(H, W, jnp.asarray(K, jnp.float32),
                          jnp.asarray(pose))
        ro = np.asarray(ro).reshape(-1, 3)
        rd = np.asarray(rd).reshape(-1, 3)
        # adversarial face grazes: border-pixel rays at the depth
        # endpoints (worst case for the metric-margin soundness proof —
        # axis dilation alone provably misses diagonal corner cuts)
        border = [k for k in range(H * W)
                  if k // W in (0, H - 1) or k % W in (0, W - 1)]
        for r in border:
            for t in (2.0, 2.001, 5.999, 6.0):
                p = ro[r] + t * rd[r]
                assert mask[cell_of(p)], (p, t, "border")
        for _ in range(64):
            r = rng.integers(len(ro))
            t = rng.uniform(2.0, 6.0)
            p = ro[r] + t * rd[r]
            assert np.all(np.abs(p) < half), p  # stays in the cube
            assert mask[cell_of(p)], (p, t)

    # cube corners: never visible from origin-orbit cameras at radius 4
    for corner in ([5.7, 5.7, 5.7], [-5.7, -5.7, 5.7], [5.7, -5.7, -5.7]):
        assert not mask[cell_of(np.asarray(corner))], corner


def test_union_masked_bounds_ignore_out_of_frustum_junk():
    """The real-photometric-run failure mode: junk density in
    never-sampled space invalidates global bounds; the union-masked
    bounds stay valid and tight around the in-frustum blob."""
    from nerf_pytorch_paeng_tpu.ops.occupancy import (
        frustum_union_mask, support_bounds_from_sigma)

    H = W = 16
    _, K, poses = make_synth_scene(n_views=3, H=H, W=W)
    half, grid = 6.0, 24

    def sigma_with_junk(xplane):
        blob = 8.0 * jnp.maximum(
            jnp.exp(-jnp.sum(xplane ** 2, 0) / 0.72) - 0.05, 0.0)
        corner = jnp.all(xplane > 5.0, 0).astype(jnp.float32)
        return blob + 3.0 * corner

    lo, hi, rad, valid = support_bounds_from_sigma(sigma_with_junk, half,
                                                   grid=grid)
    assert not bool(valid[0])  # junk reaches the cube boundary

    domain = frustum_union_mask(np.asarray(poses)[:, :3, :4], K, H, W,
                                2.0, 6.0, half, grid)
    lo, hi, rad, valid = support_bounds_from_sigma(
        sigma_with_junk, half, grid=grid, domain_mask=domain)
    assert bool(valid[0])
    # tight around the blob (support radius ~1.7), junk excluded
    assert np.all(np.asarray(hi) < 4.0) and np.all(np.asarray(lo) > -4.0)


def test_support_program_with_poses(compact_model):
    """make_train_support_program with the training camera set: the
    union-masked program yields valid bounds on the compact model, and
    the step builders accept support=None (the driver's invalid-bounds
    fallback) producing the bit-identical ungated step."""
    import optax

    from nerf_pytorch_paeng_tpu.train.precull import (
        make_train_support_program)
    from nerf_pytorch_paeng_tpu.train.state import TrainState
    from nerf_pytorch_paeng_tpu.train.step import make_train_step

    cfg, model, params = compact_model
    H = W = 32
    _, K, poses = make_synth_scene(n_views=2, H=H, W=W)
    prog, _ = make_train_support_program(
        cfg, poses=np.asarray(poses)[:, :3, :4], K=np.asarray(K),
        hw=(H, W))
    bc, bf = prog(params)
    assert bool(np.asarray(bc[3][0])) and bool(np.asarray(bf[3][0]))

    tx = optax.adam(1e-3)
    ro, rd, target = _camera_rays(cfg, 256, jax.random.PRNGKey(11))
    key = jax.random.PRNGKey(12)
    st0 = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    step_u = make_train_step(model, tx, cfg)
    step_g = make_train_step(model, tx, cfg, precull=True)
    _, m_u = step_u(st0, ro, rd, target, key)
    _, m_n = step_g(st0, ro, rd, target, key, None)
    np.testing.assert_array_equal(np.asarray(m_u["loss"]),
                                  np.asarray(m_n["loss"]))
    assert "gate_frac" not in m_n


def test_support_none_through_mesh_step(compact_model):
    """support=None flows through the shard_map gated step (the driver
    falls back this way while bounds are invalid)."""
    import optax

    from nerf_pytorch_paeng_tpu.parallel import make_mesh
    from nerf_pytorch_paeng_tpu.parallel.sharding import (
        commit_replicated, make_train_step_for_mesh)
    from nerf_pytorch_paeng_tpu.train.state import TrainState

    cfg, model, params = compact_model
    cfg = dataclasses.replace(cfg, N_rays=1024)
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(8, 1)
    tx = optax.adam(1e-3)
    ro, rd, target = _camera_rays(cfg, 1024, jax.random.PRNGKey(13))
    st0 = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    # fresh buffer copies: the mesh step donates its state arg, and the
    # module fixture's params must survive for later tests
    stm = commit_replicated(jax.tree_util.tree_map(jnp.array, st0), mesh)
    step_g = make_train_step_for_mesh(model, tx, cfg, mesh, precull=True)
    _, m = step_g(stm, ro, rd, target, jax.random.PRNGKey(14), None)
    assert np.isfinite(float(m["loss"]))


def test_gate_frac_metric(compact_model):
    """The gated step reports the skipped-grid-step fraction."""
    import optax

    from nerf_pytorch_paeng_tpu.train.state import TrainState
    from nerf_pytorch_paeng_tpu.train.step import make_train_step

    cfg, model, params = compact_model
    # small gated tiles so the span-sorted miss rays fill whole gateable
    # tiles (512 rays / tile 128 = 4 tiles)
    cfg = dataclasses.replace(cfg, N_rays=512, train_precull_tile=128)
    support = _support_for(cfg, params)
    tx = optax.adam(1e-3)
    ro, rd, target = _camera_rays(cfg, 512, jax.random.PRNGKey(4))
    # make half the batch provable misses: rays from (4,0,0) sweeping
    # sideways — their [2,6] segments stay inside the half=6 cube but
    # never come closer than 4 to the origin (outside any compact blob's
    # support), so their tiles must gate off entirely
    jit_lat = 0.1 * jax.random.normal(jax.random.PRNGKey(6), (256, 2))
    ro = ro.at[256:].set(jnp.asarray([4.0, 0.0, 0.0]))
    rd = rd.at[256:].set(jnp.stack(
        [jnp.zeros(256), 0.5 + jit_lat[:, 0] * 0.1,
         0.3 + jit_lat[:, 1] * 0.1], -1))
    st0 = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    step_g = make_train_step(model, tx, cfg, precull=True)
    _, m = step_g(st0, ro, rd, target, jax.random.PRNGKey(5), support)
    gf = float(m["gate_frac"])
    assert 0.0 < gf < 1.0, gf


def test_gate_frac_estimator(compact_model):
    """The kernel-free profitability estimator (the driver's fallback
    policy, cfg.train_precull_min_gate): ~0 under full-support or
    invalid bounds, and on a half-provable-miss batch substantial AND a
    floor of the realized gate_frac metric (its fine-pass model spreads
    pdf samples over the whole active interval — a superset of real
    activity; the coarse midpoints differ from a stratified draw only at
    interval-boundary bins)."""
    import optax

    from nerf_pytorch_paeng_tpu.train.precull import (
        make_gate_frac_estimator)
    from nerf_pytorch_paeng_tpu.train.state import TrainState
    from nerf_pytorch_paeng_tpu.train.step import make_train_step

    cfg, model, params = compact_model
    cfg = dataclasses.replace(cfg, N_rays=512, train_precull_tile=128)
    est = make_gate_frac_estimator(cfg)
    support = _support_for(cfg, params)

    # same half-provable-miss construction as test_gate_frac_metric
    ro, rd, target = _camera_rays(cfg, 512, jax.random.PRNGKey(4))
    jit_lat = 0.1 * jax.random.normal(jax.random.PRNGKey(6), (256, 2))
    ro = ro.at[256:].set(jnp.asarray([4.0, 0.0, 0.0]))
    rd = rd.at[256:].set(jnp.stack(
        [jnp.zeros(256), 0.5 + jit_lat[:, 0] * 0.1,
         0.3 + jit_lat[:, 1] * 0.1], -1))
    gf_est = float(est(support[0], support[1], ro, rd))

    tx = optax.adam(1e-3)
    st0 = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    step_g = make_train_step(model, tx, cfg, precull=True)
    _, m = step_g(st0, ro, rd, target, jax.random.PRNGKey(5), support)
    gf_real = float(m["gate_frac"])

    assert gf_est > 0.2, (gf_est, gf_real)
    assert gf_est <= gf_real + 0.05, (gf_est, gf_real)

    # full-cube support: every sample active, nothing to gate
    full = (jnp.full((3,), -6.0), jnp.full((3,), 6.0),
            jnp.asarray([6.0 * np.sqrt(3.0)], jnp.float32),
            jnp.asarray([True]))
    assert float(est(full, full, ro, rd)) == 0.0
    # invalid bounds widen every interval to [near, far]: estimate 0,
    # so the policy falls back ungated on validity alone
    inval = (support[0][0], support[0][1], support[0][2],
             jnp.asarray([False]))
    assert float(est(inval, inval, ro, rd)) == 0.0


def test_driver_gating_policy(tmp_path, compact_model, capsys):
    """Driver-level policy loop (driver.py refresh_support): training
    from scratch the support bounds are invalid (random-init density
    everywhere) -> the loop declares UNGATED and completes; resumed from
    a distilled checkpoint (valid compact bounds) with min_gate 0 the
    refresh flips to GATED and the gated chunked loop trains through.
    This drives the policy in the real CLI loop — the step/kernel-level
    guarantees are pinned by the tests above."""
    import dataclasses

    from nerf_pytorch_paeng_tpu.driver import main_worker
    from nerf_pytorch_paeng_tpu.train.checkpoint import save_checkpoint
    from nerf_pytorch_paeng_tpu.train.state import (TrainState,
                                                    make_optimizer)
    from nerf_pytorch_paeng_tpu.utils.synth import save_as_blender_dataset

    cfg0, model, params = compact_model
    root = str(tmp_path / "data")
    save_as_blender_dataset(root, n_train=3, n_val=1, n_test=1, H=16, W=16)
    cfg = dataclasses.replace(
        cfg0, data_type="blender", data_root=root, data_name="synth",
        exp_name="gated_scratch", log_dir=str(tmp_path / "logs"),
        bkg_white=True, global_batch=True, n_data_shards=1,
        iter_N=12, iter_warmup=2, idx_save=12, idx_test=0, idx_render=0,
        idx_print=0, idx_vis=0, scan_chunk=4,
        train_precull_every=4, train_precull_min_gate=0.0)

    main_worker(cfg)
    out = capsys.readouterr().out
    assert ">> train_precull -> ungated (bounds invalid)" in out
    assert os.path.isdir(os.path.join(cfg.logdir, "gated_scratch",
                                      "gated_scratch_12.ckpt"))

    # resume from a distilled checkpoint: valid bounds + min_gate 0 ->
    # the first refresh flips GATED and the gated loop runs to iter_N
    tx = make_optimizer(cfg)
    state = TrainState(jnp.asarray(12, jnp.int32), params,
                       jax.jit(tx.init)(params))
    cfg2 = dataclasses.replace(cfg, exp_name="gated_resume",
                               iter_start=12, iter_N=24, idx_save=24)
    save_checkpoint(cfg2.logdir, "gated_resume", state)
    main_worker(cfg2)
    out = capsys.readouterr().out
    assert ">> train_precull -> GATED" in out
    assert os.path.isdir(os.path.join(cfg2.logdir, "gated_resume",
                                      "gated_resume_24.ckpt"))


def test_driver_policy_refresh_backoff(tmp_path, compact_model):
    """Consecutive DECLINED refreshes double the probe interval up to
    every * backoff_max (driver.py backoff): training from scratch the
    bounds stay invalid, so with every=2, backoff_max=4, iter_N=30 the
    policy csv must show refreshes exactly at 1, 5, 13, 21, 29 — not the
    15 un-backed-off probes (cuts declining-content probe overhead ~8x
    at the production cadence)."""
    import dataclasses

    from nerf_pytorch_paeng_tpu.driver import main_worker
    from nerf_pytorch_paeng_tpu.utils.synth import save_as_blender_dataset

    cfg0, model, params = compact_model
    root = str(tmp_path / "data")
    save_as_blender_dataset(root, n_train=3, n_val=1, n_test=1, H=16, W=16)
    cfg = dataclasses.replace(
        cfg0, data_type="blender", data_root=root, data_name="synth",
        exp_name="backoff", log_dir=str(tmp_path / "logs"),
        bkg_white=True, global_batch=True, n_data_shards=1,
        iter_N=30, iter_warmup=2, idx_save=30, idx_test=0, idx_render=0,
        idx_print=0, idx_vis=0, scan_chunk=4,
        train_precull_every=2, train_precull_backoff_max=4,
        train_precull_min_gate=0.0)
    main_worker(cfg)
    lines = open(os.path.join(cfg.logdir, "backoff",
                              "precull_policy.csv")).read().splitlines()
    iters = [int(l.split(",")[0]) for l in lines[1:]]
    assert iters == [1, 5, 13, 21, 29], iters
    assert all(l.split(",")[3] == "0" for l in lines[1:])  # all declined


def test_train_gate_tile_divisor():
    """The gated kernels require tile % 128 == 0 AND n % tile == 0; a
    config-validated override like 384 satisfies neither after naive
    halving (384 -> 192 -> 96) — the tile picker must return the largest
    conforming divisor instead of crashing the step at trace time."""
    from nerf_pytorch_paeng_tpu.ops.render import train_gate_tile

    for req, n, want in ((384, 4096, 256), (640, 4096, 512),
                         (512, 4096, 512), (0, 4096, 512),
                         (512, 256, 256), (2048, 384, 384),
                         (128, 4096, 128), (512, 640, 128)):
        got = train_gate_tile(_cfg(train_precull_tile=req), n, 2048)
        assert got == want, (req, n, got, want)
        assert got % 128 == 0 and n % got == 0

    # negative overrides no longer pass config validation
    with pytest.raises(AssertionError):
        _cfg(train_precull_tile=-128).validate()


def test_train_precull_enabled_gates():
    from nerf_pytorch_paeng_tpu.train.precull import train_precull_enabled

    assert train_precull_enabled(_cfg())
    assert not train_precull_enabled(_cfg(train_precull=False))
    assert not train_precull_enabled(_cfg(data_type="llff"))
    assert not train_precull_enabled(_cfg(use_pallas=False))
    assert not train_precull_enabled(_cfg(use_rays_train=False))
    assert not train_precull_enabled(_cfg(N_samples_c=4, N_samples_f=4))
    # grid 0 = auto = disabled off-TPU
    assert not train_precull_enabled(_cfg(render_precull_grid=0))


def test_train_precull_mode_tristate():
    """'auto' is the default and behaves like on for enablement (policy-
    guarded at runtime); explicit bools/strings normalize; only 'off'
    disables (round-4 VERDICT #3: default flipped to policy-guarded)."""
    from nerf_pytorch_paeng_tpu.train.precull import (train_precull_enabled,
                                                      train_precull_mode)
    assert NerfConfig().train_precull == "auto"
    assert train_precull_mode(NerfConfig()) == "auto"
    for v, want in ((True, "on"), (False, "off"), ("auto", "auto"),
                    ("on", "on"), ("off", "off"), ("true", "on"),
                    ("0", "off")):
        assert train_precull_mode(_cfg(train_precull=v)) == want, v
    assert train_precull_enabled(_cfg(train_precull="auto"))
    assert not train_precull_enabled(_cfg(train_precull="off"))
