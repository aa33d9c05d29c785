"""Sample-axis (SP-analog) sharding: the per-ray sample dimension split
over a mesh axis, with the transmittance as a distributed log-space prefix
sum (parallel/sp.py).  Equality vs the unsharded volume render certifies
the collective stitching (ppermute bin edge, all_gather prefix, psum)."""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_pytorch_paeng_tpu.config import NerfConfig
from nerf_pytorch_paeng_tpu.models import init_nerf
from nerf_pytorch_paeng_tpu.ops.render import make_xla_field_fns
from nerf_pytorch_paeng_tpu.ops.sampling import stratified_z_vals
from nerf_pytorch_paeng_tpu.ops.volume import volume_render_planar
from nerf_pytorch_paeng_tpu.parallel import make_mesh
from nerf_pytorch_paeng_tpu.parallel.sp import (composite_sample_sharded,
                                                make_sample_sharded_render)


def _setup(n_rays=32, n_samples=64):
    cfg = NerfConfig(netDepth=2, netWidth=32, L_x=4, L_d=2,
                     N_samples_c=n_samples, N_samples_f=0, near=2.0, far=6.0,
                     compute_dtype="float32", use_pallas=False)
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))
    coarse_fn, _ = make_xla_field_fns(model, params, cfg)
    rng = np.random.default_rng(3)
    rays_o = jnp.asarray(rng.normal(size=(n_rays, 3)).astype(np.float32))
    rays_d = jnp.asarray(rng.normal(size=(n_rays, 3)).astype(np.float32))
    z_vals = stratified_z_vals(jax.random.PRNGKey(1), n_rays, 2.0, 6.0,
                               n_samples, perturb=True)
    return cfg, coarse_fn, rays_o, rays_d, z_vals


def _unsharded(coarse_fn, rays_o, rays_d, z_vals):
    n, s = z_vals.shape
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    xp = (rays_o.T[:, :, None]
          + rays_d.T[:, :, None] * z_vals[None]).reshape(3, -1)
    dp = jnp.broadcast_to(viewdirs.T[:, :, None], (3, n, s)).reshape(3, -1)
    raw = coarse_fn(xp, dp).reshape(4, n, s)
    return volume_render_planar(raw, z_vals, rays_d)


def test_sample_sharded_render_matches_unsharded():
    """Full render (field eval + composite) with 64 samples split 8 ways
    over the 'model' axis equals the single-device render."""
    cfg, coarse_fn, rays_o, rays_d, z_vals = _setup()
    want = _unsharded(coarse_fn, rays_o, rays_d, z_vals)

    mesh = make_mesh(1, 8)   # all 8 devices on the model (sample) axis
    render = make_sample_sharded_render(coarse_fn, mesh)
    rgb, disp, acc = render(rays_o, rays_d, z_vals)

    np.testing.assert_allclose(np.asarray(rgb), np.asarray(want.rgb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(want.disp),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(want.acc),
                               rtol=1e-4, atol=1e-5)


def test_composite_sample_sharded_weights_slices():
    """The per-shard local weights are exactly the corresponding slice of
    the unsharded weights (the scan reformulation is exact, not just the
    reductions)."""
    cfg, coarse_fn, rays_o, rays_d, z_vals = _setup(n_rays=16, n_samples=32)
    n, s = z_vals.shape
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    xp = (rays_o.T[:, :, None]
          + rays_d.T[:, :, None] * z_vals[None]).reshape(3, -1)
    dp = jnp.broadcast_to(viewdirs.T[:, :, None], (3, n, s)).reshape(3, -1)
    raw = coarse_fn(xp, dp).reshape(4, n, s)
    want = volume_render_planar(raw, z_vals, rays_d)

    from jax.sharding import PartitionSpec as P

    from nerf_pytorch_paeng_tpu.ops.volume import RenderOutputs
    mesh = make_mesh(1, 8)
    sm = jax.jit(jax.shard_map(
        lambda r, z, d: composite_sample_sharded(r, z, d, "model"),
        mesh=mesh,
        in_specs=(P(None, None, "model"), P(None, "model"), P()),
        out_specs=RenderOutputs(P(), P(), P(), P(None, "model"), P()),
        check_vma=False))
    got = sm(raw, z_vals, rays_d)
    np.testing.assert_allclose(np.asarray(got.weights),
                               np.asarray(want.weights),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.rgb), np.asarray(want.rgb),
                               rtol=1e-4, atol=1e-5)


def test_sample_sharded_full_width_coarse_fine():
    """The FULL pipeline at the reference architecture (8x256) — coarse
    pass, gathered-weights hierarchical resample, fine pass — sample-axis
    sharded 8 ways, equals the unsharded coarse+fine render at the same
    key (round-2 VERDICT item 7: full width, fine pass included)."""
    from nerf_pytorch_paeng_tpu.ops.render import render_rays
    from nerf_pytorch_paeng_tpu.parallel.sp import (
        make_sample_sharded_render_full)

    cfg = NerfConfig(netDepth=8, netWidth=256, L_x=10, L_d=4,
                     N_samples_c=16, N_samples_f=16, near=2.0, far=6.0,
                     compute_dtype="float32", use_pallas=False, perturb=0.0)
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))
    coarse_fn, fine_fn = make_xla_field_fns(model, params, cfg)
    rng = np.random.default_rng(5)
    n_rays = 16
    rays_o = jnp.asarray(rng.normal(size=(n_rays, 3)).astype(np.float32))
    rays_d = jnp.asarray(rng.normal(size=(n_rays, 3)).astype(np.float32))
    z_vals = stratified_z_vals(jax.random.PRNGKey(1), n_rays, 2.0, 6.0,
                               cfg.N_samples_c, perturb=False)
    key_f = jax.random.PRNGKey(2)

    # unsharded oracle: identical pipeline (sigma-free coarse composite,
    # hierarchical fine) via ops.render on the same depths/key
    from nerf_pytorch_paeng_tpu.ops.render import hierarchical_fine_pass
    from nerf_pytorch_paeng_tpu.ops.volume import volume_render_planar
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    xp = (rays_o.T[:, :, None]
          + rays_d.T[:, :, None] * z_vals[None]).reshape(3, -1)
    dp = jnp.broadcast_to(viewdirs.T[:, :, None],
                          (3, n_rays, cfg.N_samples_c)).reshape(3, -1)
    raw_c = coarse_fn(xp, dp).reshape(4, n_rays, cfg.N_samples_c)
    out_c = volume_render_planar(raw_c, z_vals, rays_d)
    out_f = hierarchical_fine_pass(fine_fn, rays_o, rays_d, z_vals,
                                   out_c.weights, key_f,
                                   n_fine=cfg.N_samples_f, perturb=0.0)

    mesh = make_mesh(1, 8)
    render = make_sample_sharded_render_full(
        coarse_fn, fine_fn, mesh, n_fine=cfg.N_samples_f, perturb=0.0)
    rgb_c, rgb_f, disp_f, acc_f = render(rays_o, rays_d, z_vals, key_f)

    np.testing.assert_allclose(np.asarray(rgb_c), np.asarray(out_c.rgb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(out_f.rgb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(disp_f), np.asarray(out_f.disp),
                               rtol=1e-4, atol=1e-4)
    # acc: the log-space distributed scan reorders the product slightly
    np.testing.assert_allclose(np.asarray(acc_f), np.asarray(out_f.acc),
                               rtol=1e-3, atol=1e-4)


def test_sp_frame_renderer_dp_x_sp_mesh():
    """sp_shards on a 2(data)x4(model) mesh: rays shard over 'data' AND
    samples over 'model'; pixels must still match the dense renderer."""
    import dataclasses

    from nerf_pytorch_paeng_tpu.eval.frame import make_frame_renderer
    from nerf_pytorch_paeng_tpu.utils.synth import make_synth_scene

    cfg = NerfConfig(netDepth=2, netWidth=32, L_x=4, L_d=2,
                     N_samples_c=8, N_samples_f=8, near=2.0, far=6.0,
                     compute_dtype="float32", use_pallas=False, perturb=0.0,
                     render_cull="none")
    H = W = 8
    _, K, poses = make_synth_scene(n_views=1, H=H, W=W)
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))
    c2w = jnp.asarray(poses[0][:3, :4])
    key = jax.random.PRNGKey(4)

    dense = make_frame_renderer(model, cfg, H, W, K, stratified=False)
    rgb_d, _ = dense(params, c2w, key)

    mesh = make_mesh(2, 4)
    cfg_sp = dataclasses.replace(cfg, sp_shards=4, n_model_shards=4,
                                 n_data_shards=2)
    sp = make_frame_renderer(model, cfg_sp, H, W, K, mesh=mesh,
                             stratified=False)
    rgb_s, _ = sp(params, c2w, key)
    np.testing.assert_allclose(np.asarray(rgb_s), np.asarray(rgb_d),
                               rtol=1e-4, atol=1e-5)


def test_sp_frame_renderer_matches_dense():
    """cfg.sp_shards routes the production frame renderer through the
    sample-sharded composite; pixels must match the dense renderer."""
    import dataclasses

    from nerf_pytorch_paeng_tpu.eval.frame import make_frame_renderer
    from nerf_pytorch_paeng_tpu.utils.synth import make_synth_scene

    cfg = NerfConfig(netDepth=2, netWidth=32, L_x=4, L_d=2,
                     N_samples_c=16, N_samples_f=16, near=2.0, far=6.0,
                     compute_dtype="float32", use_pallas=False, perturb=0.0,
                     render_cull="none")
    H = W = 8
    _, K, poses = make_synth_scene(n_views=1, H=H, W=W)
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))
    c2w = jnp.asarray(poses[0][:3, :4])
    key = jax.random.PRNGKey(3)

    dense = make_frame_renderer(model, cfg, H, W, K, stratified=False)
    rgb_d, disp_d = dense(params, c2w, key)

    mesh = make_mesh(1, 8)
    cfg_sp = dataclasses.replace(cfg, sp_shards=8, n_model_shards=8)
    sp = make_frame_renderer(model, cfg_sp, H, W, K, mesh=mesh,
                             stratified=False)
    rgb_s, disp_s = sp(params, c2w, key)
    np.testing.assert_allclose(np.asarray(rgb_s), np.asarray(rgb_d),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(disp_s), np.asarray(disp_d),
                               rtol=1e-4, atol=1e-4)
