"""Multi-device frame rendering (shard_map over rays) on the CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_pytorch_paeng_tpu.config import NerfConfig
from nerf_pytorch_paeng_tpu.eval.frame import make_frame_renderer
from nerf_pytorch_paeng_tpu.models import init_nerf
from nerf_pytorch_paeng_tpu.parallel import make_mesh
from nerf_pytorch_paeng_tpu.utils.synth import make_synth_scene


def _setup(use_pallas):
    if use_pallas:
        cfg = NerfConfig(netDepth=8, netWidth=256, L_x=10, L_d=4,
                         N_samples_c=4, N_samples_f=4, near=2.0, far=6.0,
                         chunk_rays=32, use_pallas=True)
    else:
        cfg = NerfConfig(netDepth=2, netWidth=32, L_x=4, L_d=2,
                         N_samples_c=8, N_samples_f=8, near=2.0, far=6.0,
                         chunk_rays=32, use_pallas=False, perturb=0.0,
                         compute_dtype="float32")
    imgs, K, poses = make_synth_scene(n_views=1, H=8, W=8)
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))
    return cfg, model, params, K, poses


def test_sharded_frame_matches_single_device_xla():
    cfg, model, params, K, poses = _setup(use_pallas=False)
    c2w = jnp.asarray(poses[0][:3, :4])
    key = jax.random.PRNGKey(1)
    single = make_frame_renderer(model, cfg, 8, 8, K, stratified=False)
    rgb1, disp1 = single(params, c2w, key)
    mesh = make_mesh(8, 1)
    sharded = make_frame_renderer(model, cfg, 8, 8, K, mesh=mesh,
                                  stratified=False)
    rgb8, disp8 = sharded(params, c2w, key)
    assert rgb8.shape == (8, 8, 3)
    # same key + deterministic sampling -> identical pixels
    np.testing.assert_allclose(np.asarray(rgb8), np.asarray(rgb1),
                               rtol=1e-4, atol=1e-5)


def test_sharded_frame_pallas_runs():
    cfg, model, params, K, poses = _setup(use_pallas=True)
    mesh = make_mesh(8, 1)
    sharded = make_frame_renderer(model, cfg, 8, 8, K, mesh=mesh,
                                  stratified=False)
    rgb, disp = sharded(params, jnp.asarray(poses[0][:3, :4]),
                        jax.random.PRNGKey(1))
    assert rgb.shape == (8, 8, 3)
    assert np.isfinite(np.asarray(rgb)).all()
