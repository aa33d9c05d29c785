import functools

import jax
import jax.numpy as jnp
import numpy as np

from nerf_pytorch_paeng_tpu.config import NerfConfig
from nerf_pytorch_paeng_tpu.models import NeRF, init_nerf
from nerf_pytorch_paeng_tpu.ops.render import (
    render_frame, render_rays, render_rays_from_cfg)


def small_cfg(**kw):
    base = dict(netDepth=2, netWidth=32, L_x=4, L_d=2, N_samples_c=8,
                N_samples_f=16, near=2.0, far=6.0, compute_dtype="float32",
                chunk_rays=16)
    base.update(kw)
    return NerfConfig(**base)


def make_fns(cfg, key=0):
    from nerf_pytorch_paeng_tpu.ops.render import make_xla_field_fns
    model, params = init_nerf(cfg, jax.random.PRNGKey(key))
    return make_xla_field_fns(model, params, cfg)


def rand_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_render_rays_shapes():
    cfg = small_cfg()
    coarse, fine = make_fns(cfg)
    o, d = rand_rays(24)
    out = render_rays_from_cfg(coarse, fine, o, d, jax.random.PRNGKey(0), cfg)
    assert out.rgb_c.shape == (24, 3)
    assert out.rgb_f.shape == (24, 3)
    assert out.disp_c.shape == (24,)
    assert out.disp_f.shape == (24,)
    assert not np.isnan(np.asarray(out.rgb_f)).any()


def test_render_rays_coarse_only():
    cfg = small_cfg(N_samples_f=0)
    coarse, fine = make_fns(cfg)
    o, d = rand_rays(8)
    out = render_rays_from_cfg(coarse, fine, o, d, jax.random.PRNGKey(0), cfg)
    assert out.rgb_c.shape == (8, 3)
    assert out.rgb_f is None and out.disp_f is None


def test_render_rays_jits():
    cfg = small_cfg()
    coarse, fine = make_fns(cfg)
    o, d = rand_rays(16)
    f = jax.jit(functools.partial(render_rays_from_cfg, coarse, fine, cfg=cfg))
    out = f(o, d, jax.random.PRNGKey(0))
    out2 = render_rays_from_cfg(coarse, fine, o, d, jax.random.PRNGKey(0), cfg)
    np.testing.assert_allclose(np.asarray(out.rgb_f), np.asarray(out2.rgb_f),
                               rtol=1e-5, atol=1e-5)


def test_render_frame_matches_unblocked_and_pads():
    cfg = small_cfg(chunk_rays=16)
    coarse, fine = make_fns(cfg)
    o, d = rand_rays(40)  # 40 = 2.5 blocks -> exercises padding
    key = jax.random.PRNGKey(3)
    out = render_frame(coarse, fine, o, d, key, cfg, stratified=False)
    assert out.rgb_f.shape == (40, 3)
    # deterministic path: blocked result equals direct per-block renders
    keys = jax.random.split(key, 3)
    direct = render_rays_from_cfg(
        coarse, fine, o[:16], d[:16], keys[0], cfg, stratified=False)
    np.testing.assert_allclose(np.asarray(out.rgb_f[:16]),
                               np.asarray(direct.rgb_f), rtol=1e-4, atol=1e-5)


def test_fine_sampling_concentrates_where_density_is():
    """End-to-end sanity: with perturb=0 the fine z's must interleave the
    coarse z's (sorted merge is monotonic)."""
    cfg = small_cfg()
    coarse, fine = make_fns(cfg)
    o, d = rand_rays(4)
    out = render_rays(
        coarse, fine, o, d, jax.random.PRNGKey(0),
        near=2.0, far=6.0, n_coarse=8, n_fine=16,
        perturb=0.0, stratified=False)
    assert out.rgb_f.shape == (4, 3)
