import jax
import jax.numpy as jnp
import numpy as np

from nerf_pytorch_paeng_tpu.ops.rays import (
    gather_rays, get_rays, get_rays_batched, ndc_rays, sample_pixels)


def np_get_rays(H, W, K, c2w):
    """Independent numpy oracle for pinhole ray generation."""
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    dirs = np.stack([(i - K[0][2]) / K[0][0],
                     -(j - K[1][2]) / K[1][1],
                     -np.ones_like(i)], -1)
    rays_d = np.einsum("hwc,rc->hwr", dirs, c2w[:3, :3])
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def make_camera(H=12, W=16, focal=20.0, seed=0):
    rng = np.random.default_rng(seed)
    K = np.array([[focal, 0, W * 0.5], [0, focal, H * 0.5], [0, 0, 1]],
                 np.float32)
    # random rotation via QR + translation
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    c2w = np.concatenate([q.astype(np.float32),
                          rng.normal(size=(3, 1)).astype(np.float32)], 1)
    return K, c2w


def test_get_rays_matches_oracle():
    H, W = 12, 16
    K, c2w = make_camera(H, W)
    ro, rd = get_rays(H, W, jnp.asarray(K), jnp.asarray(c2w))
    ro_np, rd_np = np_get_rays(H, W, K, c2w)
    np.testing.assert_allclose(np.asarray(ro), ro_np, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd), rd_np, rtol=1e-5, atol=1e-5)


def test_center_pixel_looks_down_minus_z():
    H = W = 10
    K = np.array([[10.0, 0, 5.0], [0, 10.0, 5.0], [0, 0, 1]], np.float32)
    c2w = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)
    _, rd = get_rays(H, W, jnp.asarray(K), jnp.asarray(c2w))
    np.testing.assert_allclose(np.asarray(rd[5, 5]), [0, 0, -1], atol=1e-6)


def test_batched_matches_single():
    H, W = 8, 9
    K, c2w0 = make_camera(H, W, seed=1)
    _, c2w1 = make_camera(H, W, seed=2)
    c2ws = jnp.stack([jnp.asarray(c2w0), jnp.asarray(c2w1)])
    ro_b, rd_b = get_rays_batched(H, W, jnp.asarray(K), c2ws)
    ro0, rd0 = get_rays(H, W, jnp.asarray(K), jnp.asarray(c2w1))
    np.testing.assert_allclose(np.asarray(rd_b[1]), np.asarray(rd0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ro_b[1]), np.asarray(ro0), rtol=1e-6)


def np_ndc(H, W, focal, near, rays_o, rays_d):
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d
    o0 = -1. / (W / (2. * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1. / (H / (2. * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1. + 2. * near / rays_o[..., 2]
    d0 = -1. / (W / (2. * focal)) * (rays_d[..., 0] / rays_d[..., 2]
                                     - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1. / (H / (2. * focal)) * (rays_d[..., 1] / rays_d[..., 2]
                                     - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2. * near / rays_o[..., 2]
    return np.stack([o0, o1, o2], -1), np.stack([d0, d1, d2], -1)


def test_ndc_matches_oracle():
    rng = np.random.default_rng(3)
    n = 64
    rays_o = rng.normal(size=(n, 3)).astype(np.float32)
    rays_d = rng.normal(size=(n, 3)).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.5   # forward-facing
    rays_o[:, 2] = -np.abs(rays_o[:, 2]) - 2.0
    got_o, got_d = ndc_rays(8, 10, 12.0, 1.0,
                            jnp.asarray(rays_o), jnp.asarray(rays_d))
    want_o, want_d = np_ndc(8, 10, 12.0, 1.0, rays_o, rays_d)
    np.testing.assert_allclose(np.asarray(got_o), want_o, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-4, atol=1e-4)


def test_sample_pixels_unique_and_in_bounds():
    key = jax.random.PRNGKey(0)
    H, W, n = 20, 30, 128
    coords = np.asarray(sample_pixels(key, H, W, n))
    assert coords.shape == (n, 2)
    assert coords[:, 0].min() >= 0 and coords[:, 0].max() < H
    assert coords[:, 1].min() >= 0 and coords[:, 1].max() < W
    flat = coords[:, 0] * W + coords[:, 1]
    assert len(np.unique(flat)) == n  # without replacement


def test_sample_pixels_precrop_region():
    key = jax.random.PRNGKey(1)
    H = W = 16
    coords = np.asarray(sample_pixels(key, H, W, 32, precrop=True,
                                      precrop_frac=0.5))
    # center crop: rows/cols in [H//2 - dH, H//2 + dH), dH = 4
    assert coords[:, 0].min() >= 4 and coords[:, 0].max() < 12
    assert coords[:, 1].min() >= 4 and coords[:, 1].max() < 12


def test_gather_rays():
    H, W = 4, 5
    ro = jnp.arange(H * W * 3, dtype=jnp.float32).reshape(H, W, 3)
    coords = jnp.array([[0, 0], [3, 4]], jnp.int32)
    o, d, px = gather_rays(ro, ro * 2, ro * 3, coords)
    np.testing.assert_allclose(np.asarray(o[1]), np.asarray(ro[3, 4]))
    np.testing.assert_allclose(np.asarray(d[0]), np.asarray(ro[0, 0] * 2))
    np.testing.assert_allclose(np.asarray(px[1]), np.asarray(ro[3, 4] * 3))
