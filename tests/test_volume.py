import jax.numpy as jnp
import numpy as np

from nerf_pytorch_paeng_tpu.ops.volume import (
    exclusive_cumprod, volume_render)


def np_volume_render(raw, z_vals, rays_d):
    """Independent numpy oracle for the compositing math."""
    dists = np.diff(z_vals, axis=-1)
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * np.linalg.norm(rays_d[..., None, :], axis=-1)
    rgb = 1.0 / (1.0 + np.exp(-raw[..., :3]))
    sigma = np.maximum(raw[..., 3], 0.0)
    alpha = 1.0 - np.exp(-sigma * dists)
    ones = np.ones_like(alpha[..., :1])
    trans = np.cumprod(np.concatenate([ones, 1 - alpha + 1e-10], -1),
                       -1)[..., :-1]
    w = alpha * trans
    rgb_map = (w[..., None] * rgb).sum(-2)
    depth = (w * z_vals).sum(-1)
    acc = w.sum(-1)
    rgb_map = rgb_map + (1.0 - acc[..., None])
    return rgb_map, acc, w, depth


def rand_inputs(seed=0, N=8, S=16):
    rng = np.random.default_rng(seed)
    raw = rng.normal(size=(N, S, 4)).astype(np.float32)
    z = np.sort(rng.uniform(2, 6, size=(N, S)).astype(np.float32), -1)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    return raw, z, d


def test_matches_oracle():
    raw, z, d = rand_inputs()
    out = volume_render(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d))
    rgb, acc, w, depth = np_volume_render(raw, z, d)
    np.testing.assert_allclose(np.asarray(out.rgb), rgb, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.acc), acc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.weights), w, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), depth, rtol=1e-4,
                               atol=1e-5)


def test_empty_ray_is_white_background():
    # σ=0 everywhere -> alpha 0 -> acc 0 -> rgb = 1 (white), disp = 0
    N, S = 4, 8
    raw = np.zeros((N, S, 4), np.float32)
    raw[..., 3] = -5.0  # relu -> 0 density
    z = np.broadcast_to(np.linspace(2, 6, S, dtype=np.float32), (N, S)).copy()
    d = np.tile(np.array([[0, 0, -1.0]], np.float32), (N, 1))
    out = volume_render(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(out.rgb), np.ones((N, 3)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.acc), np.zeros(N), atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.disp), np.zeros(N), atol=1e-7)
    assert not np.isnan(np.asarray(out.disp)).any()


def test_single_opaque_sample():
    # one huge density at sample k -> that sample's sigmoid color wins
    N, S, k = 2, 8, 3
    raw = np.zeros((N, S, 4), np.float32)
    raw[..., 3] = -10.0
    raw[:, k, 3] = 1e8          # opaque
    raw[:, k, :3] = [2.0, -2.0, 0.0]
    z = np.broadcast_to(np.linspace(2, 6, S, dtype=np.float32), (N, S)).copy()
    d = np.tile(np.array([[0, 0, -1.0]], np.float32), (N, 1))
    out = volume_render(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d))
    want = 1 / (1 + np.exp(-np.array([2.0, -2.0, 0.0])))
    np.testing.assert_allclose(np.asarray(out.rgb[0]), want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.acc), np.ones(N), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth[0]), z[0, k], atol=1e-5)


def test_disp_clamped():
    # very shallow depth -> disparity hits the 5.0 clamp
    N, S = 1, 4
    raw = np.zeros((N, S, 4), np.float32)
    raw[..., 3] = 1e8
    raw[..., :3] = 0.0
    z = np.array([[0.01, 0.02, 0.03, 0.04]], np.float32)
    d = np.array([[0, 0, -1.0]], np.float32)
    out = volume_render(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(out.disp), [5.0], atol=1e-6)


def test_associative_scan_matches_cumprod():
    raw, z, d = rand_inputs(seed=7, N=16, S=32)
    a = volume_render(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d),
                      scan_impl="cumprod")
    b = volume_render(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d),
                      scan_impl="associative")
    np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.weights), np.asarray(b.weights),
                               rtol=1e-4, atol=1e-5)


def test_exclusive_cumprod_basic():
    x = jnp.asarray(np.array([[2.0, 3.0, 4.0]], np.float32))
    got = np.asarray(exclusive_cumprod(x))
    np.testing.assert_allclose(got, [[1.0, 2.0, 6.0]], rtol=1e-6)


def test_disp_near_empty_ray_matches_reference_formula():
    """0 < acc << 1e-10 (denormal-faint ray): the reference computes
    disp = 1/max(1e-10, depth/acc) = 1/mean_depth — flooring acc before
    the divide (an earlier refactor) silently clamped these rays to
    DISP_CLAMP instead.  The regime is unreachable through the f32
    1-exp(-sigma*dist) alpha (alphas below ~6e-8 round to 0), so the
    helper is tested directly against the reference formula."""
    import numpy as np
    import jax.numpy as jnp
    from nerf_pytorch_paeng_tpu.ops.volume import DISP_CLAMP, _disp_from

    acc = jnp.asarray([0.0, 5e-21, 1e-7, 0.5, 1.0])
    depth = jnp.asarray([0.0, 2e-20, 4e-7, 2.0, 0.05])

    def ref(depth, acc):                     # nerf_process.py:124-134
        with np.errstate(invalid="ignore", divide="ignore"):
            disp = 1.0 / np.maximum(1e-10, depth / acc)
        disp = np.where(np.isnan(disp), 0.0, disp)
        return np.minimum(disp, DISP_CLAMP)

    got = np.asarray(_disp_from(depth, acc))
    want = ref(np.asarray(depth), np.asarray(acc))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got[1] == 0.25                    # not clamped to DISP_CLAMP
