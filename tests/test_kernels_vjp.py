"""Custom-VJP fused MLP vs XLA autodiff through the flax model (interpret)."""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_pytorch_paeng_tpu.config import NerfConfig
from nerf_pytorch_paeng_tpu.kernels.fused_mlp import pack_nerf_mlp_params
from nerf_pytorch_paeng_tpu.kernels.fused_mlp_vjp import fused_mlp_train
from nerf_pytorch_paeng_tpu.models import NeRF, init_nerf
from nerf_pytorch_paeng_tpu.ops.posenc import positional_encoding


def setup(n_pts=512, seed=1):
    cfg = NerfConfig(compute_dtype="float32")
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-2, 2, size=(n_pts, 3)).astype(np.float32)
    dirs = rng.normal(size=(n_pts, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    tgt = rng.uniform(size=(n_pts, 4)).astype(np.float32)
    return model, params, jnp.asarray(pts), jnp.asarray(dirs), jnp.asarray(tgt)


def flax_loss(model, mlp_params, pts, dirs, tgt):
    emb = jnp.concatenate([positional_encoding(pts, 10),
                           positional_encoding(dirs, 4)], -1)
    raw = model.apply({"params": {"coarse": mlp_params,
                                  "fine": mlp_params}}, emb,
                      method=NeRF.fine_fwd)
    return jnp.mean((raw - tgt) ** 2)


def fused_loss(mlp_params, pts, dirs, tgt, tile):
    packed = pack_nerf_mlp_params(mlp_params)
    raw = fused_mlp_train(packed, pts.T, dirs.T, tile=tile,
                          interpret=True)[:4].T
    return jnp.mean((raw - tgt) ** 2)


def test_fused_grads_match_flax():
    """bf16 kernel grads vs fp32 XLA autodiff: relative L2 error stays in
    the bf16-accumulation regime and the direction is essentially exact."""
    model, params, pts, dirs, tgt = setup(512)
    mlp = params["fine"]
    g_ref = jax.grad(lambda p: flax_loss(model, p, pts, dirs, tgt))(mlp)
    g_fused = jax.grad(lambda p: fused_loss(p, pts, dirs, tgt, 512))(mlp)

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = dict(jax.tree_util.tree_leaves_with_path(g_fused))
    checked = 0
    for path, ref in flat_ref:
        got = np.asarray(flat_fused[path])
        ref = np.asarray(ref)
        rel_l2 = (np.linalg.norm(got - ref)
                  / (np.linalg.norm(ref) + 1e-12))
        # trunk_0's gradient is ~50x smaller than the heads', so the bf16
        # noise accumulated through 10 matmuls is relatively larger there
        # (relL2 ~0.10, cos ~0.995) — the expected bf16-backprop regime.
        assert rel_l2 < 0.15, (jax.tree_util.keystr(path), rel_l2)
        cos = float((got * ref).sum()
                    / (np.linalg.norm(got) * np.linalg.norm(ref) + 1e-12))
        assert cos > 0.99, (jax.tree_util.keystr(path), cos)
        checked += 1
    assert checked == 24  # 12 flax layers x (kernel + bias)


def test_fused_grads_accumulate_across_tiles():
    """Multi-tile grid must give the same grads as single-tile."""
    model, params, pts, dirs, tgt = setup(512)
    mlp = params["fine"]
    g1 = jax.grad(lambda p: fused_loss(p, pts, dirs, tgt, 512))(mlp)
    g4 = jax.grad(lambda p: fused_loss(p, pts, dirs, tgt, 128))(mlp)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-6)


def test_fused_value_matches_eval_kernel():
    model, params, pts, dirs, tgt = setup(256)
    mlp = params["fine"]
    v_fused = float(fused_loss(mlp, pts, dirs, tgt, 256))
    v_flax = float(flax_loss(model, mlp, pts, dirs, tgt))
    np.testing.assert_allclose(v_fused, v_flax, rtol=2e-2)


# ---- ray-major training pair ---------------------------------------------

def rays_setup(n_rays=64, s=16, seed=3):
    cfg = NerfConfig(compute_dtype="float32")
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    od = jnp.asarray(np.concatenate([o.T, d.T, np.zeros((2, n_rays),
                                                        np.float32)], 0))
    z_t = jnp.asarray(np.sort(
        rng.uniform(2.0, 6.0, size=(s, n_rays)).astype(np.float32), 0))
    tgt = jnp.asarray(rng.uniform(size=(4, s, n_rays)).astype(np.float32))
    return model, params, o, d, od, z_t, tgt


def rays_loss(mlp_params, od, z_t, tgt, tile):
    from nerf_pytorch_paeng_tpu.kernels.fused_mlp_vjp import \
        fused_mlp_train_rays
    packed = pack_nerf_mlp_params(mlp_params)
    r, g, b, sg = fused_mlp_train_rays(packed, od, z_t, tile_rays=tile,
                                       interpret=True)
    out = jnp.stack([r, g, b, sg], 0)
    return jnp.mean((out - tgt) ** 2)


def plane_loss_from_rays(model, mlp_params, o, d, z_t, tgt):
    """The same loss through the flax model on the equivalent flat points."""
    s, n = z_t.shape
    z = np.asarray(z_t)
    pts = (o[None, :, :] + d[None, :, :] * z[:, :, None]).reshape(-1, 3)
    vd = d / np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = np.broadcast_to(vd[None], (s, n, 3)).reshape(-1, 3)
    emb = jnp.concatenate(
        [positional_encoding(jnp.asarray(pts), 10),
         positional_encoding(jnp.asarray(dirs), 4)], -1)
    raw = model.apply({"params": {"coarse": mlp_params,
                                  "fine": mlp_params}}, emb,
                      method=NeRF.fine_fwd)        # [s*n, 4]
    out = raw.reshape(s, n, 4).transpose(2, 0, 1)  # [4, s, n]
    return jnp.mean((out - tgt) ** 2)


def test_rays_train_grads_match_flax():
    """The ray-major custom-VJP pair vs fp32 XLA autodiff through the flax
    model on the equivalent flat point set."""
    model, params, o, d, od, z_t, tgt = rays_setup()
    mlp = params["fine"]
    g_ref = jax.grad(
        lambda p: plane_loss_from_rays(model, p, o, d, z_t, tgt))(mlp)
    g_rays = jax.grad(lambda p: rays_loss(p, od, z_t, tgt, 64))(mlp)
    v_ref = float(plane_loss_from_rays(model, mlp, o, d, z_t, tgt))
    v_rays = float(rays_loss(mlp, od, z_t, tgt, 64))
    np.testing.assert_allclose(v_rays, v_ref, rtol=1e-4)

    flat_rays = dict(jax.tree_util.tree_leaves_with_path(g_rays))
    for path, ref in jax.tree_util.tree_leaves_with_path(g_ref):
        got = np.asarray(flat_rays[path])
        ref = np.asarray(ref)
        rel_l2 = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
        # fp32 floor set by the in-kernel double-angle posenc recurrence
        # (fused_mlp._build_emb) vs direct sin/cos — largest relatively on
        # the tiny trunk_0 grads (~1.4e-3)
        assert rel_l2 < 5e-3, (jax.tree_util.keystr(path), rel_l2)


def test_rays_train_grads_accumulate_across_grid():
    """Multi-tile 2D grid (rays x sample-rows) must accumulate to the same
    grads as a single tile."""
    model, params, o, d, od, z_t, tgt = rays_setup(n_rays=64, s=16)
    mlp = params["fine"]
    g1 = jax.grad(lambda p: rays_loss(p, od, z_t, tgt, 64))(mlp)
    g4 = jax.grad(lambda p: rays_loss(p, od, z_t, tgt, 16))(mlp)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)
