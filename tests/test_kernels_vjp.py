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
