"""Fused-MLP Pallas kernel vs the flax reference path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_pytorch_paeng_tpu.config import NerfConfig
from nerf_pytorch_paeng_tpu.kernels.fused_mlp import (
    _emb_perm, fused_mlp_eval, pack_nerf_mlp_params)
from nerf_pytorch_paeng_tpu.models import NeRF, init_nerf
from nerf_pytorch_paeng_tpu.ops.posenc import positional_encoding


def test_emb_perm_is_permutation():
    for L in (4, 10):
        p = _emb_perm(L)
        assert sorted(p.tolist()) == list(range(3 + 6 * L))


def test_emb_perm_matches_posenc_order():
    """Embedding built in kernel order, permuted by _emb_perm, must equal
    the flax positional_encoding layout."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 3)).astype(np.float32)
    L = 4
    flax_emb = np.asarray(positional_encoding(jnp.asarray(x), L))  # [5, 27]
    # kernel order: [x, all sins (freq-outer), all cosines (freq-outer)]
    kern = [x[:, c] for c in range(3)]
    for j in range(L):
        for c in range(3):
            kern.append(np.sin(x[:, c] * 2.0 ** j))
    for j in range(L):
        for c in range(3):
            kern.append(np.cos(x[:, c] * 2.0 ** j))
    kern = np.stack(kern, -1)                                      # [5, 27]
    perm = _emb_perm(L)
    np.testing.assert_allclose(kern, flax_emb[:, :][..., np.argsort(perm)]
                               if False else flax_emb[:, perm], rtol=1e-6)


@pytest.mark.parametrize("n_pts", [256, 1024])
def test_fused_mlp_matches_flax(n_pts):
    cfg = NerfConfig(compute_dtype="float32")
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))
    mlp_params = params["fine"]

    rng = np.random.default_rng(1)
    pts = rng.uniform(-2, 2, size=(n_pts, 3)).astype(np.float32)
    dirs = rng.normal(size=(n_pts, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    # reference path
    emb = jnp.concatenate([positional_encoding(jnp.asarray(pts), 10),
                           positional_encoding(jnp.asarray(dirs), 4)], -1)
    want = np.asarray(model.apply({"params": params}, emb,
                                  method=NeRF.fine_fwd))       # [N, 4]

    packed = pack_nerf_mlp_params(mlp_params)
    out = fused_mlp_eval(jnp.asarray(pts.T), jnp.asarray(dirs.T), packed,
                         tile=n_pts, interpret=True)[:4]       # [4, N]
    got = np.asarray(out).T
    # bf16 matmuls in the kernel vs fp32 flax: loose tolerance
    np.testing.assert_allclose(got, want, rtol=0.08, atol=0.08)
    # correlation must be essentially 1
    for ch in range(4):
        c = np.corrcoef(got[:, ch], want[:, ch])[0, 1]
        assert c > 0.999, (ch, c)


def test_fused_mlp_multi_tile_consistent():
    cfg = NerfConfig(compute_dtype="float32")
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))
    packed = pack_nerf_mlp_params(params["fine"])
    rng = np.random.default_rng(2)
    pts = rng.uniform(-2, 2, size=(512, 3)).astype(np.float32)
    dirs = rng.normal(size=(512, 3)).astype(np.float32)
    one = fused_mlp_eval(jnp.asarray(pts.T), jnp.asarray(dirs.T), packed,
                         tile=512, interpret=True)
    four = fused_mlp_eval(jnp.asarray(pts.T), jnp.asarray(dirs.T), packed,
                          tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(one), np.asarray(four),
                               rtol=1e-3, atol=1e-3)
