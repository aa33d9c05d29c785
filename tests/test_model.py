import jax
import jax.numpy as jnp
import numpy as np

from nerf_pytorch_paeng_tpu.config import NerfConfig
from nerf_pytorch_paeng_tpu.models import NeRF, NeRFMLP, init_nerf


def n_params(tree):
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree))


def test_mlp_shapes_and_param_count():
    mlp = NeRFMLP(depth=8, width=256, in_ch_x=63, in_ch_d=27,
                  compute_dtype=jnp.float32)
    x = jnp.zeros((10, 90))
    params = mlp.init(jax.random.PRNGKey(0), x)["params"]
    y = mlp.apply({"params": params}, x)
    assert y.shape == (10, 4)
    # trunk: 63*256+256 + 6*(256*256+256) + (319*256+256)  [skip at layer 5]
    # heads: density 256*1+1, feature 256*256+256, view 283*128+128, color 128*3+3
    want = (63 * 256 + 256) + 6 * (256 * 256 + 256) + (319 * 256 + 256) \
        + (256 * 1 + 1) + (256 * 256 + 256) + (283 * 128 + 128) + (128 * 3 + 3)
    assert n_params(params) == want


def test_skip_connection_position():
    """Layer 5's kernel must take width + in_ch_x inputs (skip at index 4)."""
    mlp = NeRFMLP(depth=8, width=64, in_ch_x=63, in_ch_d=27,
                  compute_dtype=jnp.float32)
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((2, 90)))["params"]
    assert params["trunk_5"]["kernel"].shape == (64 + 63, 64)
    assert params["trunk_4"]["kernel"].shape == (64, 64)


def test_coarse_fine_independent():
    cfg = NerfConfig(netDepth=2, netWidth=32, L_x=4, L_d=2,
                     compute_dtype="float32")
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 27 + 15))
    yc = model.apply({"params": params}, x, method=NeRF.coarse_fwd)
    yf = model.apply({"params": params}, x, method=NeRF.fine_fwd)
    assert yc.shape == yf.shape == (8, 4)
    # independent inits -> different outputs
    assert not np.allclose(np.asarray(yc), np.asarray(yf))


def test_bf16_close_to_fp32():
    cfg32 = NerfConfig(compute_dtype="float32")
    model32, params = init_nerf(cfg32, jax.random.PRNGKey(0))
    cfg16 = NerfConfig(compute_dtype="bfloat16")
    model16, _ = init_nerf(cfg16, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 90)) * 0.5
    y32 = model32.apply({"params": params}, x, method=NeRF.coarse_fwd)
    y16 = model16.apply({"params": params}, x, method=NeRF.coarse_fwd)
    assert y16.dtype == jnp.float32  # heads cast back to fp32
    np.testing.assert_allclose(np.asarray(y32), np.asarray(y16),
                               rtol=0.1, atol=0.15)
