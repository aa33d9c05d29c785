import jax.numpy as jnp
import numpy as np

from nerf_pytorch_paeng_tpu.ops.posenc import posenc_out_dim, positional_encoding


def np_posenc(x, L):
    """Independent numpy oracle: [x, sin(2^0 x), cos(2^0 x), ...]."""
    outs = [x]
    for k in range(L):
        outs.append(np.sin(x * 2.0 ** k))
        outs.append(np.cos(x * 2.0 ** k))
    return np.concatenate(outs, axis=-1)


def test_out_dims():
    assert posenc_out_dim(10) == 63
    assert posenc_out_dim(4) == 27
    assert posenc_out_dim(0) == 3


def test_values_match_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(17, 3)).astype(np.float32)
    for L in (1, 4, 10):
        got = np.asarray(positional_encoding(jnp.asarray(x), L))
        want = np_posenc(x, L)
        assert got.shape == (17, posenc_out_dim(L))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_identity_channels_first():
    x = np.array([[0.5, -1.0, 2.0]], np.float32)
    got = np.asarray(positional_encoding(jnp.asarray(x), 2))
    np.testing.assert_allclose(got[0, :3], x[0])
    # channel 3..5 is sin(x * 2^0), 6..8 cos(x * 2^0)
    np.testing.assert_allclose(got[0, 3:6], np.sin(x[0]), rtol=1e-6)
    np.testing.assert_allclose(got[0, 6:9], np.cos(x[0]), rtol=1e-6)


def test_L_zero_is_identity():
    x = jnp.ones((4, 3))
    np.testing.assert_array_equal(np.asarray(positional_encoding(x, 0)),
                                  np.ones((4, 3)))
