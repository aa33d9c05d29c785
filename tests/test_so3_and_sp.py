"""SO(3) helpers and the sample-axis (sequence-parallel analog) scan."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from nerf_pytorch_paeng_tpu.ops.so3 import so3_exp, vec2skew
from nerf_pytorch_paeng_tpu.ops.volume import exclusive_cumprod


def test_vec2skew_cross_product():
    rng = np.random.default_rng(0)
    a = rng.normal(size=3).astype(np.float32)
    b = rng.normal(size=3).astype(np.float32)
    got = np.asarray(vec2skew(jnp.asarray(a))) @ b
    np.testing.assert_allclose(got, np.cross(a, b), rtol=1e-5, atol=1e-6)


def test_so3_exp_is_rotation():
    rng = np.random.default_rng(1)
    r = rng.normal(size=(5, 3)).astype(np.float32)
    R = np.asarray(so3_exp(jnp.asarray(r)))
    for i in range(5):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R[i]), 1.0, atol=1e-5)


def test_so3_exp_known_angle():
    # 90 deg about z
    r = jnp.asarray([0.0, 0.0, np.pi / 2], jnp.float32)
    R = np.asarray(so3_exp(r))
    np.testing.assert_allclose(R @ np.array([1, 0, 0.0]), [0, 1, 0],
                               atol=1e-6)


def test_so3_exp_small_angle_stable():
    r = jnp.asarray([1e-9, 0.0, 0.0], jnp.float32)
    R = np.asarray(so3_exp(r))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)
    assert not np.isnan(R).any()


def test_sample_axis_sharded_transmittance():
    """The associative-scan transmittance shards over the sample axis —
    the TPU-native analog of sequence parallelism (SURVEY §5)."""
    devs = np.array(jax.devices()[:8]).reshape(1, 8)
    mesh = Mesh(devs, ("rays", "samples"))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0.2, 1.0, size=(16, 64)).astype(np.float32))

    want = np.asarray(exclusive_cumprod(x, "cumprod"))

    @jax.jit
    def sharded(x):
        x = jax.lax.with_sharding_constraint(
            x, jax.sharding.NamedSharding(mesh, P("rays", "samples")))
        return exclusive_cumprod(x, "associative")

    with mesh:
        got = np.asarray(sharded(x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
