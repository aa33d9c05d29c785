"""shard_map DP path with the fused Pallas kernels (interpret mode on the
8 virtual CPU devices)."""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_pytorch_paeng_tpu.config import NerfConfig
from nerf_pytorch_paeng_tpu.parallel import (batch_sharding, make_mesh,
                                             make_train_step_for_mesh)
from nerf_pytorch_paeng_tpu.train import create_train_state
from nerf_pytorch_paeng_tpu.train.step import _supports_pallas_train


def test_shardmap_pallas_train_step_runs_and_learns():
    # full-size architecture (the kernel requires 8x256) but few samples
    cfg = NerfConfig(netDepth=8, netWidth=256, L_x=10, L_d=4, N_rays=64,
                     N_samples_c=4, N_samples_f=4, near=2.0, far=6.0,
                     iter_N=100, iter_warmup=5, use_pallas=True)
    assert _supports_pallas_train(cfg)
    mesh = make_mesh(8, 1)
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step_for_mesh(model, tx, cfg, mesh)

    rng = np.random.default_rng(0)
    bs = batch_sharding(mesh)
    o = jax.device_put(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32), bs)
    d = jax.device_put(jnp.asarray(rng.normal(size=(64, 3)), jnp.float32), bs)
    tgt = jax.device_put(jnp.asarray(rng.uniform(size=(64, 3)), jnp.float32),
                         bs)

    losses = []
    for i in range(3):
        state, m = step(state, o, d, tgt, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert int(state.step) == 3
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # fixed batch -> loss must drop


def test_mesh_dispatch_uses_gspmd_for_small_arch():
    from nerf_pytorch_paeng_tpu.train.step import _supports_pallas_train
    cfg = NerfConfig(netDepth=2, netWidth=32, use_pallas=True)
    assert not _supports_pallas_train(cfg)  # falls back to the XLA path
