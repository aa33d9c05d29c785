"""Worker process for tests/test_multiprocess.py — NOT a pytest file.

Runs ONE sharded train step over an 8-device (data) mesh and writes
loss + a parameter fingerprint to a JSON file.  In ``multi`` mode two
coordinated processes (4 virtual CPU devices each) form the 8-device
mesh through the real ``maybe_initialize_distributed`` env contract
(NERF_TPU_*); in ``single`` mode one process owns all 8 devices.  The
parent test asserts both modes produce the same numbers — i.e. the
cross-process psum path computes the single-process gradient.

Demonstrates the DCN story SURVEY §5 promises: multi-host uses the same
code path as single-process after distributed init.
"""
import json
import os
import sys


def main() -> None:
    mode = sys.argv[1]                  # "multi" | "single"
    out_path = sys.argv[2]
    if mode == "multi":
        pid = int(sys.argv[3])
        port = sys.argv[4]
        n_local = 4
        os.environ["NERF_TPU_COORDINATOR"] = f"localhost:{port}"
        os.environ["NERF_TPU_NUM_PROCESSES"] = "2"
        os.environ["NERF_TPU_PROCESS_ID"] = str(pid)
    else:
        pid = 0
        n_local = 8

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local}")
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from nerf_pytorch_paeng_tpu.config import NerfConfig
    from nerf_pytorch_paeng_tpu.parallel import (commit_replicated,
                                                 make_mesh,
                                                 make_train_step_for_mesh,
                                                 shard_params)
    from nerf_pytorch_paeng_tpu.parallel.mesh import (
        maybe_initialize_distributed)
    from nerf_pytorch_paeng_tpu.train import create_train_state

    maybe_initialize_distributed()
    if mode == "multi":
        assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    # use_pallas=False -> the GSPMD path (exact single-device parity);
    # small model + few samples keep the 2x compile under seconds
    cfg = NerfConfig(data_root="/nonexistent", data_name="mp", exp_name="mp",
                     netDepth=2, netWidth=32, N_rays=64, N_samples_c=8,
                     N_samples_f=8, use_pallas=False)
    mesh = make_mesh()  # 8 x 1 over the GLOBAL device list
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    state = state._replace(params=shard_params(state.params, mesh))
    state = commit_replicated(state, mesh)

    rng = np.random.default_rng(0)
    o = rng.normal(size=(64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    tgt = rng.uniform(size=(64, 3)).astype(np.float32)
    bs = NamedSharding(mesh, P("data"))
    if mode == "multi":
        # each process contributes its local 32-row slice of the batch
        sl = slice(pid * 32, (pid + 1) * 32)
        o, d, tgt = (jax.make_array_from_process_local_data(bs, a[sl])
                     for a in (o, d, tgt))
    else:
        o, d, tgt = (jax.device_put(a, bs) for a in (o, d, tgt))
    key = commit_replicated(jax.random.PRNGKey(5), mesh)

    step = make_train_step_for_mesh(model, tx, cfg, mesh)
    state, metrics = step(state, o, d, tgt, key)

    # fingerprint: psum over leaves of |param| — replicated, so each
    # process reads it locally
    fp = jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(p)),
        out_shardings=NamedSharding(mesh, P()))(state.params)
    result = {"loss": float(metrics["loss"]), "param_l1": float(fp),
              "psnr_f": float(metrics["psnr_f"])}
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(result, f)
    print(f"[{mode}/{pid}] {result}", flush=True)


if __name__ == "__main__":
    main()
