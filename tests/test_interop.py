"""Checkpoint interop with the reference torch format (utils/interop.py
+ tools/import_reference_ckpt.py / tools/export_reference_ckpt.py).

The reference saves ``{'idx', 'model_state_dict', 'optimizer_state_dict'}``
(reference train.py:105-114) and resumes via load_state_dict (reference
main.py:111-116).  These tests prove a user can switch frameworks
mid-training in either direction: params map bitwise, Adam moments and
the step count carry over, and a run continued here after a reference
checkpoint tracks the reference's own continuation step for step."""
import importlib.util
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

if os.path.isdir(REF):
    sys.path.insert(0, REF)
    import torch


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _small_cfg():
    from nerf_pytorch_paeng_tpu.config import NerfConfig
    return NerfConfig(compute_dtype="float32", use_pallas=False,
                      N_rays=32, N_samples_c=8, N_samples_f=8,
                      near=2.0, far=6.0, iter_N=50, iter_warmup=5)


def test_params_roundtrip_bitwise():
    import jax
    from nerf_pytorch_paeng_tpu.models import init_nerf
    from nerf_pytorch_paeng_tpu.utils.interop import (
        params_from_reference_state_dict, reference_state_dict_from_params)

    _, params = init_nerf(_small_cfg(), jax.random.PRNGKey(3))
    back = params_from_reference_state_dict(
        reference_state_dict_from_params(params))
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(back)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), str(pa))


def test_export_loads_into_reference_model_and_optimizer(tmp_path):
    """Strict-load an exported checkpoint into the real reference NeRF
    wrapper + a torch Adam, and check module-forward equality — the
    exported file is usable by the reference's own resume path."""
    import jax
    import jax.numpy as jnp
    from model.NeRF import NeRF as RefNeRF

    from nerf_pytorch_paeng_tpu.models import NeRF, init_nerf
    from nerf_pytorch_paeng_tpu.train import create_train_state
    from nerf_pytorch_paeng_tpu.train.checkpoint import save_checkpoint

    cfg = _small_cfg()
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), "exp", state)

    exp_tool = _load_tool("export_reference_ckpt")
    out = exp_tool.main(["--log_dir", str(tmp_path), "--exp_name", "exp",
                         "--step", "0", "--out",
                         str(tmp_path / "exp_0.pth.tar")])

    ckpt = torch.load(out)
    assert set(ckpt) == {"idx", "model_state_dict", "optimizer_state_dict"}
    ref = RefNeRF(D=8, W=256, input_ch=63, input_ch_d=27,
                  gt_camera_param=(None, None))
    ref.load_state_dict(ckpt["model_state_dict"], strict=True)
    opt = torch.optim.Adam(ref.parameters(), lr=cfg.lr)
    opt.load_state_dict(ckpt["optimizer_state_dict"])

    rng = np.random.default_rng(1)
    x = rng.normal(size=(16, 90)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), is_fine=True).numpy()
    got = np.asarray(model.apply({"params": state.params}, jnp.asarray(x),
                                 method=NeRF.fine_fwd))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_import_export_roundtrip_through_orbax(tmp_path):
    """export -> torch file -> import tool -> orbax -> restore: params,
    Adam moments and the step count all survive bitwise."""
    import jax
    import jax.numpy as jnp
    from nerf_pytorch_paeng_tpu.train import create_train_state, make_train_step
    from nerf_pytorch_paeng_tpu.train.checkpoint import (restore_checkpoint,
                                                         save_checkpoint)

    cfg = _small_cfg()
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    # a couple of real updates so the Adam moments are nonzero
    step = jax.jit(make_train_step(model, tx, cfg))
    rng = np.random.default_rng(0)
    for _ in range(2):
        o = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
        d = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
        t = jnp.asarray(rng.uniform(size=(32, 3)), jnp.float32)
        state, _ = step(state, o, d, t, jax.random.PRNGKey(7))
    save_checkpoint(str(tmp_path), "src", state)

    exp_tool = _load_tool("export_reference_ckpt")
    tar = exp_tool.main(["--log_dir", str(tmp_path), "--exp_name", "src",
                         "--step", "2", "--out",
                         str(tmp_path / "src_2.pth.tar")])
    imp_tool = _load_tool("import_reference_ckpt")
    imp_tool.main([tar, "--log_dir", str(tmp_path), "--exp_name", "dst"])

    restored = restore_checkpoint(str(tmp_path), "dst", 2, state)
    assert int(restored.step) == 2
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.params, restored.params)
    adam = lambda s: next(x for x in s.opt_state if hasattr(x, "mu"))
    assert int(adam(restored).count) == 2
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        (adam(state).mu, adam(state).nu),
        (adam(restored).mu, adam(restored).nu))


def test_partial_optimizer_state_zero_fills():
    """Torch materialises per-param Adam state lazily; an import from a
    checkpoint where some params never saw a grad continues those from
    zero moments instead of crashing."""
    import jax
    from nerf_pytorch_paeng_tpu.models import init_nerf
    from nerf_pytorch_paeng_tpu.utils.interop import (
        reference_state_dict_from_params,
        train_state_from_reference_checkpoint)

    cfg = _small_cfg()
    _, params = init_nerf(cfg, jax.random.PRNGKey(0))
    sd = reference_state_dict_from_params(params)
    w0 = sd["model_coarse.linear_x.0.weight"]
    ckpt = {"idx": 7, "model_state_dict": sd,
            "optimizer_state_dict": {
                "state": {0: {"step": np.asarray(7.0),
                              "exp_avg": np.ones_like(w0),
                              "exp_avg_sq": np.ones_like(w0)}},
                "param_groups": []}}
    state = train_state_from_reference_checkpoint(ckpt, cfg)
    adam = next(s for s in state.opt_state if hasattr(s, "mu"))
    assert int(adam.count) == 7 and int(state.step) == 7
    np.testing.assert_array_equal(
        np.asarray(adam.mu["coarse"]["trunk_0"]["kernel"]),
        np.ones_like(w0).T)
    assert float(np.abs(np.asarray(
        adam.mu["fine"]["color"]["kernel"])).sum()) == 0.0


def test_midtrain_switch_parity():
    """Train 20 steps in the live reference loop, checkpoint in its own
    format, import (params + Adam moments + step), continue 10 more steps
    here — the continued losses track the reference's own continuation
    within the same band as the from-scratch trajectory parity."""
    import jax
    import jax.numpy as jnp
    from test_reference_parity import run_trajectory_parity

    from nerf_pytorch_paeng_tpu.train import create_train_state, make_train_step
    from nerf_pytorch_paeng_tpu.utils.interop import (
        train_state_from_reference_checkpoint)

    ours, ref, ex = run_trajectory_parity(30, snapshot_at=20)
    cfg = ex["cfg"]
    state = train_state_from_reference_checkpoint(ex["ref_ckpt"], cfg)
    assert int(state.step) == 20

    model, _, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx, cfg))
    step_key = jax.random.PRNGKey(5)        # the harness's step key
    cont = []
    for o, d, t in ex["batches"][20:]:
        state, m = step(state, jnp.asarray(o), jnp.asarray(d),
                        jnp.asarray(t), step_key)
        cont.append(float(m["loss"]))

    # first continued step starts from the torch state bit-for-bit: only
    # single-step XLA-vs-torch association noise separates them
    np.testing.assert_allclose(cont[0], ref[20], rtol=2e-3)
    np.testing.assert_allclose(cont, ref[20:], rtol=2e-2)
