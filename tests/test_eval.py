import os

import jax
import jax.numpy as jnp
import numpy as np

from nerf_pytorch_paeng_tpu.config import NerfConfig
from nerf_pytorch_paeng_tpu.eval.metrics import compute_lpips, compute_ssim
from nerf_pytorch_paeng_tpu.eval.test import run_test
from nerf_pytorch_paeng_tpu.eval.render import run_render
from nerf_pytorch_paeng_tpu.train import create_train_state
from nerf_pytorch_paeng_tpu.train.checkpoint import (restore_checkpoint,
                                                     save_checkpoint)
from nerf_pytorch_paeng_tpu.utils.synth import make_synth_scene


def test_ssim_identical_is_one():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    assert abs(float(compute_ssim(img, img)) - 1.0) < 1e-6


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    slight = img + 0.02 * jnp.asarray(
        rng.normal(size=(32, 32, 3)).astype(np.float32))
    heavy = img + 0.3 * jnp.asarray(
        rng.normal(size=(32, 32, 3)).astype(np.float32))
    s_slight = float(compute_ssim(jnp.clip(slight, 0, 1), img))
    s_heavy = float(compute_ssim(jnp.clip(heavy, 0, 1), img))
    assert 1.0 > s_slight > s_heavy


def test_ssim_known_constant_shift():
    # constant images: structure term drops out; SSIM = (2ab+c1)/(a^2+b^2+c1)
    a, b = 0.5, 0.6
    img_a = jnp.full((16, 16, 3), a)
    img_b = jnp.full((16, 16, 3), b)
    c1 = 0.01 ** 2
    want = (2 * a * b + c1) / (a * a + b * b + c1)
    np.testing.assert_allclose(float(compute_ssim(img_a, img_b)), want,
                               rtol=1e-3)


def test_lpips_gated_without_weights():
    img = jnp.zeros((8, 8, 3))
    assert np.isnan(compute_lpips(img, img, None))


def test_checkpoint_roundtrip(tmp_path):
    cfg = NerfConfig(netDepth=2, netWidth=16, L_x=2, L_d=1,
                     iter_N=100, iter_warmup=5)
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    state = state._replace(step=state.step + 3)
    save_checkpoint(str(tmp_path), "exp", state)
    _, st2, _ = create_train_state(cfg, jax.random.PRNGKey(9))
    restored = restore_checkpoint(str(tmp_path), "exp", 3, st2)
    assert int(restored.step) == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # adam moments restored too
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def small_setup(tmp_path, data_type="blender"):
    cfg = NerfConfig(netDepth=2, netWidth=32, L_x=4, L_d=2, N_samples_c=8,
                     N_samples_f=8, near=2.0, far=6.0,
                     compute_dtype="float32", chunk_rays=64,
                     data_type=data_type, exp_name="evaltest",
                     log_dir=str(tmp_path), n_angle=4, testskip=1)
    imgs, K, poses = make_synth_scene(n_views=2, H=16, W=16)
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    return cfg, imgs, K, poses, model, state


def test_run_test_outputs(tmp_path):
    cfg, imgs, K, poses, model, state = small_setup(tmp_path)
    res = run_test(5, model, state.params, imgs, poses, K, (16, 16), cfg,
                   verbose=False)
    d = os.path.join(str(tmp_path), "evaltest", "evaltest_5", "test_result")
    assert os.path.isfile(os.path.join(d, "000.png"))
    assert os.path.isfile(os.path.join(d, "001_disp.png"))
    txt = open(os.path.join(d, "_result.txt")).read()
    assert "Mean Value" in txt and "Best Value" in txt
    assert len(res["psnr"]) == 2
    assert np.isfinite(res["mean_psnr"])


def test_run_render_gif(tmp_path):
    cfg, imgs, K, poses, model, state = small_setup(tmp_path)
    rgbs, disps = run_render(7, model, state.params, K, (16, 16), cfg,
                             verbose=False)
    assert rgbs.shape == (4, 16, 16, 3)
    d = os.path.join(str(tmp_path), "evaltest", "evaltest_7", "render_result")
    assert os.path.isfile(os.path.join(d, "_rgb.gif"))
    assert os.path.isfile(os.path.join(d, "_disp.gif"))
    assert os.path.isfile(os.path.join(d, "0_rgb.png"))


def test_ssim_bounded_on_near_constant_images():
    """fp32 variance cancellation must not blow SSIM past 1 (regression:
    a white-background render scored SSIM=24.9 before clamping)."""
    rng = np.random.default_rng(4)
    base = np.ones((64, 64, 3), np.float32)
    # mostly-constant images with a tiny patch of structure
    a = base.copy(); a[30:34, 30:34] = rng.uniform(0.98, 1.0, (4, 4, 3))
    b = base.copy(); b[30:34, 30:34] = rng.uniform(0.98, 1.0, (4, 4, 3))
    s = float(compute_ssim(jnp.asarray(a), jnp.asarray(b)))
    assert -1.0 <= s <= 1.0 + 1e-6, s
    s2 = float(compute_ssim(jnp.asarray(base), jnp.asarray(base)))
    assert abs(s2 - 1.0) < 1e-6
