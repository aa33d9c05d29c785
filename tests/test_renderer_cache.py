"""The compiled-frame-renderer cache (eval/frame.get_frame_renderer).

Round-2 VERDICT item 4: run_test/run_render built a fresh renderer (new
jit closures -> 20-60 s remote recompiles per program) on EVERY call; the
driver's periodic eval hooks paid that per hook.  These tests pin the
cache behavior: same (cfg, H, W, K, mesh) reuses the renderer across
run_test calls, different keys do not.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf_pytorch_paeng_tpu.config import NerfConfig
from nerf_pytorch_paeng_tpu.eval import frame as frame_mod
from nerf_pytorch_paeng_tpu.eval.test import run_test
from nerf_pytorch_paeng_tpu.models import init_nerf
from nerf_pytorch_paeng_tpu.utils.synth import make_synth_scene


def _cfg(**kw):
    base = dict(netDepth=2, netWidth=32, L_x=4, L_d=2,
                N_samples_c=8, N_samples_f=8, near=2.0, far=6.0,
                use_pallas=False, compute_dtype="float32", perturb=0.0)
    base.update(kw)
    return NerfConfig(**base)


def _count_builds(monkeypatch):
    calls = []
    real = frame_mod.make_frame_renderer

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(frame_mod, "make_frame_renderer", counting)
    return calls


def test_run_test_reuses_renderer_across_calls(tmp_path, monkeypatch):
    calls = _count_builds(monkeypatch)
    frame_mod._RENDERER_CACHE.clear()
    cfg = _cfg(log_dir=str(tmp_path))
    H = W = 8
    imgs, K, poses = make_synth_scene(n_views=2, H=H, W=W)
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))

    run_test(1, model, params, imgs[:1], poses[:1, :3, :4], K, (H, W), cfg,
             verbose=False)
    assert len(calls) == 1
    # second eval hook (different iter): the renderer must be reused
    run_test(2, model, params, imgs[1:], poses[1:, :3, :4], K, (H, W), cfg,
             verbose=False)
    assert len(calls) == 1


def test_cache_distinguishes_relevant_keys(monkeypatch):
    calls = _count_builds(monkeypatch)
    frame_mod._RENDERER_CACHE.clear()
    cfg = _cfg()
    H = W = 8
    _, K, _ = make_synth_scene(n_views=1, H=H, W=W)
    model, _ = init_nerf(cfg, jax.random.PRNGKey(0))

    frame_mod.get_frame_renderer(model, cfg, H, W, K)
    frame_mod.get_frame_renderer(model, cfg, H, W, K)
    assert len(calls) == 1                        # identical key: cached
    frame_mod.get_frame_renderer(model, cfg, H, W + 8, K)
    assert len(calls) == 2                        # new frame size: rebuilt
    cfg2 = dataclasses.replace(cfg, render_cull="none")
    frame_mod.get_frame_renderer(model, cfg2, H, W, K)
    assert len(calls) == 3                        # cfg field changed: rebuilt
    K2 = np.asarray(K).copy()
    K2[0, 0] *= 2.0
    frame_mod.get_frame_renderer(model, cfg, H, W, K2)
    assert len(calls) == 4                        # intrinsics changed: rebuilt


def test_cached_renderer_output_unchanged():
    """get_frame_renderer returns a renderer whose output matches a fresh
    make_frame_renderer (no behavior change from caching)."""
    frame_mod._RENDERER_CACHE.clear()
    cfg = _cfg()
    H = W = 8
    _, K, poses = make_synth_scene(n_views=1, H=H, W=W)
    model, params = init_nerf(cfg, jax.random.PRNGKey(0))
    c2w = jnp.asarray(poses[0][:3, :4])
    key = jax.random.PRNGKey(2)
    rgb_c, disp_c = frame_mod.get_frame_renderer(
        model, cfg, H, W, K, stratified=False)(params, c2w, key)
    rgb_f, disp_f = frame_mod.make_frame_renderer(
        model, cfg, H, W, K, stratified=False)(params, c2w, key)
    np.testing.assert_allclose(np.asarray(rgb_c), np.asarray(rgb_f))
    np.testing.assert_allclose(np.asarray(disp_c), np.asarray(disp_f))
