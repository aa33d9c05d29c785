"""Persistent XLA compilation cache wiring (utils/compile_cache.py).

The measured win lives on the remote TPU (cold frame renderer 277 s ->
11 s); these tests pin the wiring on CPU: path resolution (auto/env/
off/explicit), the jax config actually pointing at the directory, and a
compiled program writing a cache entry end to end.
"""
import os

import jax
import jax.numpy as jnp

from nerf_pytorch_paeng_tpu.utils.compile_cache import (
    default_cache_dir, enable_persistent_compile_cache)


def _restore(old_dir, old_min):
    jax.config.update("jax_compilation_cache_dir", old_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old_min)


def test_path_resolution(tmp_path, monkeypatch):
    old = (jax.config.jax_compilation_cache_dir,
           jax.config.jax_persistent_cache_min_compile_time_secs)
    try:
        monkeypatch.delenv("NERF_TPU_COMPILE_CACHE", raising=False)
        assert enable_persistent_compile_cache("off") is None
        assert enable_persistent_compile_cache("none") is None

        d = str(tmp_path / "explicit")
        assert enable_persistent_compile_cache(d) == d
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d

        env_d = str(tmp_path / "from_env")
        monkeypatch.setenv("NERF_TPU_COMPILE_CACHE", env_d)
        assert enable_persistent_compile_cache("auto") == env_d
        monkeypatch.setenv("NERF_TPU_COMPILE_CACHE", "off")
        assert enable_persistent_compile_cache(None) is None

        monkeypatch.delenv("NERF_TPU_COMPILE_CACHE", raising=False)
        assert enable_persistent_compile_cache() == default_cache_dir()
    finally:
        _restore(*old)


def test_cache_entry_written(tmp_path):
    old = (jax.config.jax_compilation_cache_dir,
           jax.config.jax_persistent_cache_min_compile_time_secs)
    d = str(tmp_path / "xla")
    try:
        assert enable_persistent_compile_cache(d) == d
        # CPU compiles are fast — force every program into the cache
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x) * 3.25

        float(jnp.sum(f(jnp.ones((64, 64), jnp.float32))))
        entries = [n for _, _, ns in os.walk(d) for n in ns]
        assert entries, "no persistent-cache entry written"
    finally:
        _restore(*old)
