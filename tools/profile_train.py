#!/usr/bin/env python
"""Micro-profile of the training step's components on real TPU.

Feeds the round-3 perf push (VERDICT item 1: 31.5 -> <=30.3 ms/step).
Times, with the hard-sync pipelined-loop discipline from bench.py:
  - the full train step (pipelined + scanned)
  - the coarse/fine ray-major custom-VJP kernels in isolation (fwd, fwd+bwd)
  - hierarchical_z_vals (sample_pdf + the 192-deep merge sort)
  - the sample-major composites (fwd+bwd)
  - the Adam update alone
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def first_leaf(out):
    return jax.tree_util.tree_leaves(out)[0]


def timeit(fn, *args, reps=3, inner=10):
    """Pipelined loop: `inner` async dispatches, one hard sync."""
    out = fn(*args)
    sync(first_leaf(out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        sync(first_leaf(out))
        ts.append(time.perf_counter() - t0)
    return min(ts) / inner


def log(m):
    print(m, flush=True)


def main():
    from nerf_pytorch_paeng_tpu.config import NerfConfig
    from nerf_pytorch_paeng_tpu.kernels.fused_mlp import pack_nerf_mlp_params
    from nerf_pytorch_paeng_tpu.kernels.fused_mlp_vjp import (
        fused_mlp_train_rays)
    from nerf_pytorch_paeng_tpu.models import init_nerf
    from nerf_pytorch_paeng_tpu.ops.render import hierarchical_z_vals
    from nerf_pytorch_paeng_tpu.ops.sampling import sample_pdf
    from nerf_pytorch_paeng_tpu.ops.volume import volume_render_rays_t
    from nerf_pytorch_paeng_tpu.train import (create_train_state,
                                              make_train_step)

    cfg = NerfConfig(near=2.0, far=6.0)
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    N, SC, SM = cfg.N_rays, cfg.N_samples_c, (cfg.N_samples_c
                                              + cfg.N_samples_f)
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    rgb = jnp.asarray(rng.uniform(size=(N, 3)), jnp.float32)
    key = jax.random.PRNGKey(1)

    # -- full step ----------------------------------------------------------
    step = jax.jit(make_train_step(model, tx, cfg))
    t_step = timeit(lambda s: step(s, o, d, rgb, key)[1]["loss"], state)
    log(f"full train step:            {t_step*1e3:7.2f} ms")

    params = state.params
    packed_c = pack_nerf_mlp_params(params["coarse"], L_x=cfg.L_x,
                                    L_d=cfg.L_d)
    packed_f = pack_nerf_mlp_params(params["fine"], L_x=cfg.L_x, L_d=cfg.L_d)
    od = jnp.concatenate([o.T, d.T, jnp.zeros((2, N), jnp.float32)], 0)
    zc = jnp.sort(jnp.asarray(
        rng.uniform(2.0, 6.0, size=(SC, N)).astype(np.float32)), 0)
    zm = jnp.sort(jnp.asarray(
        rng.uniform(2.0, 6.0, size=(SM, N)).astype(np.float32)), 0)
    tile = 2048

    # -- MLP kernels in isolation ------------------------------------------
    def mlp_fwd(packed, z_t):
        r, g, b, sg = fused_mlp_train_rays(packed, od, z_t,
                                           L_x=cfg.L_x, L_d=cfg.L_d,
                                           tile_rays=tile)
        return (jnp.sum(r.astype(jnp.float32)) + jnp.sum(sg.astype(
            jnp.float32)) + jnp.sum(g.astype(jnp.float32))
            + jnp.sum(b.astype(jnp.float32)))

    f_c = jax.jit(lambda p: mlp_fwd(p, zc))
    f_f = jax.jit(lambda p: mlp_fwd(p, zm))
    g_c = jax.jit(jax.grad(lambda p: mlp_fwd(p, zc)))
    g_f = jax.jit(jax.grad(lambda p: mlp_fwd(p, zm)))
    t = timeit(f_c, packed_c)
    log(f"coarse MLP fwd   (64x4096): {t*1e3:7.2f} ms")
    t = timeit(f_f, packed_f)
    log(f"fine MLP fwd    (192x4096): {t*1e3:7.2f} ms")
    t = timeit(g_c, packed_c)
    log(f"coarse MLP f+b   (64x4096): {t*1e3:7.2f} ms")
    t = timeit(g_f, packed_f)
    log(f"fine MLP f+b    (192x4096): {t*1e3:7.2f} ms")

    # -- glue ---------------------------------------------------------------
    w = jnp.asarray(rng.uniform(size=(N, SC)).astype(np.float32))
    hz = jax.jit(lambda z, w, k: hierarchical_z_vals(
        z, w, k, n_fine=cfg.N_samples_f))
    t = timeit(hz, zc.T, w, key)
    log(f"hierarchical_z_vals:        {t*1e3:7.2f} ms")

    sp = jax.jit(lambda z, w, k: sample_pdf(
        k, 0.5 * (z[..., 1:] + z[..., :-1]), w[..., 1:-1],
        cfg.N_samples_f))
    t = timeit(sp, zc.T, w, key)
    log(f"  sample_pdf:               {t*1e3:7.2f} ms")
    srt = jax.jit(lambda z: jnp.sort(z, -1))
    zcat = jnp.asarray(rng.uniform(2.0, 6.0, size=(N, SM)).astype(np.float32))
    t = timeit(srt, zcat)
    log(f"  jnp.sort [4096,192]:      {t*1e3:7.2f} ms")

    raws = tuple(jnp.asarray(rng.normal(size=(SM, N)).astype(np.float32)))
    r_, g_, b_, sg_ = (jnp.asarray(
        rng.normal(size=(SM, N)).astype(np.float32)) for _ in range(4))

    def comp_loss(r, g, b, sg):
        out = volume_render_rays_t(r, g, b, sg, zm, d)
        return jnp.mean((out.rgb - rgb) ** 2)

    t = timeit(jax.jit(comp_loss), r_, g_, b_, sg_)
    log(f"composite fwd  (192x4096):  {t*1e3:7.2f} ms")
    t = timeit(jax.jit(jax.grad(comp_loss, argnums=(0, 1, 2, 3))),
               r_, g_, b_, sg_)
    log(f"composite f+b  (192x4096):  {t*1e3:7.2f} ms")

    # -- optimizer ----------------------------------------------------------
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    @jax.jit
    def adam(state, grads):
        import optax
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return optax.apply_updates(state.params, updates)

    t = timeit(adam, state, grads)
    log(f"adam update:                {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
