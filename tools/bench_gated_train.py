#!/usr/bin/env python
"""A/B the occupancy-gated train step (cfg.train_precull) on the real TPU.

Distills the bench blob scenes (utils/synth.fit_field_to_blob — the
standard ~30%-occupancy scene and the hard-surface front), measures
support bounds once, then times gated vs ungated train steps on the SAME
camera-pixel rays and checks the exactness contract on-chip: loss equal
(bit-level up to bf16 kernel determinism), grads/params close.

Usage: python tools/bench_gated_train.py [n_steps]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.asarray(x).ravel()[0])


def _note(msg):
    print(f"[gated {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main(n_steps: int = 60, reps: int = 3):
    from bench import _train_blob_model
    from nerf_pytorch_paeng_tpu.config import NerfConfig
    from nerf_pytorch_paeng_tpu.ops.rays import get_rays
    from nerf_pytorch_paeng_tpu.train.precull import (
        make_train_support_program, train_precull_enabled)
    from nerf_pytorch_paeng_tpu.train.state import TrainState, make_optimizer
    from nerf_pytorch_paeng_tpu.train.step import make_train_step
    from nerf_pytorch_paeng_tpu.utils.compile_cache import (
        enable_persistent_compile_cache)

    enable_persistent_compile_cache()
    cfg = NerfConfig(near=2.0, far=6.0, train_precull=True)
    assert train_precull_enabled(cfg)
    tiles = [int(t) for t in
             (sys.argv[2].split(",") if len(sys.argv) > 2 else ["0"])]
    tx = make_optimizer(cfg)
    prog, _ = make_train_support_program(cfg)
    step_u = None
    steps_g = {}

    H = W = 800
    focal = 0.9 * W
    K = jnp.asarray([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                    jnp.float32)

    out = {}
    scenes = [("std", dict()),
              ("hard", dict(n_steps=1500, blob_amp=60.0, blob_hard_w=0.08))]
    for name, fit_kw in scenes:
        model, params, poses, fit_loss = _train_blob_model(cfg, **fit_kw)
        _note(f"[{name}] fit loss {fit_loss:.4f}")
        if step_u is None:  # same architecture for every scene
            import dataclasses
            for t in tiles:
                cfg_t = dataclasses.replace(cfg, train_precull_tile=t)
                steps_g[t] = jax.jit(
                    make_train_step(model, tx, cfg_t, precull=True))
            step_u = jax.jit(make_train_step(model, tx, cfg))
        step_g = steps_g[tiles[0]]
        ro, rd = get_rays(H, W, K, jnp.asarray(poses[0][:3, :4]))
        idx = jax.random.choice(jax.random.PRNGKey(0), H * W,
                                (cfg.N_rays,), replace=False)
        ro = ro.reshape(-1, 3)[idx]
        rd = rd.reshape(-1, 3)[idx]
        rgb = jax.random.uniform(jax.random.PRNGKey(1), (cfg.N_rays, 3))
        key = jax.random.PRNGKey(2)

        bc, bf = prog(params)
        valid = bool(np.asarray(bc[3])[0]) and bool(np.asarray(bf[3])[0])
        _note(f"[{name}] bounds valid={valid}")
        support = (tuple(bc), tuple(bf))
        state0 = TrainState(jnp.zeros((), jnp.int32), params,
                            jax.jit(tx.init)(params))

        # exactness check on-chip: one step each, same rays/keys
        st_g, m_g = step_g(state0, ro, rd, rgb, key, support)
        st_u, m_u = step_u(state0, ro, rd, rgb, key)
        lg, lu = _sync(m_g["loss"]), _sync(m_u["loss"])
        fg, _ = jax.flatten_util.ravel_pytree(st_g.params)
        fu, _ = jax.flatten_util.ravel_pytree(st_u.params)
        dp = float(jnp.max(jnp.abs(fg - fu)))
        _note(f"[{name}] loss gated={lg:.6f} ungated={lu:.6f} "
              f"max|dparam|={dp:.2e}")
        # agreement at the grid-sampling trust level (ops/occupancy.py):
        # bit-equal where the bounds are exact; |delta| ~1e-5 on
        # razor-front scenes from sub-cell pockets — the same residual
        # class as the eval pre-cull's 53-68 dB agreement, far below
        # SGD noise
        assert abs(lg - lu) < 1e-3 * max(abs(lu), 1e-3), (lg, lu)

        def time_steps(step, *extra):
            st, m = step(state0, ro, rd, rgb, key, *extra)
            _sync(m["loss"])
            times = []
            for _ in range(reps):
                st = state0
                t0 = time.perf_counter()
                for _ in range(n_steps):
                    st, m = step(st, ro, rd, rgb, key, *extra)
                _sync(m["loss"])
                times.append(time.perf_counter() - t0)
            return min(times) / n_steps

        by_tile = {}
        for t, sg in steps_g.items():
            by_tile[t] = time_steps(sg, support)
            _note(f"[{name}] tile={t}: {by_tile[t]*1e3:.2f} ms/step")
        sec_g = min(by_tile.values())
        sec_u = time_steps(step_u)
        out[name] = dict(
            gated_ms=round(sec_g * 1e3, 2), ungated_ms=round(sec_u * 1e3, 2),
            gated_rays_per_sec=round(cfg.N_rays / sec_g, 1),
            ungated_rays_per_sec=round(cfg.N_rays / sec_u, 1),
            by_tile={str(t): round(v * 1e3, 2) for t, v in by_tile.items()},
            loss_gated=lg, loss_ungated=lu, max_dparam=dp,
            bounds_valid=valid)
        _note(f"[{name}] best gated {sec_g*1e3:.2f} ms/step vs ungated "
              f"{sec_u*1e3:.2f} ms/step")
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 60)
