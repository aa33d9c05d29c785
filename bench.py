#!/usr/bin/env python
"""Benchmark: train throughput + full-frame render latency on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric: training rays/sec/chip at the reference workload
(4096 rays/step, 64 coarse + 128 fine samples, the 8x256 coarse+fine
model — reference configs/blender/lego.txt).  Extras report 800x800 frame
render seconds — on a model *trained* on the synthetic blob scene, so the
occupancy-culled path (the production eval default) does content-
dependent work — plus the exact dense-render time, MFU estimates, and a
lax.scan-fused train variant.

Baseline: the reference repo publishes no throughput numbers (SURVEY §6);
a PyTorch NeRF at this exact workload runs ~3.3 it/s on an RTX 3090
(~13.5k rays/s), which we use as the vs_baseline denominator.

Methodology: a pipelined host loop of jitted steps (async dispatch — the
host never blocks between launches) with one hard device->host sync per
repetition, timed over several repetitions after a warmup/compile run.
Dispatch latency overlaps execution, so this measures device throughput.
The scanned variant runs n_inner steps inside one lax.scan program
(train/step.make_scanned_train_step) — zero dispatches between updates.

n_steps per sync matters on this backend: the device runs steps
back-to-back (an xplane trace shows 29.55 ms step spans with <0.1 ms of
internal gaps and zero inter-step gap), but the one hard sync costs
~25 ms of tunnel latency.  At n_steps=15 that inflated the reported
per-step time by ~1.7 ms (round-2's 31.5 ms vs the traced 29.55); at
n_steps=60 the artifact is bounded by ~0.4 ms.  Training runs sync only
at logging points (idx_print=1000), so the amortised number is the one
a real run sustains.
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _note(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)

BASELINE_RAYS_PER_SEC = 13_500.0  # RTX 3090 estimate (see module docstring)
V5E_PEAK_BF16 = 197e12            # TPU v5e peak bf16 FLOP/s (public spec)

# fused-MLP FLOPs per point (see kernels/fused_mlp.py cost estimate)
FLOPS_PER_PT_FULL = 2 * (64 * 256 + 6 * 256 * 256 + (64 + 256) * 256
                         + 8 * 256 + 256 * 256 + (256 + 32) * 128 + 8 * 128)
FLOPS_PER_PT_SIGMA = 2 * (64 * 256 + 6 * 256 * 256 + (64 + 256) * 256
                          + 8 * 256)


def _sync(x):
    """Hard device->host sync — on the remote TPU backend
    ``block_until_ready`` returns before execution finishes, so only a
    value transfer gives a true wall time."""
    return float(jnp.asarray(x).ravel()[0])


def bench_train(n_steps: int = 60, reps: int = 3, use_pallas: bool = True):
    from nerf_pytorch_paeng_tpu.config import NerfConfig
    from nerf_pytorch_paeng_tpu.train import (create_train_state,
                                              make_scanned_train_step,
                                              make_train_step)

    # defaults == reference lego workload (4096 rays, 64+128, 8x256)
    cfg = NerfConfig(near=2.0, far=6.0, use_pallas=use_pallas)
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx, cfg))

    rng = np.random.default_rng(0)
    sh = (cfg.N_rays, 3)
    o = jnp.asarray(rng.normal(size=sh), jnp.float32)
    d = jnp.asarray(rng.normal(size=sh), jnp.float32)
    rgb = jnp.asarray(rng.uniform(size=sh), jnp.float32)
    key = jax.random.PRNGKey(1)

    state0 = state
    _note("compiling train step...")
    state, m = step(state, o, d, rgb, key)   # warmup/compile
    _sync(m["loss"])
    _note("train step compiled")

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, m = step(state, o, d, rgb, key)
        _sync(m["loss"])
        times.append(time.perf_counter() - t0)
    sec_per_step = min(times) / n_steps

    # scanned variant: n_steps updates inside ONE lax.scan program
    _note(f"pipelined: {sec_per_step*1e3:.1f} ms/step; compiling scanned...")
    scanned = jax.jit(make_scanned_train_step(model, tx, cfg,
                                              n_inner=n_steps))
    stack = lambda x: jnp.broadcast_to(x, (n_steps, *x.shape))
    o_s, d_s, r_s = stack(o), stack(d), stack(rgb)
    st, ms = scanned(state0, o_s, d_s, r_s, key)
    _sync(ms["loss"])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        st, ms = scanned(st, o_s, d_s, r_s, key)
        _sync(ms["loss"])
        times.append(time.perf_counter() - t0)
    sec_per_step_scanned = min(times) / n_steps
    _note(f"scanned: {sec_per_step_scanned*1e3:.1f} ms/step")

    # fwd + recompute + backward ~= 4x forward FLOPs (residual-free
    # custom-VJP backward recomputes activations; kernels/fused_mlp_vjp.py)
    pts = cfg.N_rays * (cfg.N_samples_c + cfg.N_samples_c + cfg.N_samples_f)
    mfu = 4 * pts * FLOPS_PER_PT_FULL / sec_per_step / V5E_PEAK_BF16
    return cfg.N_rays / sec_per_step, sec_per_step, sec_per_step_scanned, mfu


def _train_blob_model(cfg, n_steps: int = 300, blob_r: float = 0.45,
                      blob_cutoff: float = 1.35, blob_amp: float = 8.0,
                      blob_hard_w: float = 0.0):
    """A trained full-size model with genuine empty space, so the render
    benchmark exercises content-dependent paths (occupancy culling).

    Field distillation rather than quick photometric training: short
    white-background photometric runs learn 'white fog' (acc≈1 everywhere,
    the classic background ambiguity) and nothing would cull; real
    200k-iter multi-view runs do carve out empty space, which distillation
    reproduces directly (utils/synth.fit_field_to_blob).

    Blob size picked for lego-like frame occupancy (~30% of an 800x800
    frame above the cull threshold), so the content-dependent render cost
    is representative of the headline blender workload.  ``blob_amp``
    sets the opacity front: 8.0 (default scenes) is a soft volumetric
    medium; 60.0 gives the hard surface-like front real 200k-iter
    training carves, which engages per-ray sample-window truncation."""
    from nerf_pytorch_paeng_tpu.models import init_nerf
    from nerf_pytorch_paeng_tpu.utils.synth import (fit_field_to_blob,
                                                    make_synth_scene)

    _, _, poses = make_synth_scene(n_views=1, H=8, W=8)
    model, params0 = init_nerf(cfg, jax.random.PRNGKey(0))
    _note(f"fitting blob model (r={blob_r}, cutoff={blob_cutoff}, "
          f"amp={blob_amp})...")
    # uniform_frac: also constrain never-sampled cube regions to zero
    # density, like a well-trained multi-view model (utils/synth docstring)
    # — the pre-cull support bounds (render_precull) need a globally
    # compact fitted field to be valid
    params, fit_loss = fit_field_to_blob(
        model, params0, jax.random.PRNGKey(1), n_steps=n_steps,
        n_pts=8192, L_x=cfg.L_x, L_d=cfg.L_d,
        blob_r=blob_r, blob_cutoff=blob_cutoff, blob_amp=blob_amp,
        blob_hard_w=blob_hard_w, uniform_frac=0.25)
    return model, params, poses, fit_loss


def bench_train_gated(n_steps: int = 60, reps: int = 3):
    """Occupancy-gated training throughput (cfg.train_precull) at the
    reference workload, on the two distilled scenes: the hard-surface
    front (the step-like opacity real 200k-iter training carves — where
    the feature pays, measured +47% on v5e) and the soft ~30%-occupancy
    blob (wide support intervals — measured a wash; gating recovers its
    own overhead).  From random init the bounds are invalid and gating is
    a no-op, so the mid-/late-training regime is what's representative.

    Rays are real camera-pixel rays (gating is geometry-dependent, unlike
    the content-independent ungated headline); support bounds are
    measured once from the distilled params (the production driver
    refreshes every train_precull_every steps — amortized to nothing).
    Exactness is pinned by tests/test_train_precull.py and the on-chip
    A/B (tools/bench_gated_train.py): loss bit-equal where the bounds
    are exact, |delta| ~1e-5 on razor fronts (the documented sub-cell
    grid-sampling trust, ops/occupancy.py).
    """
    from nerf_pytorch_paeng_tpu.config import NerfConfig
    from nerf_pytorch_paeng_tpu.ops.rays import get_rays
    from nerf_pytorch_paeng_tpu.train.precull import (
        make_train_support_program, train_precull_enabled)
    from nerf_pytorch_paeng_tpu.train.state import TrainState, make_optimizer
    from nerf_pytorch_paeng_tpu.train.step import make_train_step

    cfg = NerfConfig(near=2.0, far=6.0, train_precull=True)
    assert train_precull_enabled(cfg)
    tx = make_optimizer(cfg)
    prog, _ = make_train_support_program(cfg)
    H = W = 800
    focal = 0.9 * W
    K = jnp.asarray([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                    jnp.float32)
    key = jax.random.PRNGKey(2)

    step_g = None
    out = {}
    for name, fit_kw in (("hard", dict(n_steps=1500, blob_amp=60.0,
                                       blob_hard_w=0.08)),
                         ("std", dict())):
        model, params, poses, _ = _train_blob_model(cfg, **fit_kw)
        if step_g is None:
            step_g = jax.jit(make_train_step(model, tx, cfg, precull=True))
        ro, rd = get_rays(H, W, K, jnp.asarray(poses[0][:3, :4]))
        idx = jax.random.choice(jax.random.PRNGKey(0), H * W,
                                (cfg.N_rays,), replace=False)
        ro, rd = ro.reshape(-1, 3)[idx], rd.reshape(-1, 3)[idx]
        rgb = jax.random.uniform(jax.random.PRNGKey(1), (cfg.N_rays, 3))
        bc, bf = prog(params)
        # invalid bounds widen every interval to [near, far] — the "gated"
        # number would silently measure ungated compute plus sort overhead
        valid = bool(jax.device_get(bc[3])[0]) and bool(
            jax.device_get(bf[3])[0])
        if not valid:
            raise RuntimeError(
                f"gated train [{name}]: support bounds invalid — the "
                "distilled scene is not globally compact; gated timing "
                "would be meaningless")
        support = (tuple(bc), tuple(bf))
        state0 = TrainState(jnp.zeros((), jnp.int32), params,
                            jax.jit(tx.init)(params))
        _note(f"gated train [{name}]: compiling/warming...")
        st, m = step_g(state0, ro, rd, rgb, key, support)
        _sync(m["loss"])
        out[f"{name}_gate_frac"] = round(float(jax.device_get(
            m["gate_frac"])), 3)
        times = []
        for _ in range(reps):
            st = state0
            t0 = time.perf_counter()
            for _ in range(n_steps):
                st, m = step_g(st, ro, rd, rgb, key, support)
            _sync(m["loss"])
            times.append(time.perf_counter() - t0)
        out[name] = min(times) / n_steps
        _note(f"gated train [{name}]: {out[name]*1e3:.2f} ms/step")
    return out


def bench_render(H: int = 800, W: int = 800, block=None,
                 reps: int = 3, use_pallas: bool = True):
    from nerf_pytorch_paeng_tpu.config import NerfConfig
    from nerf_pytorch_paeng_tpu.eval.frame import get_frame_renderer

    cfg = NerfConfig(near=2.0, far=6.0, use_pallas=use_pallas)
    model, params, poses, fit_loss = _train_blob_model(cfg)
    focal = 0.9 * W
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])
    c2w = jnp.asarray(poses[0][:3, :4])

    def time_renderer(rc, prm, tag=""):
        _note(f"compiling/warming {rc}{tag} renderer...")
        # get_frame_renderer: one cached renderer per render_cull mode,
        # shared across the three scenes, so phase-2 programs compile once
        r = get_frame_renderer(model, dataclasses.replace(cfg, render_cull=rc),
                               H, W, K, block_rays=block)
        # warm with the EXACT keys the timed reps use: stochastic coarse
        # z_vals shift the per-frame (block size, sample count) cover, and
        # an unseen phase-2 program compiles for ~1 min on the remote
        # backend — inside the timed region, if not warmed here
        for i in range(reps):
            rgb, disp = r(prm, c2w, jax.random.PRNGKey(2 + i))
        _sync(rgb)
        _note(f"{rc}{tag} renderer warm")
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            rgb, disp = r(prm, c2w, jax.random.PRNGKey(2 + i))
            _sync(rgb)
            times.append(time.perf_counter() - t0)
        return min(times)

    t_auto = time_renderer("auto", params)
    t_exact = time_renderer("none", params)

    # adversarial high-occupancy scene (>=50% of the frame above the cull
    # threshold — round-2 VERDICT weak #8): same renderer (params-free
    # closures are cached), bigger blob
    _, params_hi, _, fit_loss_hi = _train_blob_model(
        cfg, blob_r=0.54, blob_cutoff=1.62)
    t_auto_hi = time_renderer("auto", params_hi, tag=" (hi-occupancy)")

    # hard-surface scene (same geometry as the standard scene, amp=60):
    # the opacity front real training carves — per-ray transmittance
    # collapses at the surface, engaging sample-window truncation
    # (render_trunc_eps); the soft scenes above keep their round-2/3
    # definitions for cross-round comparability
    # 1500 fit steps: the step-like front needs ~2.5x the soft blob's
    # distillation budget to converge (loss 0.25 -> 0.04; one scanned
    # program either way, seconds on the chip)
    _, params_hard, _, fit_loss_hard = _train_blob_model(
        cfg, n_steps=1500, blob_amp=60.0, blob_hard_w=0.08)
    t_auto_hard = time_renderer("auto", params_hard, tag=" (hard-surface)")

    flops_exact = H * W * (cfg.N_samples_c * FLOPS_PER_PT_SIGMA
                           + (cfg.N_samples_c + cfg.N_samples_f)
                           * FLOPS_PER_PT_FULL)
    mfu_exact = flops_exact / t_exact / V5E_PEAK_BF16
    return (t_auto, t_exact, t_auto_hi, t_auto_hard, mfu_exact,
            fit_loss, fit_loss_hi, fit_loss_hard)


def main():
    # persistent compile cache: correctness-neutral, kills the 20-60 s
    # per-program remote compiles on repeat runs (utils/compile_cache.py)
    from nerf_pytorch_paeng_tpu.utils.compile_cache import (
        enable_persistent_compile_cache)
    enable_persistent_compile_cache()
    dev = jax.devices()[0]
    rays_per_sec, sec_per_step, sec_scanned, train_mfu = bench_train()
    extras = {}
    try:
        (t_auto, t_exact, t_auto_hi, t_auto_hard, mfu_exact, fit_loss,
         fit_loss_hi, fit_loss_hard) = bench_render()
        extras = {
            "render_800x800_sec": round(t_auto, 3),
            "render_800x800_sec_hi": round(t_auto_hi, 3),
            "render_800x800_sec_hard": round(t_auto_hard, 3),
            "render_800x800_sec_exact": round(t_exact, 3),
            "render_mfu_exact_est": round(mfu_exact, 3),
            "render_model_fit_loss": round(fit_loss, 4),
            "render_model_fit_loss_hi": round(fit_loss_hi, 4),
            "render_model_fit_loss_hard": round(fit_loss_hard, 4),
        }
    except Exception as e:  # never lose the train number to a render fault
        extras = {"render_800x800_sec": f"failed: {type(e).__name__}"}
    try:
        gated = bench_train_gated()
        extras["train_gated_hard_ms_per_step"] = round(
            gated["hard"] * 1e3, 2)
        # the production default (train_precull=auto) runs THIS number
        # wherever the policy engages (hard/carved content; certified at
        # 50k-iter scale in docs/artifacts/GATED_POLICY_r05.json) and
        # the ungated headline elsewhere
        extras["train_gated_hard_rays_per_sec"] = round(
            4096 / gated["hard"], 1)
        extras["train_gated_hard_vs_baseline"] = round(
            4096 / gated["hard"] / BASELINE_RAYS_PER_SEC, 3)
        extras["train_gated_hard_gate_frac"] = gated["hard_gate_frac"]
        extras["train_gated_std_ms_per_step"] = round(gated["std"] * 1e3, 2)
        extras["train_gated_std_gate_frac"] = gated["std_gate_frac"]
    except Exception as e:
        extras["train_gated_hard_ms_per_step"] = f"failed: {type(e).__name__}"
    result = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "sec_per_train_step_4096rays": round(sec_per_step, 5),
        "sec_per_train_step_scanned": round(sec_scanned, 5),
        "train_mfu_est": round(train_mfu, 3),
        **extras,
        "device": str(dev),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
