"""The jitted train step: render -> loss -> grad -> Adam update, one program.

Behavioral parity target: reference train.py:12-70 — coarse+fine MSE loss
(train.py:60-66), PSNR metrics, Adam step.  Unlike the reference there are
no per-step host<->device copies (train.py:18-21) and no chunked host
loops: the optimizer update fuses into the same XLA program as the
renderer, and under pjit the ray batch shards over the mesh 'data' axis
with gradient psum inserted by GSPMD.

Two batch modes, like the reference:
- global-batch: the step receives a pre-sliced [N,3]x3 ray batch
  (reference train.py:25-32),
- per-image: the step receives one image's full ray fields and samples
  N_rays pixels *inside* the program (reference train.py:35-45), with a
  separately compiled precrop variant for the first precrop_iters steps.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.nerf import NeRF
from ..ops.rays import gather_rays, sample_pixels
from ..ops.render import maybe_ndc, render_rays_from_cfg
from .state import TrainState


def mse2psnr(mse):
    """-10·log10(mse), reference utils.py:17."""
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def _supports_pallas_train(cfg) -> bool:
    # L >= 1: the fused kernels always emit at least one sin/cos band
    # (kernels/fused_mlp._build_emb), so L=0 configs must take the XLA path.
    return (cfg.use_pallas and cfg.netDepth == 8 and cfg.netWidth == 256
            and 1 <= cfg.L_x <= 10 and 1 <= cfg.L_d <= 4)


def _loss_and_metrics(model, params, rays_o, rays_d, target, key, cfg,
                      force_xla: bool = False, support=None):
    from ..ops.render import (make_pallas_train_field_fns,
                              make_xla_field_fns, render_rays_train,
                              supports_train_rays_kernels)
    use_pallas = _supports_pallas_train(cfg) and not force_xla
    if (use_pallas and cfg.use_rays_train
            and supports_train_rays_kernels(cfg, rays_o.shape[0])):
        # ray-major custom-VJP kernels: positions built in-kernel, no
        # [3,P] plane buffers (ops/render.render_rays_train); ``support``
        # (cfg.train_precull) additionally occupancy-gates each pass to
        # its module's support interval — this is the only path that
        # consumes it (train/precull.train_precull_enabled mirrors that)
        out = render_rays_train(params, rays_o, rays_d, key, cfg,
                                support=support)
    else:
        if use_pallas:
            coarse, fine = make_pallas_train_field_fns(params, cfg)
        else:
            coarse, fine = make_xla_field_fns(model, params, cfg)
        out = render_rays_from_cfg(coarse, fine, rays_o, rays_d, key, cfg)
    loss_c = jnp.mean((out.rgb_c - target) ** 2)
    if cfg.N_samples_f > 0:
        loss_f = jnp.mean((out.rgb_f - target) ** 2)
        loss = loss_c + loss_f
        metrics = dict(loss=loss, loss_c=loss_c, loss_f=loss_f,
                       psnr_c=mse2psnr(loss_c), psnr_f=mse2psnr(loss_f))
    else:
        loss = loss_c
        metrics = dict(loss=loss, loss_c=loss_c, psnr_c=mse2psnr(loss_c))
    metrics["psnr"] = mse2psnr(loss)
    if getattr(out, "gate_frac", None) is not None:
        # occupancy-gating observability: fraction of kernel grid steps
        # skipped this step (train_precull; rises as empty space carves)
        metrics["gate_frac"] = out.gate_frac
    return loss, metrics


def _pmean_metrics(metrics, axis_name):
    """Cross-shard metric reduction: pmean the (linear-in-MSE) loss
    entries, then RE-DERIVE the PSNRs from the averaged losses — PSNR is
    nonlinear in MSE, so a pmean of per-shard PSNRs would be biased high
    and inconsistent with the logged loss (psnr != mse2psnr(loss))."""
    out = {k: jax.lax.pmean(v, axis_name) for k, v in metrics.items()
           if not k.startswith("psnr")}
    out["psnr"] = mse2psnr(out["loss"])
    out["psnr_c"] = mse2psnr(out["loss_c"])
    if "loss_f" in out:
        out["psnr_f"] = mse2psnr(out["loss_f"])
    return out


def make_train_step(model: NeRF, tx: optax.GradientTransformation, cfg,
                    H: int = 0, W: int = 0, focal: float = 0.0,
                    axis_name: str = None, force_xla: bool = False,
                    precull: bool = False
                    ) -> Callable[..., Tuple[TrainState, Dict[str, Any]]]:
    """Global-batch train step: (state, rays_o, rays_d, target, key).

    H/W/focal are only consumed for LLFF's NDC projection — the reference
    applies NDC per step inside the render (nerf_process.py:224-226) even
    in global-batch mode, so the pool holds raw camera rays.

    With ``axis_name`` the step is shard_map-ready: the sampling key is
    decorrelated per shard and gradients/metrics are pmean'd over the axis
    (the explicit-collective DP path used with the Pallas kernels, which
    cannot live under GSPMD auto-sharding).

    ``force_xla`` pins the field functions to the XLA path even when the
    fused Pallas kernels would apply — required under GSPMD on a >1-device
    mesh, where pallas_call cannot be partitioned.

    ``precull`` (cfg.train_precull; train/precull.py) changes the
    signature to (state, rays_o, rays_d, target, key, support) where
    ``support`` = (coarse bounds, fine bounds), each a (lo, hi, radius,
    valid) tuple from the support program — the step occupancy-gates each
    MLP pass to its module's per-ray support interval.
    """
    half = 0.0
    if precull:
        from ..eval.frame import _precull_half
        half = _precull_half(cfg)

    def train_step(state: TrainState, rays_o, rays_d, target, key,
                   support=None):
        key = jax.random.fold_in(key, state.step)
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        rays_o, rays_d = maybe_ndc(rays_o, rays_d, H, W, focal, cfg.data_type)
        sup = None if support is None else (*support, half)

        def loss_fn(params):
            return _loss_and_metrics(model, params, rays_o, rays_d,
                                     target, key, cfg, force_xla=force_xla,
                                     support=sup)

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = _pmean_metrics(metrics, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), metrics

    if not precull:
        def train_step_plain(state, rays_o, rays_d, target, key):
            return train_step(state, rays_o, rays_d, target, key)
        return train_step_plain
    return train_step


def make_scanned_train_step(model: NeRF, tx: optax.GradientTransformation,
                            cfg, H: int = 0, W: int = 0, focal: float = 0.0,
                            n_inner: int = 8, precull: bool = False):
    """Run ``n_inner`` train steps inside one XLA program via lax.scan.

    The host hands over a [n_inner, N, 3] stack of pre-sliced ray batches
    and gets back the state after n_inner updates — zero host round-trips
    between updates, so dispatch latency amortises to nothing.  Metrics
    returned are the scan-stacked per-step values.

    With ``precull`` the scanned fn gains a trailing ``support`` arg,
    constant across the chunk (the driver refreshes bounds only at chunk
    boundaries — train/precull.py staleness notes).
    """
    step = make_train_step(model, tx, cfg, H, W, focal, precull=precull)

    def scanned(state: TrainState, o_stack, d_stack, rgb_stack, key,
                support=None):
        # the stack's leading axis IS the step count — a mismatched
        # n_inner would otherwise silently run a different number of
        # optimizer updates than the caller asked for
        assert o_stack.shape[0] == n_inner, (o_stack.shape, n_inner)

        def body(st, xs):
            o, d, rgb = xs
            if precull:
                st, m = step(st, o, d, rgb, key, support)
            else:
                st, m = step(st, o, d, rgb, key)
            return st, m

        state, metrics = jax.lax.scan(
            body, state, (o_stack, d_stack, rgb_stack))
        return state, metrics

    if not precull:
        def scanned_plain(state, o_stack, d_stack, rgb_stack, key):
            return scanned(state, o_stack, d_stack, rgb_stack, key)
        return scanned_plain
    return scanned


def make_image_train_step(model: NeRF, tx: optax.GradientTransformation, cfg,
                          H: int, W: int, K, axis_name: str = None,
                          force_xla: bool = False, batch_constraint=None,
                          jit: bool = True, precull: bool = False):
    """Per-image train step: generates the image's rays and samples N_rays
    pixels *inside* the program (reference recomputes rays on host per step,
    train.py:43 / rays.py:20).  `precrop` is a static arg — the loop
    compiles two variants.

    Distribution modes (reference train.py:35-45 is single-GPU; here the
    blender flagship configs shard over the mesh):
    - ``axis_name``: shard_map-ready — image/pose arrive replicated, the
      *same* global pixel set is drawn on every shard (same key), each
      shard keeps its N_rays/axis_size slice, renders with a decorrelated
      jitter key, and pmeans grads/metrics: the gradient equals the
      single-device gradient over the same pixel set.  This is the path
      that supports the fused Pallas kernels.
    - ``batch_constraint``: GSPMD — the gathered per-pixel batch gets a
      with_sharding_constraint so GSPMD slices the render over the mesh
      (pair with ``force_xla`` on >1-device meshes; pallas_call cannot be
      partitioned by GSPMD).
    """
    from ..ops.rays import get_rays
    # read focal from the HOST-side K before the device upload: float() of
    # a device element is an eager round-trip (~25 ms sync on the remote
    # backend) at every step-builder construction
    focal = float(np.asarray(K)[0, 0])
    K = jnp.asarray(K, jnp.float32)
    half = 0.0
    if precull:
        from ..eval.frame import _precull_half
        half = _precull_half(cfg)

    def train_step(state: TrainState, image, pose, key,
                   support=None, precrop: bool = False):
        key = jax.random.fold_in(key, state.step)
        key_px, key_render = jax.random.split(key)
        rays_o, rays_d = get_rays(H, W, K, pose)
        coords = sample_pixels(key_px, H, W, cfg.N_rays,
                               precrop=precrop, precrop_frac=cfg.precrop_frac)
        if axis_name is not None:
            size = jax.lax.axis_size(axis_name)
            rank = jax.lax.axis_index(axis_name)
            per = cfg.N_rays // size
            coords = jax.lax.dynamic_slice_in_dim(coords, rank * per, per, 0)
            key_render = jax.random.fold_in(key_render, rank)
        ro, rd, target = gather_rays(rays_o, rays_d, image, coords)
        ro, rd = maybe_ndc(ro, rd, H, W, focal, cfg.data_type)
        if batch_constraint is not None:
            ro = jax.lax.with_sharding_constraint(ro, batch_constraint)
            rd = jax.lax.with_sharding_constraint(rd, batch_constraint)
            target = jax.lax.with_sharding_constraint(target, batch_constraint)
        sup = None if support is None else (*support, half)

        def loss_fn(params):
            return _loss_and_metrics(model, params, ro, rd, target,
                                     key_render, cfg, force_xla=force_xla,
                                     support=sup)

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = _pmean_metrics(metrics, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), metrics

    if not precull:
        # keep the historical signature (no support arg) for every
        # non-gated caller, incl. the shard_map wrappers whose in_specs
        # count the positional args
        def train_step_plain(state, image, pose, key, precrop=False):
            return train_step(state, image, pose, key, precrop=precrop)
        step = train_step_plain
    else:
        step = train_step
    if jit:
        return jax.jit(step, static_argnames=("precrop",))
    return step
