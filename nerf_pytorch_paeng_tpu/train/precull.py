"""Occupancy-gated training support (``cfg.train_precull``).

The training analog of the eval pre-cull (eval/frame.py phase-1 gating):
conservative support bounds of each MLP module's density field — the
coarse AND fine networks are independent, so each gets its own bounds —
are measured on a grid every ``train_precull_every`` steps, and the
train step gates its kernel work to each ray's per-module support
interval (ops/render.render_rays_train + the gated custom-VJP pair in
kernels/fused_mlp_vjp.py).

Exactness model (why gating does not change training):
- A sample provably outside a module's support has raw density logit
  <= 0, so its compositing weight is exactly 0 in the ungated step too
  (relu + alpha), and its gradient contribution is identically zero:
  relu' kills the density cotangent, the zero weight kills the color
  cotangents.  Skipping it changes nothing but fp32 accumulation order.
- Between refreshes the bounds can go stale only by support GROWTH,
  and only via non-local weight updates (a <= 0 logit receives no local
  gradient through the relu, so gated samples cannot be the ones pushing
  it up).  The periodic refresh re-measures the live field; the grid's
  sub-cell trust is the same one the eval pre-cull and tau-cull carry
  (ops/occupancy.py).

The reference has no equivalent (it evaluates every sample of every ray
every step, train.py:53 -> nerf_process.py:185-213); this is a TPU-side
speed feature, off by default so the default trajectory remains the
reference-parity one.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def train_precull_enabled(cfg, n_rays: int = 0) -> bool:
    """Gating applies only where the gated kernels run: blender orbit
    scenes (origin-centered support cube), the ray-major training-kernel
    path, and a usable support grid (off-TPU the grid MLP needs an
    explicit small ``render_precull_grid`` — interpret mode at 128^3 is
    prohibitive)."""
    from ..eval.frame import _precull_grid
    from ..ops.render import supports_train_rays_kernels
    from .step import _supports_pallas_train

    n = n_rays or cfg.N_rays
    return bool(cfg.train_precull
                and cfg.data_type == "blender"
                and _supports_pallas_train(cfg)
                and cfg.use_rays_train
                and supports_train_rays_kernels(cfg, n)
                and _precull_grid(cfg) > 0)


def train_precull_active(cfg, mesh) -> bool:
    """train_precull_enabled AND the mesh takes a gated step path: the
    shard_map DP path (data-only mesh, divisible ray batch — each shard
    gates its N_rays/n_data slice) or a single device.  The GSPMD
    fallbacks (TP meshes, non-divisible batches) run the ungated 5-arg
    step, so the driver must not pass support there
    (parallel/sharding.make_train_step_for_mesh mirrors this gate)."""
    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

    shape = dict(mesh.shape)
    n_model = shape.get(MODEL_AXIS, 1)
    n_data = shape.get(DATA_AXIS, 1)
    if n_model > 1:
        return False
    n_shards = max(n_data, 1)
    if cfg.N_rays % n_shards != 0:
        return False
    # per-shard ray count is what the gated kernels see
    return train_precull_enabled(cfg, cfg.N_rays // n_shards)


def make_train_support_program(cfg):
    """One jitted program: flax params -> ((lo, hi, r, valid) coarse,
    (lo, hi, r, valid) fine).  Packs each module in-trace and measures
    its support on a ``render_precull_grid``^3 grid over the
    [-half, half]^3 cube (half = render_precull_halfside or far, shared
    with the eval pre-cull).  ~2 sigma-grid evaluations per refresh —
    microseconds of device time at the production cadence."""
    from ..eval.frame import _precull_grid, _precull_half
    from ..kernels.fused_mlp import pack_nerf_mlp_params
    from ..ops.occupancy import support_bounds_from_sigma
    from ..ops.render import make_pallas_sigma_fn

    half = _precull_half(cfg)
    grid = _precull_grid(cfg)

    def prog(params):
        def bounds_of(mlp_params):
            packed = pack_nerf_mlp_params(mlp_params, L_x=cfg.L_x,
                                          L_d=cfg.L_d)
            return support_bounds_from_sigma(
                make_pallas_sigma_fn(packed, cfg), half, grid=grid)

        return bounds_of(params["coarse"]), bounds_of(params["fine"])

    return jax.jit(prog), half
