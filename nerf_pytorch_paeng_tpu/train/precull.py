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


def train_precull_mode(cfg) -> str:
    """Normalize cfg.train_precull to 'auto' | 'on' | 'off'.

    'auto' (the default) and 'on' both run the policy-guarded gated path
    where applicable; they differ only in that an explicit 'on' (or
    legacy bool True) warns when the path is inapplicable instead of
    silently running ungated."""
    v = cfg.train_precull
    if isinstance(v, bool):
        return "on" if v else "off"
    s = str(v).strip().lower()
    if s == "auto":
        return "auto"
    return "on" if s in ("on", "true", "t", "yes", "y", "1") else "off"


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
    return bool(train_precull_mode(cfg) != "off"
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


def make_train_support_program(cfg, poses=None, K=None, hw=None):
    """One jitted program: flax params -> ((lo, hi, r, valid) coarse,
    (lo, hi, r, valid) fine).  Packs each module in-trace and measures
    its support on a ``render_precull_grid``^3 grid over the
    [-half, half]^3 cube (half = render_precull_halfside or far, shared
    with the eval pre-cull).  ~2 sigma-grid evaluations per refresh —
    microseconds of device time at the production cadence.

    With the TRAINING camera set (``poses`` [M, 3/4, 4], ``K``, ``hw``)
    the support measurement is restricted to the training-frustum union
    (ops/occupancy.frustum_union_mask, computed once here): density the
    MLP extrapolates into never-sampled regions is irrelevant to
    training — no training ray ever samples it — but would otherwise
    reach the cube boundary and invalidate the bounds on every real
    photometric run (measured: 20k-iter runs never validate without the
    mask).  Sound for gating TRAINING steps only; the eval pre-cull
    keeps the unmasked global bounds."""
    from ..eval.frame import _precull_grid, _precull_half
    from ..kernels.fused_mlp import pack_nerf_mlp_params
    from ..ops.occupancy import (frustum_union_mask,
                                 support_bounds_from_sigma)
    from ..ops.render import make_pallas_sigma_fn

    half = _precull_half(cfg)
    grid = _precull_grid(cfg)
    domain = None
    if poses is not None:
        domain = jax.jit(frustum_union_mask, static_argnums=(2, 3, 4, 5,
                                                             6, 7))(
            jnp.asarray(poses)[:, :3, :4], jnp.asarray(K),
            int(hw[0]), int(hw[1]), float(cfg.near), float(cfg.far),
            half, grid)

    def prog(params):
        def bounds_of(mlp_params):
            packed = pack_nerf_mlp_params(mlp_params, L_x=cfg.L_x,
                                          L_d=cfg.L_d)
            return support_bounds_from_sigma(
                make_pallas_sigma_fn(packed, cfg), half, grid=grid,
                domain_mask=domain)

        return bounds_of(params["coarse"]), bounds_of(params["fine"])

    return jax.jit(prog), half


def make_gate_frac_estimator(cfg):
    """Jitted predictor of the gated step's skipped-grid-step fraction
    (the ``gate_frac`` metric) on a representative ray batch, WITHOUT
    running any MLP kernel — only the interval + gate-plan math the gated
    pass itself uses (ops/render.train_gate_plan, same tile selection).

    Prediction model, per pass:
    - coarse: simulated with the stratified sampler's bin midpoints — a
      jittered draw moves a sample only within its bin, so row activity
      can differ from a real step only at interval-boundary bins;
    - fine: a LOWER bound — the S_f pdf samples are assumed spread over
      the ray's whole active interval, while in reality they concentrate
      at surfaces strictly inside it, so predicted row activity is a
      superset and the predicted gate fraction a floor.  Provable-miss
      rays (empty interval) gate fully under both models, and they are
      what dominates real wins (the hard-scene A/B's 0.45 miss fraction).

    Row-count-weighted across the two passes exactly like the step's
    ``gate_frac`` metric (kernel cost is proportional to active
    (ray-tile, 8-row) grid steps).  The driver compares the estimate
    against ``cfg.train_precull_min_gate`` at every bounds refresh and
    runs the UNGATED program below it: gating pays a ~13% span-sort +
    small-tile overhead, so low-gate scenes (wide soft supports — the
    20k-iter photometric A/B measured 132.5k -> 116.7k rays/s ungated ->
    gated, docs/artifacts/GATED_TRAIN_AB_r03.json) must fall back.

    Returns ``est(bounds_c, bounds_f, rays_o [N, 3], rays_d [N, 3]) ->
    float32 scalar``; N should be the per-shard ray count the gated
    kernels see.
    """
    from ..eval.frame import _precull_half
    from ..ops.render import (_train_rays_tile, train_gate_plan,
                              train_gate_tile, train_support_intervals)

    half = _precull_half(cfg)
    near, far = float(cfg.near), float(cfg.far)
    s_c, s_f = int(cfg.N_samples_c), int(cfg.N_samples_f)

    def est(bounds_c, bounds_f, rays_o, rays_d):
        n = rays_o.shape[0]
        tile = train_gate_tile(cfg, n, _train_rays_tile(n) or 2048)
        mids = near + (far - near) * (jnp.arange(s_c, dtype=jnp.float32)
                                      + 0.5) / s_c
        z_c = jnp.broadcast_to(mids[:, None], (s_c, n))
        lo_c, hi_c = train_support_intervals(rays_o, rays_d, bounds_c,
                                             half, near, far)
        *_, gf_c = train_gate_plan(z_c, lo_c, hi_c, tile)
        if s_f <= 0:
            return gf_c
        lo_f, hi_f = train_support_intervals(rays_o, rays_d, bounds_f,
                                             half, near, far)
        # fine z's: coarse midpoints + S_f points spread across each
        # ray's clamped active interval (empty interval -> all points at
        # lo_f > hi_f -> inactive, i.e. miss rays gate fully)
        lo = jnp.maximum(lo_f, near)
        width = jnp.maximum(jnp.minimum(hi_f, far) - lo, 0.0)
        u = (jnp.arange(s_f, dtype=jnp.float32) + 0.5) / s_f
        z_f = lo[None] + width[None] * u[:, None]             # [S_f, N]
        z_all = jnp.sort(jnp.concatenate([z_c, z_f], 0), 0)
        *_, gf_f = train_gate_plan(z_all, lo_f, hi_f, tile)
        r_c, r_f = s_c // 8, (s_c + s_f) // 8
        return (gf_c * r_c + gf_f * r_f) / (r_c + r_f)

    return jax.jit(est)
