"""Sharding rules + the pjit-ed train/render steps.

Strategy (TPU-native; the reference is single-GPU with no equivalent):

- **Data parallel** (load-bearing): the ray batch shards over the mesh
  ``data`` axis via input shardings; params are replicated there, so GSPMD
  inserts the gradient ``psum`` over ICI automatically.
- **Tensor parallel** (optional, ``n_model_shards > 1``): trunk Dense
  kernels alternate column-/row-parallel over the ``model`` axis
  (Megatron-style), annotated purely by parameter path — the model code
  stays mesh-agnostic.  At width 256 this is a capability (and a dryrun
  requirement), not a win; it becomes one at netWidth ≳ 2048.
- **Sample-axis sharding** (the sequence/context-parallel analog, SURVEY
  §5): the per-ray sample axis splits over a mesh axis with the
  transmittance computed as a distributed log-space prefix sum — see
  parallel/sp.py (ppermute for the neighbor bin edge, all_gather for the
  cross-shard prefix, psum for the weighted reductions).  Demonstrated and
  equality-tested on an 8-device mesh (tests/test_sample_sharding.py); at
  the reference's 64-192 samples it is a capability, not a win — it
  becomes one when a ray's sample axis outgrows a chip (thousands of
  samples).
- Pipeline/expert parallelism are structurally inapplicable (a 2-module
  MLP, no MoE) — documented here per SURVEY §2's absence table.

Optimizer state inherits param shardings for free: ``tx.init`` runs on
already-sharded params, and Adam's mu/nu mirror them.
"""
from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def param_partition_specs(params: Any, n_model: int = 1) -> Any:
    """PartitionSpec pytree for the NeRF params, keyed by path.

    With n_model == 1 everything is replicated (pure DP).  Otherwise trunk
    kernels alternate (None, 'model') / ('model', None) Megatron-style and
    the wide heads shard their width-sized axis — except where a dim isn't
    divisible by ``n_model`` (e.g. the post-skip trunk layer's input is
    width + in_ch_x = 319 on the reference architecture), where the spec
    falls back column-parallel or replicated.  Biases mirror their kernel's
    output-dim sharding.
    """
    if n_model <= 1:
        return jax.tree_util.tree_map(lambda _: P(), params)

    def kernel_spec(path: str, shape) -> P:
        d_in, d_out = int(shape[0]), int(shape[1])
        col = P(None, MODEL_AXIS) if d_out % n_model == 0 else P()
        row = P(MODEL_AXIS, None) if d_in % n_model == 0 else col
        m = re.search(r"trunk_(\d+)", path)
        if m:
            return col if int(m.group(1)) % 2 == 0 else row
        if "feature" in path or "density" in path or "color" in path:
            return row                   # row-parallel heads off the trunk
        if "view" in path:
            return col                   # column-parallel view branch
        return P()

    def walk(tree, prefix=""):
        if isinstance(tree, dict) and "kernel" in tree:
            ks = kernel_spec(prefix, tree["kernel"].shape)
            out = {"kernel": ks}
            if "bias" in tree:  # bias shards iff the output dim does
                out["bias"] = P(MODEL_AXIS) if ks == P(None, MODEL_AXIS) \
                    else P()
            return out
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}/{k}") for k, v in tree.items()}
        return P()

    return walk(params)


def shard_params(params: Any, mesh: Mesh, n_model: int = 1) -> Any:
    """device_put params onto the mesh with their partition specs."""
    specs = param_partition_specs(params, n_model)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def commit_replicated(tree: Any, mesh: Mesh) -> Any:
    """device_put every leaf that has no committed sharding onto the mesh,
    replicated; committed leaves (TP-sharded params, jit outputs) are left
    untouched.

    Why: a jitted step called with UNcommitted inputs compiles once for
    Unspecified shardings, then its committed outputs feed the next call
    and force a SECOND compile of the identical program — on the remote
    backend a multi-minute stall mid-training loop.  Committing everything
    up front makes the first call's signature match steady state."""
    rep = NamedSharding(mesh, P())

    def put(x):
        if isinstance(x, jax.Array) and x.committed:
            return x
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(put, tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Rays/pixels shard their leading axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def make_sharded_train_step(train_step, mesh: Mesh):
    """jit the train step with ray-batch inputs pinned to the data axis
    (GSPMD path: works for XLA field functions and for TP, exact parity
    with single-device numerics).

    The state argument keeps whatever shardings its arrays carry (params
    replicated or TP-sharded); the constraint on the batch is what makes
    GSPMD slice the render and psum the grads.
    """
    bs = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())

    def step(state, rays_o, rays_d, target, key):
        rays_o = jax.lax.with_sharding_constraint(rays_o, bs)
        rays_d = jax.lax.with_sharding_constraint(rays_d, bs)
        target = jax.lax.with_sharding_constraint(target, bs)
        return train_step(state, rays_o, rays_d, target, key)

    return jax.jit(step, donate_argnums=(0,))


def make_shardmap_train_step(axis_step, mesh: Mesh, precull: bool = False):
    """Explicit-collective DP: shard_map the step over the 'data' axis.

    ``axis_step`` must be built with ``make_train_step(...,
    axis_name='data')`` so it pmeans grads/metrics itself.  This is the
    path that supports the Pallas kernels (pallas_call cannot be sliced by
    GSPMD; under shard_map each shard runs the kernel on its own rays).
    Per-shard jitter keys are decorrelated via axis_index, so the random
    stream differs from (but is statistically identical to) single-device.

    With ``precull`` the step carries a trailing replicated ``support``
    pytree (per-module bounds, train/precull.py) — each shard gates its
    own ray slice against the same bounds.
    """
    state_spec = P()  # replicated pytree prefix
    in_specs = (state_spec, P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P())
    if precull:
        in_specs = in_specs + (P(),)
    step = jax.shard_map(
        axis_step, mesh=mesh,
        in_specs=in_specs,
        out_specs=(state_spec, state_spec),
        check_vma=False,
    )
    step = jax.jit(step, donate_argnums=(0,))
    step.gated = bool(precull)
    return step


def make_train_step_for_mesh(model, tx, cfg, mesh: Mesh,
                             H: int = 0, W: int = 0, focal: float = 0.0,
                             precull: bool = False):
    """Pick the right distributed train step for this config/mesh:
    shard_map DP for the Pallas kernels; GSPMD otherwise (incl. TP).

    ``precull`` (cfg.train_precull) applies only where the gated kernels
    run — the shard_map/single-device Pallas paths; the GSPMD fallback
    ignores it.  The returned step carries a ``gated`` attribute stating
    whether it actually takes the trailing support argument — the driver
    asserts it against train_precull_active, so predicate drift between
    this builder and train/precull.py fails loudly at startup instead of
    mid-run."""
    from ..train.step import _supports_pallas_train, make_train_step

    n_model = dict(mesh.shape).get(MODEL_AXIS, 1)
    n_data = dict(mesh.shape).get(DATA_AXIS, 1)
    # shard_map needs the ray batch to divide the data axis exactly;
    # otherwise fall through to GSPMD, which pads uneven shards itself.
    if (_supports_pallas_train(cfg) and n_model == 1 and n_data > 1
            and cfg.N_rays % n_data == 0):
        step = make_train_step(model, tx, cfg, H, W, focal,
                               axis_name=DATA_AXIS, precull=precull)
        return make_shardmap_train_step(step, mesh, precull=precull)
    if precull and n_model * n_data == 1:
        # gated single-device step (the GSPMD wrapper below has the 5-arg
        # signature; gating needs the trailing support arg)
        step = make_train_step(model, tx, cfg, H, W, focal, precull=True)
        step = jax.jit(step, donate_argnums=(0,))
        step.gated = True
        return step
    # GSPMD path: pallas_call cannot be partitioned by GSPMD, so on a
    # >1-device mesh (TP, or mixed shapes) the field functions must be the
    # XLA ones even when the fused kernels would apply on one device.
    force_xla = _supports_pallas_train(cfg) and n_model * n_data > 1
    step = make_train_step(model, tx, cfg, H, W, focal, force_xla=force_xla)
    step = make_sharded_train_step(step, mesh)
    step.gated = False
    return step


def make_image_train_step_for_mesh(model, tx, cfg, mesh: Mesh,
                                   H: int, W: int, K,
                                   precull: bool = False):
    """Per-image training mode distributed over the mesh.

    The reference's per-image path (train.py:35-45 + rays.py:37) is
    single-GPU; the blender flagship configs (global_batch_false) run it,
    so it must shard for the v5e-8 speedup to apply to them.  Semantics
    match the single-device step: the image/pose broadcast to every shard,
    all shards draw the SAME global pixel set (same key), each keeps its
    N_rays/n_shards slice, and grads/metrics pmean over the data axis —
    the gradient equals the single-device gradient over that pixel set
    (render jitter is drawn per shard, decorrelated via axis_index).

    Path choice mirrors make_train_step_for_mesh: shard_map with explicit
    collectives when the fused Pallas kernels apply (GSPMD cannot slice
    pallas_call); otherwise GSPMD with a sharding constraint on the
    gathered pixel batch.
    """
    import functools

    from ..train.step import _supports_pallas_train, make_image_train_step

    shape = dict(mesh.shape)
    n_model = shape.get(MODEL_AXIS, 1)
    n_devices = n_model * shape.get(DATA_AXIS, 1)
    if n_devices == 1:
        step = make_image_train_step(model, tx, cfg, H, W, K,
                                     precull=precull)
        step.gated = bool(precull)
        return step

    # The shard_map path slices N_rays/n_devices pixels per shard, so it
    # needs exact divisibility; a mesh that doesn't divide (e.g. 6 devices
    # with the reference N_rays=4096) falls through to GSPMD below, which
    # handles uneven batch shards natively (and bit-matches single-device).
    if (_supports_pallas_train(cfg) and n_model == 1
            and cfg.N_rays % n_devices == 0):
        axis_step = make_image_train_step(model, tx, cfg, H, W, K,
                                          axis_name=DATA_AXIS, jit=False,
                                          precull=precull)
        in_specs = (P(), P(), P(), P()) + ((P(),) if precull else ())
        variants = {}
        for precrop in (False, True):
            body = functools.partial(axis_step, precrop=precrop)
            sm = jax.shard_map(body, mesh=mesh,
                               in_specs=in_specs,
                               out_specs=(P(), P()), check_vma=False)
            # no donation: mirrors make_image_train_step (params are ~2.4MB;
            # callers may hold the previous state, e.g. for eval hooks)
            variants[precrop] = jax.jit(sm)

        if precull:
            def step(state, image, pose, key, support,
                     precrop: bool = False):
                return variants[bool(precrop)](state, image, pose, key,
                                               support)
        else:
            def step(state, image, pose, key, precrop: bool = False):
                return variants[bool(precrop)](state, image, pose, key)

        step.gated = bool(precull)
        return step

    # GSPMD: slice the gathered pixel batch over the data axis; force the
    # XLA field functions (pallas_call cannot be partitioned by GSPMD)
    bc = NamedSharding(mesh, P(DATA_AXIS))
    step = make_image_train_step(model, tx, cfg, H, W, K,
                                 force_xla=_supports_pallas_train(cfg),
                                 batch_constraint=bc)
    step.gated = False
    return step


def make_sharded_render(render_fn, mesh: Mesh):
    """jit a flat-ray render fn with rays sharded over the data axis."""
    bs = NamedSharding(mesh, P(DATA_AXIS))

    def rfn(rays_o, rays_d, key):
        rays_o = jax.lax.with_sharding_constraint(rays_o, bs)
        rays_d = jax.lax.with_sharding_constraint(rays_d, bs)
        return render_fn(rays_o, rays_d, key)

    return jax.jit(rfn)
