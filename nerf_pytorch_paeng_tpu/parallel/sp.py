"""Sample-axis sharding: the sequence-parallel (SP/CP) analog for NeRF.

The model has no attention; its "sequence" is the per-ray sample axis
(SURVEY §5 long-context).  The transmittance is an exclusive cumprod along
that axis (reference nerf_process.py:109-110) — in log space it is a
prefix *sum*, which splits across chips exactly like a context-parallel
attention pass splits its sequence:

  - every shard holds a contiguous S/n_shards slice of every ray's samples
    (z_vals sharded ``P(None, 'model')``), evaluates the field MLP only on
    its slice — the FLOPs genuinely divide by n_shards;
  - the bin widths need one neighbor value (the next shard's first z):
    one ``ppermute`` over the mesh axis;
  - transmittance: per-shard inclusive log-cumsum + an exclusive prefix of
    per-shard totals via ``all_gather`` (the cross-chip step of the
    associative scan — ops/volume.exclusive_cumprod's 'associative' impl
    is the single-chip form of the same reformulation);
  - rgb/acc/depth are weight-sums: partial per shard, ``psum`` to finish.

At the reference's S=64..192 this is a capability demonstration (ray-axis
DP is the load-bearing parallelism; see sharding.py) — it becomes real
headroom for very deep sampling (S in the thousands) where one chip's HBM
or latency budget can't hold a ray's whole sample axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.volume import RenderOutputs, _disp_from
from .mesh import MODEL_AXIS


def composite_sample_sharded(raw, z_vals, rays_d, axis_name: str
                             ) -> RenderOutputs:
    """Volume-render with the sample axis sharded over ``axis_name``.

    Call inside shard_map.  Math parity: ops/volume.volume_render_planar
    (reference nerf_process.py:89-140), restructured as a distributed
    log-space prefix sum.

    Args:
      raw:    [4, N, S_local] this shard's field outputs (rgb logits 0..2,
              sigma logit row 3).
      z_vals: [N, S_local] this shard's contiguous depth slice (globally
              sorted across shards).
      rays_d: [N, 3], replicated.
    Returns RenderOutputs with rgb/disp/acc/depth identical on every shard
    and ``weights`` holding the local [N, S_local] slice.
    """
    idx = jax.lax.axis_index(axis_name)
    n_sh = jax.lax.axis_size(axis_name)
    raw = raw.astype(jnp.float32)

    # -- bin widths: last local bin needs the next shard's first z ---------
    if n_sh > 1:
        perm = [(i, i - 1) for i in range(1, n_sh)]
        z_next = jax.lax.ppermute(z_vals[..., :1], axis_name, perm)
    else:
        z_next = jnp.zeros_like(z_vals[..., :1])
    dists_in = z_vals[..., 1:] - z_vals[..., :-1]
    last = jnp.where(idx == n_sh - 1, jnp.full_like(z_next, 1e10),
                     z_next - z_vals[..., -1:])
    dists = jnp.concatenate([dists_in, last], -1)          # [N, S_local]
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[0:3])                          # [3, N, S_local]
    alpha = 1.0 - jnp.exp(-jax.nn.relu(raw[3]) * dists)     # [N, S_local]

    # -- distributed exclusive cumprod in log space -------------------------
    # clamp before the log: XLA may reassociate (1.0 - alpha) + 1e-10 into
    # (1.0 + 1e-10) - alpha == 0.0 at alpha == 1, and log(0) = -inf turns
    # the masked prefix into 0 * -inf = NaN
    logt = jnp.log(jnp.maximum(1.0 - alpha + 1e-10, 1e-10))
    local_inc = jnp.cumsum(logt, -1)                        # inclusive
    shard_sums = jax.lax.all_gather(local_inc[..., -1:], axis_name)
    mask = (jnp.arange(n_sh) < idx).astype(jnp.float32)
    prefix = jnp.tensordot(mask, shard_sums, axes=(0, 0))   # [N, 1]
    transmittance = jnp.exp(prefix + local_inc - logt)      # exclusive
    weights = alpha * transmittance                         # [N, S_local]

    # -- partial reductions + psum ------------------------------------------
    rgb_map = jax.lax.psum(jnp.sum(weights[None] * rgb, -1), axis_name).T
    depth_map = jax.lax.psum(jnp.sum(weights * z_vals, -1), axis_name)
    acc_map = jax.lax.psum(jnp.sum(weights, -1), axis_name)

    disp_map = _disp_from(depth_map, acc_map)
    rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return RenderOutputs(rgb_map, disp_map, acc_map, weights, depth_map)


def make_sample_sharded_render(field_fn, mesh: Mesh,
                               axis_name: str = MODEL_AXIS):
    """Full coarse render with the SAMPLE axis sharded over ``axis_name``.

    Each shard evaluates ``field_fn`` on its S/n_shards slice of every
    ray's points and the composite stitches across shards (see
    composite_sample_sharded).  Returns
    ``render(rays_o [N,3], rays_d [N,3], z_vals [N,S]) -> (rgb, disp, acc)``
    — equal to the unsharded volume render (tests/test_sample_sharding.py).
    """
    def body(rays_o, rays_d, z_vals):
        n, s_local = z_vals.shape
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        xp = (rays_o.T[:, :, None]
              + rays_d.T[:, :, None] * z_vals[None]).reshape(3, -1)
        dp = jnp.broadcast_to(viewdirs.T[:, :, None],
                              (3, n, s_local)).reshape(3, -1)
        raw = field_fn(xp, dp).reshape(4, n, s_local)
        out = composite_sample_sharded(raw, z_vals, rays_d, axis_name)
        return out.rgb, out.disp, out.acc

    sm = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(None, axis_name)),
        out_specs=(P(), P(), P()),
        check_vma=False)
    return jax.jit(sm)


def sp_coarse_fine(coarse_fn, fine_fn, rays_o, rays_d, z_local, key, *,
                   n_fine: int, perturb: float,
                   axis_name: str = MODEL_AXIS):
    """The shared SP coarse(+fine) body — call inside shard_map with the
    sample axis of ``z_local`` sharded over ``axis_name``.  Used by both
    make_sample_sharded_render_full below and the production frame
    renderer (eval/frame._make_sp_frame_renderer), so fixes land once.

    Returns ``(out_c, out_f)`` RenderOutputs (out_f is None when
    ``n_fine <= 0``); rgb/disp/acc are full-ray values replicated across
    the sample shards.
    """
    from ..ops.render import hierarchical_z_vals

    idx = jax.lax.axis_index(axis_name)
    n_sh = jax.lax.axis_size(axis_name)
    n, _ = z_local.shape
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    def field_planes(fn, z):
        s = z.shape[-1]
        xp = (rays_o.T[:, :, None]
              + rays_d.T[:, :, None] * z[None]).reshape(3, -1)
        dp = jnp.broadcast_to(viewdirs.T[:, :, None],
                              (3, n, s)).reshape(3, -1)
        return fn(xp, dp).reshape(4, n, s)

    # -- coarse pass on the local sample slice ------------------------------
    out_c = composite_sample_sharded(
        field_planes(coarse_fn, z_local), z_local, rays_d, axis_name)
    if n_fine <= 0:
        return out_c, None

    # -- global hierarchical resample (replicated: every shard computes
    # the same z_all from the gathered weights and the shared key) ----------
    w_full = jax.lax.all_gather(out_c.weights, axis_name,
                                axis=-1, tiled=True)           # [N, S_c]
    z_full = jax.lax.all_gather(z_local, axis_name,
                                axis=-1, tiled=True)           # [N, S_c]
    z_all = hierarchical_z_vals(z_full, w_full, key,
                                n_fine=n_fine, perturb=perturb)
    s_merged = z_all.shape[-1]
    # loud trace-time guard: a non-divisible merged axis would silently
    # drop the deepest s_merged % n_sh samples of every ray
    assert s_merged % n_sh == 0, (
        f"sample-sharded fine pass needs (S_c + n_fine) divisible by the "
        f"shard count: {s_merged} % {n_sh} != 0")
    s_f_local = s_merged // n_sh
    z_f_local = jax.lax.dynamic_slice_in_dim(
        z_all, idx * s_f_local, s_f_local, axis=-1)

    # -- fine pass on the local merged slice --------------------------------
    out_f = composite_sample_sharded(
        field_planes(fine_fn, z_f_local), z_f_local, rays_d, axis_name)
    return out_c, out_f


def make_sample_sharded_render_full(coarse_fn, fine_fn, mesh: Mesh, *,
                                    n_fine: int, perturb: float = 1.0,
                                    axis_name: str = MODEL_AXIS):
    """Coarse **and fine** render with the sample axis sharded.

    The full SP pipeline (VERDICT r2 item 7 asked for the fine pass):
      1. coarse: each shard runs ``coarse_fn`` on its S_c/n slice and the
         distributed composite yields the full per-ray coarse ``acc``;
         the per-shard weight slices are ``all_gather``ed back to [N, S_c]
         (tiny — S_c floats per ray) because hierarchical resampling is a
         *global* inverse CDF over the whole sample axis;
      2. the inverse-CDF resample + merge-sort run replicated (identical
         on every shard: same inputs, same key — cheap VPU work);
      3. fine: each shard slices its contiguous (S_c + n_fine)/n columns
         of the merged depths, evaluates ``fine_fn`` on them, and the
         distributed composite stitches the final image.
    The FLOP-heavy MLP work divides by n shards in both passes; only
    steps 2's [N, S_c] gather and the composite collectives cross chips.

    Returns ``render(rays_o [N,3], rays_d [N,3], z_vals [N,S_c], key) ->
    (rgb_c, rgb_f, disp_f, acc_f)``, equal to the unsharded coarse+fine
    render at the same key (tests/test_sample_sharding.py).
    """
    def body(rays_o, rays_d, z_local, key):
        out_c, out_f = sp_coarse_fine(
            coarse_fn, fine_fn, rays_o, rays_d, z_local, key,
            n_fine=n_fine, perturb=perturb, axis_name=axis_name)
        return out_c.rgb, out_f.rgb, out_f.disp, out_f.acc

    sm = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(None, axis_name), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False)
    return jax.jit(sm)
