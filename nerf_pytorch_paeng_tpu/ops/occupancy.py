"""Conservative support bounds of the coarse density field, for ray
pre-culling in the occupancy-culled frame renderer (eval/frame.py).

A ray whose [near, far] sample segment never touches the set
``{x : relu(sigma_raw(x)) > 0}`` has coarse alpha == 0 at EVERY sample —
including the last one, whose 1e10 NeRF bin distance (ops/volume.py,
reference nerf_process.py:95) would otherwise blow any positive tail
density up to full opacity.  Its coarse occupancy is therefore exactly 0
<= tau, i.e. the tau-cull of eval/frame.py would cull it anyway; testing
rays against a *bounding volume* of that support lets the renderer skip
the coarse MLP for such rays entirely (phase 0), which is where most of
the per-frame MLP time goes on mostly-empty frames.

The support is estimated by evaluating the coarse density logit on a
G^3 grid over a scene cube and dilating the occupied mask by one cell in
every direction.  Grid sampling can in principle miss sub-cell positive
pockets between grid points — the same empirical trust the tau-cull
places in the coarse model (config.py render_cull notes); both mechanisms
share the end-to-end <0.05 dB guard tests.  If the dilated support
touches the cube boundary (density reaching the edge of the sampled
region — e.g. background fog, or a scene larger than the cube), the
bounds are flagged invalid and the renderer treats every ray as a hit
(graceful fallback to the plain tau-cull).

The grid carries NO information about density outside the cube, so a
miss verdict is only trustworthy for rays whose whole [near, far] sample
segment stays inside the cube: the caller must compose the hit test with
``segment_in_cube`` (``hit | ~inside``) — eval/frame.py's phase 0 does.
An MLP with spurious density beyond the cube (common mid-training, where
the field is unsupervised away from the sampled frustum) then costs
pre-cull coverage, never correctness.

Geometry assumption: the scene cube is centered at the origin, which
holds for the blender/orbit convention (cameras orbit the origin,
reference dataset/render_pose.py); eval/frame.py enables pre-culling for
``data_type == 'blender'`` only.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _dilate(m, grid: int):
    """One-cell 6-neighborhood closure of a [G, G, G] mask."""
    def dil(m, axis):
        z = jnp.zeros_like(jnp.take(m, jnp.arange(1), axis=axis))
        lo = jnp.concatenate([jnp.take(m, jnp.arange(1, grid), axis=axis), z],
                             axis=axis)
        hi = jnp.concatenate([z, jnp.take(m, jnp.arange(grid - 1), axis=axis)],
                             axis=axis)
        return m | lo | hi

    for ax in (0, 1, 2):
        m = dil(m, ax)
    return m


def support_bounds_from_sigma(sigma_plane_fn, half_side: float,
                              grid: int = 128, domain_mask=None):
    """Bounding volume of {x : sigma_raw(x) > 0} within the origin cube
    [-half_side, half_side]^3.

    Args:
      sigma_plane_fn: ``xplane [3, P] -> sigma_raw [P]`` (density logits,
        pre-relu — eval/frame.py passes the coarse sigma kernel).
      half_side: cube half-extent.  eval/frame.py defaults to ``far``,
        large enough that blender-convention orbit rays' sample segments
        are contained (camera radius ~4, far 6 -> samples within ~5.2 of
        the origin); rays that do leave the cube are exempted from
        pre-culling via ``segment_in_cube``, so a too-small cube costs
        coverage, not correctness.
      grid: cells per axis (the MLP sees grid^3 points — 2M at 128, a few
        ms of sigma-kernel time on a v5e).
      domain_mask: optional [G, G, G] bool — restrict the measured
        support to {sigma > 0} ∩ domain.  Sound ONLY when every point
        the caller will test against the bounds provably lies in the
        domain: the training pre-cull passes the one-cell-dilated
        training-frustum union (frustum_union_mask), because every
        training sample lies on a training ray inside its own frustum —
        density the model extrapolates into never-sampled regions is
        irrelevant to training and must not invalidate the bounds.
        (The EVAL pre-cull must NOT pass a mask: novel-view rays may
        sample outside the training union, where that junk density is
        what the exact render would show.)

    Returns (trace-friendly; all on-device):
      lo [3], hi [3]: dilated AABB of the occupied cells (cell OUTER
        corners, so the box covers the cells fully);
      radius [1]: bounding-sphere radius around the AABB center, from the
        occupied cells' outer-corner distances (the sphere cuts the box's
        empty corners for blob-like content);
      valid [1] bool: False when nothing is occupied or the dilated
        support touches the cube boundary (bounds unusable — treat every
        ray as a hit).
    """
    cell = 2.0 * half_side / grid
    centers = (jnp.arange(grid, dtype=jnp.float32) + 0.5) * cell - half_side
    # feature-major [3, G^3] plane, x fastest — order is irrelevant to the
    # reductions below, but keep it deterministic for debugging
    gx, gy, gz = jnp.meshgrid(centers, centers, centers, indexing="ij")
    xplane = jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], 0)
    occ = (sigma_plane_fn(xplane).astype(jnp.float32) > 0.0)
    occ = occ.reshape(grid, grid, grid)
    if domain_mask is not None:
        occ = occ & domain_mask

    # dilate by one cell per axis (6-neighborhood closure of the mask —
    # covers sub-cell spill of a feature sampled near a cell face)
    occ = _dilate(occ, grid)

    any_occ = jnp.any(occ)
    # per-axis occupied index ranges -> AABB over cell outer corners
    idx = jnp.arange(grid, dtype=jnp.float32)
    axes_other = ((1, 2), (0, 2), (0, 1))
    lo_list, hi_list = [], []
    touches = jnp.zeros((), bool)
    for ax in (0, 1, 2):
        line = jnp.any(occ, axis=axes_other[ax])            # [G]
        i_lo = jnp.min(jnp.where(line, idx, grid))
        i_hi = jnp.max(jnp.where(line, idx, -1.0))
        lo_list.append(i_lo * cell - half_side)
        hi_list.append((i_hi + 1.0) * cell - half_side)
        touches = touches | line[0] | line[-1]
    lo = jnp.stack(lo_list)
    hi = jnp.stack(hi_list)

    # bounding sphere around the AABB center over occupied cell centers,
    # padded by the cell half-diagonal so cell corners are covered
    c = 0.5 * (lo + hi)
    pts = jnp.stack([gx, gy, gz], -1)                        # [G,G,G,3]
    d2 = jnp.sum((pts - c) ** 2, -1)
    r = jnp.sqrt(jnp.max(jnp.where(occ, d2, 0.0))) + cell * jnp.sqrt(3.0) / 2
    valid = any_occ & ~touches
    return lo, hi, r.reshape(1), valid.reshape(1)


def frustum_union_mask(poses, K, H: int, W: int, near: float, far: float,
                       half_side: float, grid: int) -> jnp.ndarray:
    """[G, G, G] bool mask of grid cells that may contain TRAINING
    samples: cell centers inside the union of the cameras' [near, far]
    viewing frusta, dilated by one cell (so any cell that intersects the
    union is included — the same one-cell granularity trust the support
    dilation uses).

    Camera model matches ops/rays.get_rays exactly: a point p lies on
    camera (c2w = [R|t])'s pixel (i, j) at depth t iff
    ``R^T (p - o) = t * [(i-cx)/fx, -(j-cy)/fy, -1]`` — so depth is
    -z_cam and the pixel coordinates are recovered by perspective
    division (R is a rigid rotation for every supported dataset, so the
    inverse is the transpose).

    Soundness (superset of the union is REQUIRED — a training sample in
    an excluded cell would let the gated step skip live density): a
    sample p in cell C satisfies ``|center_C - p| <= r`` with
    r = (sqrt(3)/2)·cell (the cell half-diagonal), so C is included iff
    its center lies within r of the *fattened* frustum — every face is
    pushed out conservatively: depth by r, and the pixel bounds both
    multiplicatively by t_p/t_q <= 1 + r/t and additively by f·r/t (the
    exact perspective bound for a lateral/depth displacement <= r; the
    axis dilation alone covers only 1·cell along axes, NOT the 0.87·cell
    diagonal worst case of a corner-grazing frustum face).  The one-cell
    dilation on top is free extra slack, not the soundness mechanism.

    Used by the TRAINING pre-cull (train/precull.py) to restrict the
    measured density support to the region training rays can sample:
    density the MLP extrapolates into never-sampled space (cube corners,
    behind cameras) would otherwise reach the estimation-cube boundary
    and invalidate the bounds on every real photometric run.

    poses [M, 3, 4] (or [M, 4, 4]) camera-to-world; K [3, 3].
    """
    poses = jnp.asarray(poses, jnp.float32)[:, :3, :4]
    K = jnp.asarray(K, jnp.float32)
    cell = 2.0 * half_side / grid
    centers = (jnp.arange(grid, dtype=jnp.float32) + 0.5) * cell - half_side
    gx, gy, gz = jnp.meshgrid(centers, centers, centers, indexing="ij")
    pts = jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)   # [P, 3]

    r = (3.0 ** 0.5 / 2.0) * cell     # cell half-diagonal (see docstring)

    def one_cam(c2w):
        p_cam = (pts - c2w[:, 3]) @ c2w[:, :3]                  # R^T (p - o)
        t = -p_cam[:, 2]
        safe_t = jnp.where(t > 1e-6, t, 1.0)
        i = K[0, 2] + K[0, 0] * (p_cam[:, 0] / safe_t)
        j = K[1, 2] - K[1, 1] * (p_cam[:, 1] / safe_t)
        # fattened pixel half-widths: centered extent scaled by 1 + r/t
        # plus the f·r/t lateral term (docstring derivation)
        scale = 1.0 + r / safe_t
        ci, cj = K[0, 2], K[1, 2]
        half_i = (jnp.maximum(ci, (W - 1) - ci) + 1.0) * scale \
            + K[0, 0] * r / safe_t
        half_j = (jnp.maximum(cj, (H - 1) - cj) + 1.0) * scale \
            + K[1, 1] * r / safe_t
        return ((t >= max(near - r, 1e-6)) & (t <= far + r)
                & (jnp.abs(i - ci) <= half_i)
                & (jnp.abs(j - cj) <= half_j))

    # scan (not vmap) over cameras: [M, G^3] intermediates for a
    # 100-view dataset at grid 128 would be GBs; the OR-accumulator is
    # one [G^3] bool
    mask, _ = jax.lax.scan(
        lambda acc, c2w: (acc | one_cam(c2w), None),
        jnp.zeros((pts.shape[0],), bool), poses)
    return _dilate(mask.reshape(grid, grid, grid), grid)


def ray_support_interval(rays_o, rays_d, lo, hi, radius, valid,
                         near: float, far: float):
    """Conservative per-ray depth interval that contains every support
    intersection: outside ``[t_lo, t_hi]`` the point ``o + t d`` provably
    lies outside the AABB [lo, hi] *or* outside the bounding sphere
    (center = AABB center), hence outside the density support — pure
    slab/quadratic vector math, no gathers (TPU-friendly).

    The interval is the intersection of the slab interval, the sphere
    chord interval, and [near, far]; a miss is encoded as an empty
    interval (``t_lo > t_hi``).  With ``valid == False`` nothing is
    certifiable and every ray gets the full [near, far].

    rays_o/rays_d [M, 3] -> (t_lo [M], t_hi [M]) float32.
    """
    inv = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-12,
                          jnp.where(rays_d < 0, -1e-12, 1e-12), rays_d)
    t1 = (lo[None] - rays_o) * inv
    t2 = (hi[None] - rays_o) * inv
    t_lo = jnp.max(jnp.minimum(t1, t2), -1)
    t_hi = jnp.min(jnp.maximum(t1, t2), -1)

    # sphere |o + t d - c|^2 <= r^2: quadratic chord interval
    c = 0.5 * (lo + hi)
    oc = rays_o - c[None]
    dd = jnp.maximum(jnp.sum(rays_d * rays_d, -1), 1e-12)
    b_half = jnp.sum(oc * rays_d, -1)
    disc = b_half * b_half - dd * (jnp.sum(oc * oc, -1) - radius[0] ** 2)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    ts_lo = (-b_half - sq) / dd
    ts_hi = jnp.where(disc >= 0.0, (-b_half + sq) / dd, ts_lo - 1.0)

    t_lo = jnp.maximum(jnp.maximum(t_lo, ts_lo), near)
    t_hi = jnp.minimum(jnp.minimum(t_hi, ts_hi), far)
    t_lo = jnp.where(valid[0], t_lo, near)
    t_hi = jnp.where(valid[0], t_hi, far)
    return t_lo, t_hi


def ray_hits_bounds(rays_o, rays_d, lo, hi, radius, valid,
                    near: float, far: float):
    """Conservative hit test of ray segments against the support bounds:
    True when ``ray_support_interval`` is non-empty, i.e. when some
    t in [near, far] may lie in BOTH the AABB and the bounding sphere
    (interval intersection — strictly stronger than testing the box and
    sphere independently).  With ``valid == False`` every ray reports a
    hit.

    rays_o/rays_d [M, 3] -> hit [M] bool.
    """
    t_lo, t_hi = ray_support_interval(rays_o, rays_d, lo, hi, radius,
                                      valid, near, far)
    return t_lo <= t_hi


def segment_in_cube(rays_o, rays_d, half_side: float,
                    near: float, far: float):
    """True when the ENTIRE segment {o + t d : t in [near, far]} lies in
    the estimation cube [-half_side, half_side]^3.  Both the segment and
    the cube are convex, so endpoint containment suffices.  Only for
    contained segments does ``support_bounds_from_sigma`` certify the
    field along the ray (module docstring); the renderer pre-culls
    ``~hit & inside`` rays only.

    rays_o/rays_d [M, 3] -> inside [M] bool.
    """
    a = rays_o + near * rays_d
    b = rays_o + far * rays_d
    return (jnp.all(jnp.abs(a) <= half_side, -1)
            & jnp.all(jnp.abs(b) <= half_side, -1))
