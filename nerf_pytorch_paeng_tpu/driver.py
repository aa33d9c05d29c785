"""Experiment driver: dataset -> state -> train loop -> test/render hooks.

Behavioral parity target: reference main.py:17-161 (main_worker) — dataset
dispatch by data_type, coarse+fine model, Adam + warmup-cosine schedule,
optional global ray batching, checkpoint resume, and the train loop with
periodic test / render / save / print hooks driven by the idx_* knobs.

TPU-first structure: one pjit-ed train step (ray batch sharded over the
mesh 'data' axis); metrics stay on device between logging points; the
full-frame eval/render paths reuse compiled frame renderers.
"""
from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import trange

from .config import NerfConfig
from .data import load_blender, load_custom, load_llff
from .eval.render import run_render
from .eval.test import run_test
from .parallel import (batch_sharding, commit_replicated,
                       make_image_train_step_for_mesh, make_mesh,
                       make_train_step_for_mesh, shard_params)
from .parallel.mesh import maybe_initialize_distributed
from .train import RayPool, build_ray_pool, create_train_state
from .train.checkpoint import (latest_checkpoint_step, restore_checkpoint,
                               restore_params_only, save_checkpoint)
from .utils.logging import MetricLogger
from .utils.visualize import visualize_extrinsics


def load_dataset(cfg: NerfConfig):
    """Dataset dispatch (reference main.py:34-58). Returns
    (images, K, extrinsics, hw, i_split, render_poses, cfg)."""
    if cfg.data_type == "blender":
        images, (K, ext), hw, i_split = load_blender(
            data_root=cfg.data_root, downsample=cfg.downsample,
            testskip=cfg.testskip, bkg_white=cfg.bkg_white)
        render_poses = None
    elif cfg.data_type == "llff":
        images, (K, ext), hw, i_split, render_poses = load_llff(
            data_root=cfg.data_root, downsample=cfg.downsample,
            testskip=cfg.testskip, colmap_relaunch=cfg.colmap_relaunch)
    elif cfg.data_type == "custom":
        images, (K, ext), hw, i_split, nf = load_custom(
            data_root=cfg.data_root, downsample=cfg.downsample,
            testskip=cfg.testskip, video_batch=cfg.video_batch,
            colmap_relaunch=cfg.colmap_relaunch)
        render_poses = None
        cfg = dataclasses.replace(cfg, near=nf[0], far=nf[1])
    else:
        raise ValueError(cfg.data_type)
    return images, K, ext, hw, i_split, render_poses, cfg


def _llff_render_poses_34(render_poses):
    if render_poses is None:
        return None
    return render_poses[:, :3, :4]


def main_worker(cfg: NerfConfig) -> None:
    from .utils.compile_cache import enable_persistent_compile_cache
    cache_dir = enable_persistent_compile_cache(cfg.compile_cache)
    if cache_dir:
        print(f">> compile cache: {cache_dir}")
    maybe_initialize_distributed()
    print(f">> devices: {jax.devices()}")
    if cfg.iter_start < 0:   # -1 = auto-resume from the latest checkpoint
        latest = latest_checkpoint_step(cfg.logdir, cfg.exp_name)
        cfg = dataclasses.replace(cfg, iter_start=latest or 0)
        print(f">> auto-resume: latest checkpoint is "
              f"{latest if latest is not None else 'absent'} "
              f"-> iter_start={cfg.iter_start}")
    mesh = make_mesh(cfg.n_data_shards, cfg.n_model_shards)
    print(f">> mesh: {dict(mesh.shape)}")

    if cfg.check_nans:
        jax.config.update("jax_debug_nans", True)

    # ---- 1. dataset ------------------------------------------------------
    print(f">> loading dataset [{cfg.data_type}] from {cfg.data_root!r}")
    images, K, extrinsics, hw, i_split, render_poses, cfg = load_dataset(cfg)
    i_train, i_val, i_test = i_split
    H, W = hw
    print(f">> dataset loaded: images {images.shape}, hw {hw}, "
          f"train/val/test {len(i_train)}/{len(i_val)}/{len(i_test)}")

    # ---- 2. model + optimizer + state -----------------------------------
    model, state, tx = create_train_state(cfg, jax.random.PRNGKey(cfg.seed))
    params = shard_params(state.params, mesh, cfg.n_model_shards)

    # ---- standalone eval/render (testing_idx, no training) ---------------
    # (before optimizer init: eval needs only a params template, and the
    # remote jit(tx.init) compile costs 20-60 s it would never use)
    if cfg.eval_only or cfg.render_only:
        params = restore_params_only(cfg.logdir, cfg.exp_name,
                                     cfg.testing_idx, params)
        if cfg.eval_only:
            run_test(cfg.testing_idx, model, params, images[i_test],
                     extrinsics[i_test], K, hw, cfg, mesh=mesh)
        if cfg.render_only:
            run_render(cfg.testing_idx, model, params, K, hw, cfg,
                       render_poses=_llff_render_poses_34(render_poses),
                       mesh=mesh)
        return

    opt_state = jax.jit(tx.init)(params)
    state = state._replace(params=params, opt_state=opt_state)
    # commit every uncommitted leaf (see parallel.commit_replicated: an
    # uncommitted first call costs a second multi-minute compile)
    state = commit_replicated(state, mesh)

    # ---- 3. resume -------------------------------------------------------
    if cfg.iter_start != 0:
        state = commit_replicated(
            restore_checkpoint(cfg.logdir, cfg.exp_name, cfg.iter_start,
                               state), mesh)
        print(f">> resumed from iter {int(state.step)}")
    else:
        print(">> training from scratch")

    # ---- 4. batching -----------------------------------------------------
    key = jax.random.PRNGKey(cfg.seed + 1)
    bs = batch_sharding(mesh)
    import functools

    # occupancy-gated training (cfg.train_precull; train/precull.py):
    # per-module support bounds, refreshed from the live params every
    # train_precull_every iters, gate the training kernels' work
    from .train.precull import (make_gate_frac_estimator,
                                make_train_support_program,
                                train_precull_active, train_precull_mode)
    precull_mode = train_precull_mode(cfg)
    precull_on = precull_mode != "off" and train_precull_active(cfg, mesh)
    if precull_mode == "on" and not precull_on:
        # only an EXPLICIT request warns; the "auto" default falls back
        # silently (most non-blender / non-reference-arch runs)
        print(">> train_precull requested but inapplicable here "
              "(needs blender data, the ray-major kernel path, a usable "
              "support grid, and a data-only mesh dividing N_rays) — "
              "running ungated")
    support = None
    if precull_on:
        # support restricted to the TRAINING-frustum union: extrapolated
        # junk density outside it never meets a training sample, and
        # would otherwise invalidate the bounds all run (precull.py)
        support_prog, _ = make_train_support_program(
            cfg, poses=np.asarray(extrinsics)[i_train, :3, :4],
            K=np.asarray(K), hw=(H, W))

        # profitability probe: a fixed representative ray batch at the
        # PER-SHARD count the gated kernels see (train_precull_active
        # guarantees divisibility), drawn once from training cameras
        from .ops.rays import get_rays
        from .parallel.mesh import DATA_AXIS
        n_est = cfg.N_rays // max(dict(mesh.shape).get(DATA_AXIS, 1), 1)
        est_fn = make_gate_frac_estimator(cfg)
        est_rng = np.random.default_rng(cfg.seed + 7)
        sel = est_rng.choice(i_train, size=min(4, len(i_train)),
                             replace=False)
        eo, ed = [], []
        for p in sel:
            ro, rd = get_rays(H, W, jnp.asarray(K, jnp.float32),
                              jnp.asarray(np.asarray(extrinsics[p])[:3, :4],
                                          jnp.float32))
            pix = est_rng.choice(H * W, size=-(-n_est // len(sel)),
                                 replace=False)
            eo.append(np.asarray(ro).reshape(-1, 3)[pix])
            ed.append(np.asarray(rd).reshape(-1, 3)[pix])
        est_o = jnp.asarray(np.concatenate(eo)[:n_est])
        est_d = jnp.asarray(np.concatenate(ed)[:n_est])
        gated_now = [None]   # None -> the first refresh always prints
        # per-refresh decision log (iter, bounds_valid, predicted
        # gate_frac, gated) — the policy trajectory evidence long runs
        # harvest (tools/run_gated_policy.py)
        policy_path = os.path.join(cfg.logdir, cfg.exp_name,
                                   "precull_policy.csv")
        os.makedirs(os.path.dirname(policy_path), exist_ok=True)
        # fresh run truncates (a re-run with the same exp_name must not
        # interleave rows from different runs — harvest would miscount);
        # a resume (iter_start != 0) appends to the existing trajectory
        if cfg.iter_start == 0 or not os.path.isfile(policy_path):
            with open(policy_path, "w") as pf:
                pf.write("iter,bounds_valid,gate_frac_pred,gated\n")

        def refresh_support(params, it: int):
            bc, bf = support_prog(params)
            # one host read per refresh: while the bounds are invalid
            # (early training, fog everywhere) or the predicted gate
            # fraction cannot repay the ~13% sort + small-tile overhead,
            # run the UNGATED program (train/precull.py estimator notes)
            gf = est_fn(tuple(bc), tuple(bf), est_o, est_d)
            vc, vf, gfh = jax.device_get((bc[3], bf[3], gf))
            valid = bool(vc[0]) and bool(vf[0])
            on = valid and float(gfh) >= cfg.train_precull_min_gate
            with open(policy_path, "a") as pf:
                pf.write(f"{it},{int(valid)},{float(gfh):.4f},{int(on)}\n")
            if on != gated_now[0]:
                gated_now[0] = on
                why = (f"predicted gate_frac {float(gfh):.3f}" if valid
                       else "bounds invalid")
                print(f">> train_precull -> "
                      f"{'GATED' if on else 'ungated'} ({why}) "
                      f"@ iter {it}")
            if not on:
                return None
            return commit_replicated((tuple(bc), tuple(bf)), mesh)

        print(f">> train_precull on (refresh every "
              f"{cfg.train_precull_every} iters)")

    if cfg.global_batch:
        print(">> [global batch] building the all-image ray pool")
        key, sub = jax.random.split(key)
        pool = commit_replicated(
            build_ray_pool(images, K, extrinsics, i_train, sub), mesh)
        ray_pool = RayPool(pool, jax.random.fold_in(key, 17))
        if cfg.iter_start != 0:
            # exact resume: the pool trajectory is deterministic in
            # (seed, step count) — replay the cursor/epoch reshuffles so
            # the resumed run serves the same batches the uninterrupted
            # run would (RayPool.fast_forward)
            ray_pool.fast_forward(int(state.step), cfg.N_rays)
            print(f">> ray pool fast-forwarded to step {int(state.step)} "
                  f"(epoch {ray_pool.epoch}, cursor {ray_pool.i_batch})")
        step_raw = make_train_step_for_mesh(
            model, tx, cfg, mesh, H, W, float(K[0][0]), precull=precull_on)
        # the builder states whether it actually built the gated (6-arg)
        # step; drift between its path choice and train_precull_active
        # must fail here, not as a mid-run trace error
        assert getattr(step_raw, "gated", False) == precull_on

        # slice the batch from the device-resident pool INSIDE the jitted
        # step: eager slicing + device_put cost ~10 tunnel dispatches
        # (~20 ms each) per step on the remote backend
        def _slice_step(state, pool, start, key, support=None):
            batch = jax.lax.dynamic_slice_in_dim(pool, start, cfg.N_rays, 0)
            o = jax.lax.with_sharding_constraint(batch[:, 0, :], bs)
            d = jax.lax.with_sharding_constraint(batch[:, 1, :], bs)
            rgb = jax.lax.with_sharding_constraint(batch[:, 2, :], bs)
            if precull_on:
                return step_raw(state, o, d, rgb, key, support)
            return step_raw(state, o, d, rgb, key)

        step_fn = jax.jit(_slice_step, donate_argnums=(0,))

        # scan_chunk steps in ONE dispatch: the per-step key is
        # fold_in(key, state.step), so the scanned chunk replays exactly
        # the single-step trajectory (support is constant across a chunk —
        # bounds refresh only lands between chunks)
        @functools.partial(jax.jit, donate_argnums=(0,))
        def chunk_fn(state, pool, starts, key, support=None):
            return jax.lax.scan(
                lambda st, s: _slice_step(st, pool, s, key, support),
                state, starts)
    else:
        print(">> per-image sampling mode (sharded over the mesh)")
        ray_pool = None
        step_raw = make_image_train_step_for_mesh(model, tx, cfg, mesh,
                                                  H, W, K,
                                                  precull=precull_on)
        assert getattr(step_raw, "gated", False) == precull_on
        images_dev = commit_replicated(jnp.asarray(images), mesh)
        poses_dev = commit_replicated(
            jnp.asarray(extrinsics)[:, :3, :4], mesh)

        # index the image/pose INSIDE the jitted step: eager slicing costs
        # two ~20 ms tunnel dispatches per step on the remote backend
        def _image_step(state, i_img, key, precrop, support=None):
            if precull_on:
                return step_raw(state, images_dev[i_img], poses_dev[i_img],
                                key, support, precrop=precrop)
            return step_raw(state, images_dev[i_img], poses_dev[i_img],
                            key, precrop=precrop)

        step_fn = jax.jit(_image_step, static_argnames=("precrop",),
                          donate_argnums=(0,))

        @functools.partial(jax.jit, static_argnames=("precrop",),
                           donate_argnums=(0,))
        def chunk_fn(state, i_imgs, key, precrop=False, support=None):
            return jax.lax.scan(
                lambda st, ii: _image_step(st, ii, key, precrop, support),
                state, i_imgs)

    # ---- 5. observability ------------------------------------------------
    from .train.schedule import schedule_from_cfg
    sched_fn = schedule_from_cfg(cfg)
    logger = MetricLogger(cfg.logdir, cfg.exp_name,
                          fresh=(cfg.iter_start == 0))
    rng = np.random.default_rng(cfg.seed + 2)
    if cfg.iter_start != 0 and not cfg.global_batch:
        # exact resume, per-image mode: replay the image-choice draws
        # (one per completed step) so the resumed image sequence matches
        # the uninterrupted run's
        for _ in range(int(state.step)):
            rng.choice(i_train)
    step_key = commit_replicated(jax.random.PRNGKey(cfg.seed + 3), mesh)

    # ---- 6. the loop (reference main.py:124-161) -------------------------
    profile_dir = os.path.join(cfg.logdir, cfg.exp_name, "profile")

    if cfg.iter_start == 0:
        # one-time extrinsics plot (reference train.py:117-119; hoisted
        # before the loop — it depends only on the dataset — so chunked
        # stepping never has to break at iter 1)
        vis_dir = os.path.join(cfg.logdir, cfg.exp_name, "_ext_vis")
        visualize_extrinsics(extrinsics, vis_dir, idx_list=i_train,
                             name="train_cameras")
        # ray-augmented `_R_t` variant (reference visualize.py:113-136);
        # idx_vis_cam_param gates it (the reference parses this knob but
        # never consumes it, config.py:103 — here 0 disables the plot)
        if cfg.idx_vis_cam_param > 0:
            visualize_extrinsics(
                extrinsics, vis_dir, idx_list=i_train,
                name="train_cameras_rays", K=np.asarray(K), hw=(H, W),
                near=float(cfg.near), far=float(cfg.far))

    K_scan = max(int(cfg.scan_chunk), 1)
    n_iters = cfg.iter_N - cfg.iter_start
    use_scan = K_scan > 1 and n_iters >= 2 * K_scan

    test_on = bool(cfg.idx_test and cfg.mode_test and len(i_test) > 0)
    render_on = bool(cfg.idx_render and cfg.mode_render)

    def _chunk_len(i: int) -> int:
        """K_scan if iters [i, i+K_scan-1] can run as ONE scanned dispatch,
        else 1.  Hooks needing exact-iter host state (save/test/render) may
        fall only on the chunk's LAST iter; the precrop flag must be
        constant across the chunk; the profiler window and a global-pool
        reshuffle single-step."""
        if not use_scan or i + K_scan - 1 > cfg.iter_N:
            return 1
        if cfg.profile and i <= cfg.iter_start + 15:
            return 1
        if not cfg.global_batch and (
                (i < cfg.precrop_iters) != (i + K_scan - 1 < cfg.precrop_iters)):
            return 1
        if cfg.global_batch and (
                ray_pool.i_batch + K_scan * cfg.N_rays > ray_pool.pool.shape[0]):
            return 1
        for e in range(i, i + K_scan - 1):
            if cfg.idx_save and e % cfg.idx_save == 0:
                return 1
            if test_on and e % cfg.idx_test == 0:
                return 1
            if render_on and e % cfg.idx_render == 0:
                return 1
        return K_scan

    def _log_step(e: int, metrics):
        # current schedule value (update e used schedule(e-1)); logged
        # so long runs evidence the traversed warmup-cosine schedule
        metrics = {**metrics, "lr": float(sched_fn(e - 1))}
        logger.log(e, metrics,
                   to_stdout=bool(cfg.idx_print and e % cfg.idx_print == 0),
                   n_rays=cfg.N_rays)

    pbar = trange(cfg.iter_start + 1, cfg.iter_N + 1)
    i = cfg.iter_start + 1
    next_refresh = i  # first train_precull bounds measure before step 1
    backoff = 1       # doubles per declined refresh (config: backoff_max)
    while i <= cfg.iter_N:
        if precull_on and i >= next_refresh:
            support = refresh_support(state.params, i)
            # backoff: consecutive declines stretch the probe interval
            # (no bounds in use while ungated -> staleness is free);
            # any engagement resets to the base cadence
            backoff = 1 if support is not None else min(
                backoff * 2, max(int(cfg.train_precull_backoff_max), 1))
            next_refresh = i + max(int(cfg.train_precull_every), 1) * backoff
        if cfg.profile and i == cfg.iter_start + 10:
            try:  # trace a few steady-state steps (SURVEY §5 observability)
                jax.profiler.start_trace(profile_dir)
            except Exception as e:
                print(f">> profiler unavailable: {e}")
        if cfg.profile and i == cfg.iter_start + 15:
            try:
                jax.profiler.stop_trace()
                print(f">> profiler trace written to {profile_dir}")
            except Exception:
                pass

        chunk = _chunk_len(i)
        if chunk > 1:
            if cfg.global_batch:
                starts = jnp.asarray(
                    [ray_pool.next_start(cfg.N_rays) for _ in range(chunk)],
                    jnp.int32)
                state, mstack = chunk_fn(state, ray_pool.pool, starts,
                                         step_key, support=support)
            else:
                i_imgs = jnp.asarray(
                    [int(rng.choice(i_train)) for _ in range(chunk)],
                    jnp.int32)
                state, mstack = chunk_fn(
                    state, i_imgs, step_key,
                    precrop=bool(i < cfg.precrop_iters), support=support)
            # idx_vis/idx_print 0 = off, like the idx_save/test/render knobs
            log_js = [j for j in range(chunk)
                      if (cfg.idx_vis and (i + j) % cfg.idx_vis == 0)
                      or (cfg.idx_print and (i + j) % cfg.idx_print == 0)]
            if log_js:
                mhost = jax.device_get(mstack)   # ONE host transfer
                for j in log_js:
                    _log_step(i + j, {k: v[j] for k, v in mhost.items()})
        else:
            if cfg.global_batch:
                start = ray_pool.next_start(cfg.N_rays)
                state, metrics = step_fn(state, ray_pool.pool, start,
                                         step_key, support=support)
            else:
                i_img = int(rng.choice(i_train))
                state, metrics = step_fn(
                    state, i_img, step_key,
                    precrop=bool(i < cfg.precrop_iters), support=support)
            if (cfg.idx_vis and i % cfg.idx_vis == 0) or (
                    cfg.idx_print and i % cfg.idx_print == 0):
                _log_step(i, metrics)

        last = i + chunk - 1      # hooks fire on the chunk's final iter
        if cfg.idx_save and last % cfg.idx_save == 0:
            path = save_checkpoint(cfg.logdir, cfg.exp_name, state)
            print(f">> checkpoint saved: {path}")

        if test_on and last % cfg.idx_test == 0:
            run_test(last, model, state.params, images[i_test],
                     extrinsics[i_test], K, hw, cfg, mesh=mesh)

        if render_on and last % cfg.idx_render == 0:
            run_render(last, model, state.params, K, hw, cfg,
                       render_poses=_llff_render_poses_34(render_poses),
                       mesh=mesh)

        pbar.update(chunk)
        i += chunk
    pbar.close()

    logger.close()
    print(">> training done")
