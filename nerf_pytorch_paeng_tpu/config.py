"""Config system: dataclass + loader compatible with the reference CLI.

The reference (config.py:18-111) uses configargparse with ``--config`` text
files of ``key = value`` lines plus bare boolean action flags
(``bkg_white_true``, ``global_batch_false``, ``mode_test_false``,
``mode_render_false``, ``colmap_relaunch_true``).  This module parses the
very same files without the configargparse dependency, exposes every option
under the same name, and adds TPU-specific knobs (mesh shape, precision,
pallas toggle) that default to sensible values.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import re
from dataclasses import dataclass, field
from typing import List, Optional

LOG_DIR = os.path.join(
    os.path.abspath(os.path.dirname(os.path.realpath(__file__))), os.pardir, "logs"
)
LOG_DIR = os.path.normpath(LOG_DIR)

# Bare flag -> (dest, value); mirrors the reference's store_true/store_false
# action args (reference config.py:39-44,69,80,85).
_FLAG_ACTIONS = {
    "bkg_white_true": ("bkg_white", True),
    "colmap_relaunch_true": ("colmap_relaunch", True),
    "global_batch_false": ("global_batch", False),
    "mode_test_false": ("mode_test", False),
    "mode_render_false": ("mode_render", False),
}


@dataclass
class NerfConfig:
    # == Visualization (reference uses visdom; we log to CSV/TensorBoard) ==
    visdom: bool = False          # kept for config-file compat; ignored
    visdom_port: int = 8900       # kept for config-file compat; ignored

    # == Devices (reference config.py:28 `gpu_ids`; on TPU this is unused —
    # the device mesh is controlled by n_data_shards/n_model_shards) ==
    gpu_ids: List[int] = field(default_factory=lambda: [0])

    # ====== Dataset (reference config.py:31-36)
    data_type: str = "blender"    # [blender, llff, custom]
    data_name: str = ""
    data_root: str = ""
    downsample: int = 0           # 0 disables downsampling
    near: float = 2.0
    far: float = 6.0

    # ====== For blender (reference config.py:39-40)
    bkg_white: bool = False

    # ====== For colmap (reference config.py:43-44)
    colmap_relaunch: bool = False

    # ====== For precrop (reference config.py:47-48)
    precrop_iters: int = 0
    precrop_frac: float = 0.5

    # ====== For custom (reference config.py:51)
    video_batch: int = 30

    # ====== Model (reference config.py:54-57)
    L_x: int = 10
    L_d: int = 4
    netDepth: int = 8
    netWidth: int = 256

    # ====== Training (reference config.py:60-65)
    exp_name: str = "exp"
    lr: float = 5e-4
    lr_min: float = 5e-5
    iter_warmup: int = 10000
    iter_N: int = 200000
    # 0 = from scratch; >0 = resume from that checkpoint (reference
    # main.py:110-117); -1 = auto-resume from the LATEST checkpoint under
    # logs/<exp>/ (from scratch when none exists) — an ergonomics
    # improvement over the reference's manual bookkeeping
    iter_start: int = 0

    # ====== Batch (reference config.py:68-76)
    global_batch: bool = True
    N_rays: int = 4096
    N_samples_c: int = 64
    N_samples_f: int = 128
    # reference host-chunk knob (nerf_process.py:236; reference default
    # 4096).  0 (our default) = auto: the production frame renderer
    # (eval/frame.py) picks large ray blocks for dispatch economics and
    # ops/render.render_frame falls back to 4096.  A user-set value > 0 is
    # honored everywhere as the ray-block size (reference semantics —
    # small values cost dispatches on the remote TPU backend).
    chunk_rays: int = 0
    # in-program MLP point-chunk (compiled lax.map; reference default is
    # 524288 but >=512k-row bf16 backward matmuls trip a TPU backend
    # regalloc bug, so we default one notch lower)
    chunk_pts: int = 262144
    perturb: float = 1.0

    # ====== Testing (reference config.py:79-81)
    mode_test: bool = True
    testskip: int = 8

    # ====== Rendering (reference config.py:84-92)
    mode_render: bool = True
    render_type: str = "gif"      # mp4 | gif
    n_angle: int = 120
    single_angle: float = -1.0
    phi: float = -30.0
    nf: float = 4.0

    # ====== only testing & rendering (reference config.py:95)
    testing_idx: int = 0

    # ====== Periodic indices (reference config.py:98-103)
    idx_vis: int = 100
    idx_print: int = 1000
    idx_save: int = 100000
    idx_test: int = 200000
    idx_render: int = 200000
    # gates the ray-augmented extrinsics plot at iter 1 (0 disables); the
    # reference parses this knob but never consumes it (config.py:103)
    idx_vis_cam_param: int = 1000

    # ====== TPU-native additions (no reference equivalent) ======
    seed: int = 0
    eval_only: bool = False       # load ckpt at testing_idx, run test, exit
    render_only: bool = False     # load ckpt at testing_idx, render, exit
    # matmul compute dtype for the MLP: "bfloat16" rides the MXU at full
    # rate; "float32" for bit-exactness studies.
    compute_dtype: str = "bfloat16"
    # device mesh: rays shard across `data`, MLP width across `model`.
    n_data_shards: int = 0        # 0 = all visible devices
    n_model_shards: int = 1
    # fused Pallas kernels for the reference architecture (8x256): the
    # custom-VJP pair for training (2.8x faster than XLA autodiff) and the
    # eval kernel for rendering; auto-falls back to XLA for other shapes
    # and runs interpreted off-TPU
    use_pallas: bool = True
    # ray-major custom-VJP training kernels (positions built in-kernel;
    # ops/render.render_rays_train) — falls back to the plane-based train
    # kernels when off or for unsupported shapes
    use_rays_train: bool = True
    # occupancy-culled full-frame rendering (eval/frame.py): rays whose
    # COARSE occupancy (sum of compositing weights) is <= render_cull_tau
    # composite straight to the white background and skip the fine MLP.
    # The tau bound is on the coarse composite; the culled ray's exact
    # fine render is bounded only insofar as the trained coarse and fine
    # fields agree on empty space (they are trained on the same data; the
    # guard test certifies < 0.05 dB vs the exact render on a trained
    # scene).  Use "none" for exact dense rendering, e.g. for untrained
    # or deliberately mismatched coarse/fine networks.
    render_cull: str = "auto"
    render_cull_tau: float = 1e-3
    # per-ray sample-WINDOW truncation inside the culled renderer
    # (eval/frame.py): leading merged samples carrying < eps cumulative
    # coarse mass and samples past the coarse transmittance collapse
    # (remaining T <= render_trunc_eps) each contribute O(eps) to the
    # composite, so surviving rays are ordered by how many merged samples
    # their window needs and fine blocks run at quantized truncated
    # sample counts (ops/render.truncation_window).  Same coarse-estimate
    # trust model as render_cull_tau (guard-tested together, < 0.05 dB vs
    # exact).  0 = off (full 192-sample fine blocks for every surviving
    # ray).
    render_trunc_eps: float = 1e-3
    # phase-0 ray pre-culling inside the culled renderer (eval/frame.py):
    # a conservative bounding volume of the COARSE field's sigma>0 support
    # (estimated once per params on a render_precull_grid^3 grid,
    # ops/occupancy.py) lets rays that provably sample only zero density
    # skip the coarse MLP entirely.  A miss ray's coarse occupancy is
    # exactly 0 (zero alpha at every sample, including the 1e10-distance
    # last one), so this culls a subset of what render_cull_tau would cull
    # — same trust model in the coarse field, shared <0.05 dB guard tests.
    # Applied only for data_type == 'blender' (origin-centered orbit
    # scenes; the support cube is [-h, h]^3 with h = render_precull_halfside
    # or far when 0).  Rays whose [near, far] sample segment leaves the
    # cube are never pre-culled (the grid carries no density information
    # outside it), and if the support reaches the cube boundary the
    # bounds are unusable and the renderer falls back to the plain
    # tau-cull — either way a bad cube costs coverage, not correctness.
    # grid 0 = auto: 128 on a real TPU, disabled off-TPU (the grid MLP is
    # prohibitive in Pallas interpret mode; CPU tests opt in with a small
    # explicit grid).
    # Two implementations, selected by the frame renderer:
    #  - rays-kernel path (the production 8x256 architecture): the
    #    pre-cull is folded INTO the coarse program at (ray-tile,
    #    8-sample-row) granularity — each ray gets a conservative
    #    support interval, rays are sorted by which depth rows it
    #    touches, and the sigma kernel skips gated-off (tile, row) grid
    #    steps in-kernel (scalar-prefetched gates,
    #    kernels/fused_mlp._sigma_rays_kernel_gated); support-hitting
    #    rays skip their empty depth rows too, not only whole misses.
    #    Zero extra dispatches or host syncs; v5e A/B of the row-granular
    #    form (tools/bench_precull.py, 2026-08-19): std 660->592 ms
    #    (44% of coarse row-steps gated), hi 819->736 ms (49%), hard
    #    651->509 ms (65%); agreement with the tau-cull path 53-68 dB —
    #    the residual is the documented sub-cell grid-sampling trust
    #    (ops/occupancy.py), orders of magnitude inside the 0.05 dB
    #    guard.  (The earlier whole-ray form gated only provable-miss
    #    rays: std was noise-level, hard 660->578 ms.)
    #  - XLA-fallback path: block-structured phase 0 (separate support
    #    program + compaction) — measured a net +61..+171 ms/frame LOSS
    #    on the remote backend (~4 extra dispatches + 1 extra host sync
    #    against <=110 ms of savings), so it stays opt-in.
    # "auto" (default) = pre-cull only where it is dispatch-free (the
    # rays-kernel path); on/true = always (incl. the block-structured
    # fallback); off/false = never.  bools accepted for compat.
    render_precull: str = "auto"
    render_precull_grid: int = 0
    render_precull_halfside: float = 0.0
    # FINE-phase row gating inside the culled renderer (eval/frame.py
    # _gated_fine_rays): the FINE module's own support bounds (the coarse
    # and fine MLPs are independent networks, so each needs its own grid
    # estimate) gate the phase-2 fine kernel at (ray-tile, 8-sample-row)
    # granularity — row activity computed from the actual hierarchical
    # (truncated) sample depths against each ray's conservative support
    # interval, span-sorted like the coarse pre-cull.  Cuts the fine rows
    # the quantized truncation classes cannot (e.g. empty depth rows
    # before a hard front inside a 0.75*S window).  Same trust model and
    # safety rails as render_precull (gated-off samples provably carry
    # <= 0 density logits -> identical zero compositing weights; rays
    # leaving the estimation cube are exempt; invalid bounds fall back to
    # the ungated phase-2 programs).  blender + rays-kernel path only;
    # "auto" (default) = on where those preconditions hold.
    render_gate_fine: str = "auto"
    # occupancy-gated TRAINING (train/precull.py + the gated custom-VJP
    # kernel pair): conservative support bounds of EACH module's density
    # field (the coarse and fine MLPs are independent networks, so each
    # pass is gated by its own bounds), refreshed from the live params
    # every train_precull_every steps, let the training kernels skip
    # (ray-tile, 8-sample-row) blocks whose samples provably carry <= 0
    # density logits.  Gradient-exact at refresh: a gated sample's
    # contribution is identically zero in the ungated step too (relu'
    # zeroes its density cotangent, its zero compositing weight zeroes
    # the color cotangents), so the loss is bit-equal and grads match up
    # to fp32 accumulation order.  Between refreshes the bounds can go
    # stale ONLY by support growth from non-local weight updates (local
    # gradients cannot push a <= 0 logit up through the relu) — the
    # refresh re-measures the live field, same grid trust as
    # render_precull.  Tri-state: "auto" (default) = policy-guarded ON
    # wherever applicable (blender + ray-major kernel path + usable
    # grid + data-only mesh), silently ungated elsewhere; "on"/True =
    # same, but warns when inapplicable; "off"/False = never.  The
    # policy itself (bounds validity + kernel-free gate_frac estimator
    # + refresh backoff) keeps declining content at ungated speed —
    # certified at 50k-iter scale on soft AND hard scenes
    # (docs/artifacts/GATED_POLICY_r05.json).
    train_precull: str = "auto"
    train_precull_every: int = 256
    # gated-kernel ray-tile size (0 = auto): smaller than the ungated
    # pair's 2048 so the span-sorted miss rays fill whole gateable tiles
    # even at N_rays=4096 (measured sweep in docs/STATUS_ROUND3.md)
    train_precull_tile: int = 0
    # profitability floor for the gated step: at every bounds refresh the
    # driver predicts the skipped-grid-step fraction on a representative
    # ray batch (train/precull.make_gate_frac_estimator — interval + gate
    # plan math only, no MLP) and runs the UNGATED program below this
    # value.  Gating pays ~13% span-sort + small-tile overhead, so
    # wide-support scenes lose outright without the fallback (20k-iter
    # photometric A/B: 132.5k -> 116.7k rays/s, GATED_TRAIN_AB_r03.json).
    # 0 disables the check (always gate while bounds are valid).
    train_precull_min_gate: float = 0.15
    # refresh backoff while the policy keeps DECLINING: each consecutive
    # ungated decision doubles the next refresh interval up to
    # every * backoff_max, and any GATED decision resets it.  While
    # ungated no bounds are in use, so the longer staleness window is
    # free of correctness cost — it only delays (re-)engagement by at
    # most the backed-off interval.  Cuts the declining-content probe
    # overhead (the 1.5% of GATED_POLICY_r04's soft scene) ~8x.  1 = no
    # backoff.
    train_precull_backoff_max: int = 8
    # sample-axis (SP/context-parallel analog) sharding for full-frame
    # rendering: split each ray's sample axis over the mesh 'model' axis
    # with the distributed log-space transmittance scan (parallel/sp.py).
    # 0/1 = off.  Requires n_model_shards == sp_shards and sample counts
    # divisible by it; the frame renderer routes its composite through
    # composite_sample_sharded when set.  A capability at the reference's
    # 64+128 samples; real headroom at thousands of samples per ray.
    sp_shards: int = 0
    log_dir: str = ""             # defaults to <repo>/logs
    # persistent XLA compilation cache (utils/compile_cache.py): "auto"
    # (default) = ~/.cache/nerf_pytorch_paeng_tpu/xla or
    # $NERF_TPU_COMPILE_CACHE; "off" = disabled; anything else = an
    # explicit directory.  Correctness-neutral; on the remote backend it
    # cuts a cold 800x800 frame-renderer start from ~277 s to ~11 s.
    compile_cache: str = "auto"
    # fuse this many consecutive train steps into ONE device program
    # (lax.scan) wherever no exact-iter hook (save/test/render, profiler
    # window, precrop flip, pool reshuffle) falls inside the chunk.  On
    # the remote TPU every dispatch carries ~3 ms of tunnel overhead
    # (~10% of a 4096-ray step); chunking amortizes it to <1%.  The
    # trajectory is unchanged: the step key is fold_in(key, state.step),
    # so a scanned chunk replays exactly the single-step sequence
    # (tests/test_cli.py pins scan-vs-single parity).  <= 1 disables.
    scan_chunk: int = 16
    profile: bool = False         # emit a jax.profiler trace of a few steps
    check_nans: bool = False      # enable jax_debug_nans (debugging)
    lpips_weights: str = ""       # optional VGG16 weights .npz for LPIPS

    # world_size mirrors reference config.py:106 (computed, informational)
    @property
    def world_size(self) -> int:
        return max(1, self.n_data_shards) * max(1, self.n_model_shards)

    @property
    def logdir(self) -> str:
        return self.log_dir or LOG_DIR

    def validate(self) -> "NerfConfig":
        assert self.data_type in ("blender", "llff", "custom"), self.data_type
        assert self.render_type in ("gif", "mp4"), self.render_type
        assert self.compute_dtype in ("bfloat16", "float32"), self.compute_dtype
        assert self.render_cull in ("auto", "none"), self.render_cull
        assert str(self.render_precull).lower() in (
            "auto", "on", "off", "true", "false", "t", "f", "yes", "no",
            "y", "n", "0", "1"), self.render_precull
        assert str(self.render_gate_fine).lower() in (
            "auto", "on", "off", "true", "false", "t", "f", "yes", "no",
            "y", "n", "0", "1"), self.render_gate_fine
        assert str(self.train_precull).lower() in (
            "auto", "on", "off", "true", "false", "t", "f", "yes", "no",
            "y", "n", "0", "1"), self.train_precull
        assert self.N_samples_c > 0
        assert self.iter_warmup < self.iter_N + 1
        assert (self.train_precull_tile >= 0
                and self.train_precull_tile % 128 == 0), \
            self.train_precull_tile
        return self


_FIELDS = {f.name: f for f in dataclasses.fields(NerfConfig)}


def _coerce(name: str, raw: str):
    """Coerce a raw config-file string to the dataclass field's type."""
    f = _FIELDS[name]
    raw = raw.strip()
    if f.type in ("int", int):
        return int(float(raw))
    if f.type in ("float", float):
        return float(raw)
    if f.type in ("bool", bool):
        return raw.lower() in ("yes", "true", "t", "y", "1")
    if name == "gpu_ids":
        return [int(x) for x in re.findall(r"-?\d+", raw)]
    return raw  # str


def parse_config_file(path: str) -> dict:
    """Parse a reference-style ``key = value`` config text file.

    Accepts inline ``#`` comments, bare action flags, and bracketed lists —
    the exact dialect of /root/reference/configs/*/*.txt.
    """
    out = {}
    with open(path) as fp:
        for line in fp:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            if "=" in line:
                key, val = line.split("=", 1)
                key = key.strip()
                if key in _FLAG_ACTIONS:  # e.g. `bkg_white_true = true`
                    dest, value = _FLAG_ACTIONS[key]
                    out[dest] = value if _coerce_bool(val) else not value
                elif key in _FIELDS:
                    out[key] = _coerce(key, val)
                else:
                    raise KeyError(f"unknown config key {key!r} in {path}")
            else:
                key = line.strip()
                if key in _FLAG_ACTIONS:
                    dest, value = _FLAG_ACTIONS[key]
                    out[dest] = value
                else:
                    raise KeyError(f"unknown bare flag {key!r} in {path}")
    return out


def _coerce_bool(raw: str) -> bool:
    return raw.strip().lower() in ("yes", "true", "t", "y", "1")


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native NeRF (nerf_pytorch_paeng_tpu)", add_help=True
    )
    p.add_argument("--config", type=str, default=None, help="config file path")
    for f in dataclasses.fields(NerfConfig):
        if f.type in ("bool", bool):
            p.add_argument(f"--{f.name}", type=str, default=None,
                           help=f"bool (default {f.default})")
        elif f.name == "gpu_ids":
            p.add_argument("--gpu_ids", nargs="+", default=None)
        else:
            typ = int if f.type in ("int", int) else (
                float if f.type in ("float", float) else str)
            p.add_argument(f"--{f.name}", type=typ, default=None)
    # reference-style action flags usable on the CLI too
    for flag, (dest, value) in _FLAG_ACTIONS.items():
        p.add_argument(f"--{flag}", dest=f"__flag_{flag}", action="store_true")
    return p


def load_config(argv: Optional[List[str]] = None) -> NerfConfig:
    """CLI entry: precedence CLI > config file > dataclass defaults.

    Mirrors reference config.py:18-111 (configargparse semantics).
    """
    parser = build_arg_parser()
    ns = parser.parse_args(argv)
    values: dict = {}
    if ns.config:
        values.update(parse_config_file(ns.config))
    for f in dataclasses.fields(NerfConfig):
        raw = getattr(ns, f.name, None)
        if raw is None:
            continue
        if f.type in ("bool", bool):
            values[f.name] = _coerce_bool(raw)
        elif f.name == "gpu_ids":
            values[f.name] = [int(x) for x in raw]
        else:
            values[f.name] = raw
    for flag, (dest, value) in _FLAG_ACTIONS.items():
        if getattr(ns, f"__flag_{flag}", False):
            values[dest] = value
    return NerfConfig(**values).validate()


def config_from_file(path: str, **overrides) -> NerfConfig:
    values = parse_config_file(path)
    values.update(overrides)
    return NerfConfig(**values).validate()
