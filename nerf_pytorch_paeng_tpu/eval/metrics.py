"""Image quality metrics in JAX: SSIM and LPIPS(VGG16).

Capability parity target: reference utils.py:22-34, which wraps
IQA_pytorch's SSIM and LPIPSvgg.  Both are re-implemented natively:

- SSIM: the standard Wang et al. formulation — 11x11 Gaussian window
  (sigma 1.5), C1=(0.01)^2, C2=(0.03)^2 on [0,1] images, valid padding,
  averaged over channels — matching IQA_pytorch's configuration.
- LPIPS: VGG16 features (conv1_2/2_2/3_3/4_3/5_3), channel-unit-normalised,
  squared difference, learned linear weights, spatial mean, summed.  The
  pretrained weights cannot be baked into the repo; they load from an .npz
  (``cfg.lpips_weights``, see tools/export_lpips_weights.py).  Without the
  file LPIPS is reported as nan — the metric is gated, not faked.
"""
from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# ------------------------------------------------------------------ SSIM --


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)                                   # [size, size]


@functools.partial(jax.jit, static_argnames=("size",))
def compute_ssim(pred: jnp.ndarray, gt: jnp.ndarray, size: int = 11,
                 sigma: float = 1.5, c1: float = 0.01 ** 2,
                 c2: float = 0.03 ** 2) -> jnp.ndarray:
    """SSIM between two [H, W, C] images in [0, 1]. Returns a scalar."""
    w = _gaussian_window(size, sigma)[..., None, None]        # [k,k,1,1]
    kernel = jnp.tile(w, (1, 1, 1, pred.shape[-1]))           # depthwise

    def filt(img):
        # depthwise conv, valid padding: [H,W,C] -> [H',W',C]
        img = img[None].astype(jnp.float32)                   # NHWC
        out = jax.lax.conv_general_dilated(
            img, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=pred.shape[-1])
        return out[0]

    mu_p, mu_g = filt(pred), filt(gt)
    mu_pp, mu_gg, mu_pg = mu_p * mu_p, mu_g * mu_g, mu_p * mu_g
    # clamp variances at 0: E[x^2]-E[x]^2 can go slightly negative by fp32
    # cancellation on near-constant windows, which blows the ratio up
    # (observed SSIM=24.9 on a white-background view)
    sigma_p = jnp.maximum(filt(pred * pred) - mu_pp, 0.0)
    sigma_g = jnp.maximum(filt(gt * gt) - mu_gg, 0.0)
    sigma_pg = filt(pred * gt) - mu_pg
    # |cov| <= sqrt(var_p * var_g) in exact math; enforce after clamping
    bound = jnp.sqrt(sigma_p * sigma_g)
    sigma_pg = jnp.clip(sigma_pg, -bound, bound)

    # IQA_pytorch convention (the reference's published-SSIM path,
    # utils.py:22-26): luminance term times a relu'd contrast-structure
    # term — cs is forced non-negative, which matters on anticorrelated
    # windows (golden-tested vs a torch-functional IQA oracle in
    # tests/test_eval.py).
    lum = (2 * mu_pg + c1) / (mu_pp + mu_gg + c1)
    cs = jnp.maximum((2 * sigma_pg + c2) / (sigma_p + sigma_g + c2), 0.0)
    return jnp.mean(lum * cs)


# ----------------------------------------------------------------- LPIPS --

# VGG16 conv layout: (out_channels, n_convs) per block
_VGG_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


_LPIPS_KEYS = ({f"conv{i}_w" for i in range(13)}
               | {f"conv{i}_b" for i in range(13)}
               | {f"lin{i}_w" for i in range(5)})


def load_lpips_params(path: str) -> Optional[Dict[str, np.ndarray]]:
    """Load VGG16 + LPIPS-linear weights from an .npz (see tools/).

    Empty ``path`` gates the metric off (reported as nan).  A *set* path
    that is missing or malformed raises — a configured LPIPS must never
    silently degrade to nan.  If a ``<path>.sha256`` sidecar exists (the
    export tool writes one), the file hash is verified against it.
    """
    if not path:
        return None
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"cfg.lpips_weights={path!r} does not exist. Generate it once "
            "offline with tools/export_lpips_weights.py (needs torchvision "
            "+ lpips) and copy it here.")
    sidecar = path + ".sha256"
    if os.path.isfile(sidecar):
        import hashlib
        want = open(sidecar).read().split()[0].strip()
        with open(path, "rb") as fp:
            got = hashlib.sha256(fp.read()).hexdigest()
        if got != want:
            raise ValueError(
                f"{path} sha256 mismatch: got {got}, expected {want} "
                f"(from {sidecar}) — the weights file is corrupt or stale.")
    data = dict(np.load(path))
    missing = _LPIPS_KEYS - set(data)
    if missing:
        raise ValueError(
            f"{path} is not a valid LPIPS weights file: missing "
            f"{sorted(missing)[:4]}... (re-export with "
            "tools/export_lpips_weights.py)")
    # pin on device once: the jitted per-frame LPIPS graph would
    # otherwise re-upload ~60 MB of numpy VGG weights every view
    return {k: jnp.asarray(v) for k, v in data.items()}


def _vgg_features(x: jnp.ndarray, params: Dict[str, jnp.ndarray]):
    """x: [1, H, W, 3] in [0,1]. Returns the 5 tap activations."""
    x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    feats = []
    li = 0
    for bi, (ch, n_convs) in enumerate(_VGG_BLOCKS):
        for ci in range(n_convs):
            w = params[f"conv{li}_w"]                # [3,3,in,out] HWIO
            b = params[f"conv{li}_b"]
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            x = jax.nn.relu(x)
            li += 1
        feats.append(x)
        if bi < len(_VGG_BLOCKS) - 1:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return feats


@jax.jit
def _lpips_graph(pred: jnp.ndarray, gt: jnp.ndarray,
                 params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    # jitted: the ~40-op VGG graph runs per eval FRAME — eager it would
    # be ~40 tunnel dispatches per view on the remote backend (CLAUDE.md:
    # anything on a per-frame path must be inside jit)
    fp = _vgg_features(pred[None], params)
    fg = _vgg_features(gt[None], params)
    total = 0.0
    for i, (a, b) in enumerate(zip(fp, fg)):
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
        d = (a - b) ** 2                                    # [1,H,W,C]
        lin = params[f"lin{i}_w"].reshape(1, 1, 1, -1)      # 1x1 conv weights
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1))
    return total


def compute_lpips(pred: jnp.ndarray, gt: jnp.ndarray,
                  params: Optional[Dict[str, np.ndarray]]) -> float:
    """LPIPS-VGG between two [H, W, 3] images in [0,1]; nan if no weights."""
    if params is None:
        return float("nan")
    return float(_lpips_graph(jnp.asarray(pred), jnp.asarray(gt), params))
