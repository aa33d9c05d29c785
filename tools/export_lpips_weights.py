#!/usr/bin/env python
"""Export VGG16 + LPIPS linear weights to the .npz this framework loads.

LPIPS needs pretrained weights that cannot ship inside the repo.  Run this
once on any machine that has ``torchvision`` and ``lpips`` installed
(neither is required by the framework itself):

    python tools/export_lpips_weights.py --out lpips_vgg16.npz

then point the config at it:

    python main.py --config configs/blender/lego.txt \
        --lpips_weights lpips_vgg16.npz

Layout produced (consumed by nerf_pytorch_paeng_tpu/eval/metrics.py):
  conv{i}_w : [3,3,in,out] float32 (HWIO), i = 0..12 over VGG16's 13 convs
  conv{i}_b : [out]
  lin{i}_w  : [C_i] per-channel LPIPS linear weights, i = 0..4 taps
              (relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3)

A ``<out>.sha256`` sidecar is written next to the .npz; the loader
(eval/metrics.load_lpips_params) verifies it, so copy BOTH files.  The
one-time offline step on a machine with internet access:

    pip install torchvision lpips
    python tools/export_lpips_weights.py --out lpips_vgg16.npz
    scp lpips_vgg16.npz lpips_vgg16.npz.sha256 <target>:

The LPIPS *graph* itself is golden-tested with random weights
(tests/test_eval.py), and THIS tool's conversion (layer ordering, OIHW->
HWIO transpose, channel-width sequence, sha256 sidecar, end-to-end
export->load->graph) is tested against a layout-faithful fake VGG in
tests/test_eval.py::test_lpips_export_roundtrip — the only untested code
path is torchvision's download itself.
"""
from __future__ import annotations

import argparse
import hashlib

import numpy as np

# VGG16 conv channel plan — must mirror eval/metrics._VGG_BLOCKS (and
# torchvision's vgg16().features ordering): 13 convs in 5 blocks.
_VGG_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
_EXPECTED_OUT_CHANNELS = [ch for ch, n in _VGG_BLOCKS for _ in range(n)]
_TAP_CHANNELS = [ch for ch, _ in _VGG_BLOCKS]


def convert(vgg_features, lins) -> dict:
    """torch modules -> the flat numpy dict the framework loads.

    ``vgg_features``: an iterable of torch layers in torchvision's
    ``vgg16().features`` order (Conv2d/ReLU/MaxPool2d interleaved — the
    convs are taken in encounter order, which IS the layer-ordering
    assumption this function owns and the fixture test pins).
    ``lins``: the 5 LPIPS per-tap linear modules (lpips.LPIPS(net='vgg')
    .lins), each exposing its 1x1 conv weight at ``.model[-1].weight``.
    """
    arrays = {}
    conv_i = 0
    for layer in vgg_features:
        if layer.__class__.__name__ != "Conv2d":
            continue
        w = layer.weight.detach().numpy()           # [out, in, 3, 3] OIHW
        if w.shape[0] != _EXPECTED_OUT_CHANNELS[conv_i]:
            raise ValueError(
                f"conv {conv_i}: out_channels {w.shape[0]} != expected "
                f"{_EXPECTED_OUT_CHANNELS[conv_i]} — torchvision layer "
                "ordering changed; update _VGG_BLOCKS in both this tool "
                "and eval/metrics.py")
        arrays[f"conv{conv_i}_w"] = np.transpose(
            w, (2, 3, 1, 0)).astype(np.float32)     # HWIO
        arrays[f"conv{conv_i}_b"] = (
            layer.bias.detach().numpy().astype(np.float32))
        conv_i += 1
    if conv_i != 13:
        raise ValueError(f"expected 13 convs, found {conv_i}")

    lins = list(lins)
    if len(lins) != 5:
        raise ValueError(f"expected 5 LPIPS taps, found {len(lins)}")
    for i, lin in enumerate(lins):
        w = lin.model[-1].weight.detach().numpy()   # [1, C, 1, 1]
        w = w.reshape(-1).astype(np.float32)
        if w.shape[0] != _TAP_CHANNELS[i]:
            raise ValueError(
                f"lin {i}: {w.shape[0]} channels != tap width "
                f"{_TAP_CHANNELS[i]} (relu{i+1} tap)")
        arrays[f"lin{i}_w"] = w
    return arrays


def write_npz(arrays: dict, out_path: str) -> str:
    """Write the .npz + its .sha256 sidecar; returns the digest."""
    np.savez(out_path, **arrays)
    with open(out_path, "rb") as fp:
        digest = hashlib.sha256(fp.read()).hexdigest()
    with open(out_path + ".sha256", "w") as fp:
        fp.write(f"{digest}  {out_path}\n")
    return digest


def main(out_path: str) -> None:
    import lpips  # type: ignore
    import torchvision  # type: ignore

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features.eval()
    loss = lpips.LPIPS(net="vgg")
    arrays = convert(vgg, loss.lins)
    digest = write_npz(arrays, out_path)
    print(f"wrote {out_path}: {len(arrays)} arrays (sha256 {digest[:16]}…)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg16.npz")
    main(ap.parse_args().out)
