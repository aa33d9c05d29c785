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
(tests/test_eval.py) so the math is trusted independently of this asset.
"""
from __future__ import annotations

import argparse
import hashlib

import numpy as np


def main(out_path: str) -> None:
    import lpips  # type: ignore
    import torchvision  # type: ignore

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features.eval()
    loss = lpips.LPIPS(net="vgg")

    arrays = {}
    conv_i = 0
    for layer in vgg:
        if layer.__class__.__name__ == "Conv2d":
            w = layer.weight.detach().numpy()       # [out, in, 3, 3] OIHW
            arrays[f"conv{conv_i}_w"] = np.transpose(
                w, (2, 3, 1, 0)).astype(np.float32)  # HWIO
            arrays[f"conv{conv_i}_b"] = (
                layer.bias.detach().numpy().astype(np.float32))
            conv_i += 1
    assert conv_i == 13, conv_i

    for i, lin in enumerate(loss.lins):
        w = lin.model[-1].weight.detach().numpy()   # [1, C, 1, 1]
        arrays[f"lin{i}_w"] = w.reshape(-1).astype(np.float32)

    np.savez(out_path, **arrays)
    with open(out_path, "rb") as fp:
        digest = hashlib.sha256(fp.read()).hexdigest()
    with open(out_path + ".sha256", "w") as fp:
        fp.write(f"{digest}  {out_path}\n")
    print(f"wrote {out_path}: {len(arrays)} arrays (sha256 {digest[:16]}…)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg16.npz")
    main(ap.parse_args().out)
