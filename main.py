#!/usr/bin/env python
"""CLI entry: ``python main.py --config configs/blender/lego.txt``.

Keeps the reference's CLI contract (reference main.py:164-171 +
config.py:18) on top of the TPU-native driver.
"""
from nerf_pytorch_paeng_tpu.config import load_config
from nerf_pytorch_paeng_tpu.driver import main_worker

if __name__ == "__main__":
    cfg = load_config()
    print(f"\n{cfg}\n")
    main_worker(cfg)
