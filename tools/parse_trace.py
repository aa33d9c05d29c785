#!/usr/bin/env python
"""Aggregate an xplane.pb device trace into per-op time (TPU 'XLA Ops'
line), grouped by fusion/op name.  Usage: parse_trace.py [trace_dir]"""
from __future__ import annotations

import collections
import glob
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nerf_trace"
    path = sorted(glob.glob(f"{root}/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            tot = collections.Counter()
            cnt = collections.Counter()
            span = 0
            for ev in line.events:
                name = meta[ev.metadata_id].name
                # strip trailing dotted indices: fusion.123 -> fusion
                base = re.sub(r"\.\d+$", "", name)
                tot[base] += ev.duration_ps
                cnt[base] += 1
                span += ev.duration_ps
            print(f"== {plane.name} / {line.name}: "
                  f"{span/1e9:.3f} ms total busy ==")
            for name, ps in tot.most_common(40):
                print(f"{ps/1e9:9.3f} ms  x{cnt[name]:<5d} {name[:90]}")


if __name__ == "__main__":
    main()
