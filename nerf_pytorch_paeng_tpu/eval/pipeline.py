"""Pipelined per-frame eval loop shared by eval/test.py and eval/render.py.

Frame i+1's device programs are dispatched BEFORE frame i's outputs are
fetched and encoded, and host IO (PNG writes, ~0.2-0.4 s/frame at
800x800) runs on a small thread pool — so image IO overlaps device
rendering instead of serialising the per-view loop (the reference's eval
loop is fully serial, /root/reference/test.py:36-47).
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable


def pipelined_frames(items: Iterable, render_one: Callable,
                     drain_one: Callable, io_workers: int = 2) -> None:
    """Run ``render_one(i, item)`` (dispatch device work, return outputs)
    one frame ahead of ``drain_one(i, outputs, submit)`` (fetch to host,
    compute metrics, queue IO via ``submit(fn, *args)``).

    Queued IO errors are surfaced after the loop; the pool is always shut
    down (waiting for queued writes) even when a frame raises, so a
    mid-loop device failure neither leaks threads nor masks its error
    with a half-written artifact.
    """
    io_pool = ThreadPoolExecutor(max_workers=io_workers)
    io_futs = []

    def submit(fn, *args):
        io_futs.append(io_pool.submit(fn, *args))

    try:
        pending = None
        for i, item in enumerate(items):
            out = render_one(i, item)
            if pending is not None:
                drain_one(*pending, submit)
            pending = (i, out)
        if pending is not None:
            drain_one(*pending, submit)
        for f in io_futs:
            f.result()                    # surface any IO error
    finally:
        io_pool.shutdown(wait=True)
