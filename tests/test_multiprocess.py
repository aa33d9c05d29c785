"""Two-process `jax.distributed` coordination test (round-4 VERDICT #2).

The reference is single-process by construction (rank=0 hardcoded,
main.py:166-170); this framework's multi-host story is "same code path
after jax.distributed.initialize()" (SURVEY §5).  Here that is
demonstrated for real: two coordinated CPU processes (4 virtual devices
each) run the sharded train step over one 8-device mesh through the
actual ``maybe_initialize_distributed`` env contract, and the
cross-process psum'd result must equal the single-process 8-device run.

Also pins the loud-failure policy: a half-configured multi-host launch
raises instead of silently degrading to single-process.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "mp_worker.py")
_ENV_VARS = ("NERF_TPU_COORDINATOR", "NERF_TPU_NUM_PROCESSES",
             "NERF_TPU_PROCESS_ID")


def _worker_env():
    env = dict(os.environ)
    for v in _ENV_VARS:
        env.pop(v, None)
    env.pop("XLA_FLAGS", None)   # the worker sets its own device count
    return env


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_psum_matches_single_process(tmp_path):
    env = _worker_env()
    single = tmp_path / "single.json"
    multi = tmp_path / "multi.json"

    r = subprocess.run(
        [sys.executable, WORKER, "single", str(single)],
        env=env, cwd=ROOT, timeout=600, capture_output=True, text=True)
    assert r.returncode == 0, f"single worker failed:\n{r.stderr[-3000:]}"

    port = _free_port()
    p1 = subprocess.Popen(
        [sys.executable, WORKER, "multi", str(multi), "1", str(port)],
        env=env, cwd=ROOT, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    try:
        r0 = subprocess.run(
            [sys.executable, WORKER, "multi", str(multi), "0", str(port)],
            env=env, cwd=ROOT, timeout=600, capture_output=True, text=True)
        out1, _ = p1.communicate(timeout=120)
    finally:
        if p1.poll() is None:
            p1.kill()
    assert r0.returncode == 0, f"rank0 failed:\n{r0.stderr[-3000:]}"
    assert p1.returncode == 0, f"rank1 failed:\n{out1[-3000:]}"

    a = json.load(open(single))
    b = json.load(open(multi))
    # GSPMD 8-dev single-process vs 2-process 4+4: same program semantics,
    # cross-process collectives via Gloo — tiny reduction-order noise only
    assert abs(a["loss"] - b["loss"]) <= 1e-6 * max(1.0, abs(a["loss"])), (a, b)
    assert abs(a["param_l1"] - b["param_l1"]) <= 1e-5 * a["param_l1"], (a, b)


def test_half_configured_multihost_raises(monkeypatch):
    from nerf_pytorch_paeng_tpu.parallel import mesh as mesh_mod
    monkeypatch.setattr(mesh_mod, "_distributed_done", False)
    monkeypatch.setenv("NERF_TPU_COORDINATOR", "localhost:1")
    for v in ("NERF_TPU_NUM_PROCESSES", "NERF_TPU_PROCESS_ID"):
        monkeypatch.delenv(v, raising=False)
    with pytest.raises(RuntimeError, match="half-configured"):
        mesh_mod.maybe_initialize_distributed()
