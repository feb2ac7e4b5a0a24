"""Multi-host (multi-controller) scaling test.

Spawns 2 real OS processes, each a JAX controller with 4 virtual CPU
devices, connected via jax.distributed + gloo collectives — the same
machinery a TPU pod uses over DCN (SURVEY §2.9 N4/N5: replaces the
reference's NCCL + SharedMemory + ZMQ inter-process stack). The production
fused prefill/decode steps run as one logical program spanning both
processes and must match a single-device reference bit-for-bit on sampled
frames (see multihost_worker.py).
"""

import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_serving_step():
    port, nproc = free_port(), 2
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(port), str(nproc), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK pid={pid}" in out, out[-4000:]
    # both controllers observed the same sampled frames
    sums = sorted(
        line.split("frames=")[1]
        for out in outs
        for line in out.splitlines()
        if "MULTIHOST_OK" in line
    )
    assert len(sums) == 2 and sums[0] == sums[1], sums


def _run_engine_pair(dp: int, tp: int):
    """Run the production-TTSEngine worker as a single-process control and
    as 2 real OS-process controllers; return the three frame dicts."""
    import json

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}

    def frames_of(out: str):
        for line in out.splitlines():
            if line.startswith("ENGINE_FRAMES "):
                return json.loads(line.split(" ", 1)[1])
        return None

    worker = os.path.join(HERE, "multihost_engine_worker.py")
    ctrl = subprocess.run(
        [sys.executable, worker, "single", str(dp), str(tp)],
        capture_output=True, text=True, timeout=540, env=env,
    )
    assert ctrl.returncode == 0, ctrl.stdout[-4000:] + ctrl.stderr[-4000:]
    port = free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "multi", str(port), "2", str(pid),
             str(dp), str(tp)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
    return frames_of(ctrl.stdout), frames_of(outs[0]), frames_of(outs[1])


def test_two_process_production_engine_dp2():
    """The FULL production TTSEngine (data-sharded serving: per-shard
    KV/pool state under manual-"data" shard_map, scheduler shard pinning,
    least-loaded assignment) across 2 real OS processes, data axis spanning
    the controllers — frames bit-identical to a single-process run of the
    same logical mesh. The worker also asserts zero cross-data collectives
    in the compiled decode program the engine actually ran (VERDICT r3
    next #3; reference workers/client_bridge.py:248-269 crosses processes
    as its normal serving form)."""
    ctrl, p0, p1 = _run_engine_pair(dp=2, tp=1)
    assert ctrl is not None and ctrl == p0 == p1


def test_two_process_production_engine_dp2_tp2():
    """Same, with a real model axis inside each data shard (dp=2 x tp=2:
    each controller hosts one shard's 2-device TP slice; model-axis
    collectives stay host-local, data axis crosses the processes)."""
    ctrl, p0, p1 = _run_engine_pair(dp=2, tp=2)
    assert ctrl is not None and ctrl == p0 == p1
