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
