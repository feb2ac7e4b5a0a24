"""Multi-host (multi-controller) runtime setup.

TPU-native replacement for the reference's inter-process plumbing: where the
reference coordinates GPU worker processes over ZMQ TCP + pickle
(workers/client_bridge.py:35-309) and TP rank processes over SharedMemory
RPC (engine/model_runner/base.py:68-120), a multi-host TPU deployment is N
identical controller processes running ONE logical JAX program. After
``init_multihost`` every process sees the global device set; ``pjit``-ed
steps span all hosts, XLA emits collectives that ride ICI within a slice and
DCN across slices, and no per-frame host<->host message exists at all.

Mesh policy (scaling-book recipe): the **model axis stays inside a host's
slice** (collectives for row-parallel matmuls ride ICI), the **data axis
spans hosts** (per-host engine replicas / batch shards; only gradient-free
inference traffic, so DCN latency is off the hot path).

Environment contract (used by ``init_multihost()`` with no arguments —
mirrors the reference's env-driven server config, examples/server.py:39-62):

  JAX_COORDINATOR_ADDRESS  host:port of process 0
  JAX_NUM_PROCESSES        world size
  JAX_PROCESS_ID           this process's rank

On TPU pods with standard orchestration these are auto-detected by
``jax.distributed.initialize()`` itself; the env contract is for manual /
CPU-mesh bring-up.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-controller runtime. Returns True if distributed
    mode is active (more than one process), False for single-process runs.

    Safe to call unconditionally at startup: with no arguments and no
    environment contract, single-process mode is assumed and nothing
    happens. On the CPU backend the gloo collectives implementation is
    selected so cross-process collectives work in tests.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes in (None, 1):
        return False  # single process; plain jax.devices() is the world

    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # flag absent on older jax — TPU path unaffected
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that should own logging / the API listener."""
    return jax.process_index() == 0


def multihost_mesh(
    model_per_host: Optional[int] = None, data_per_host: int = 1
) -> Mesh:
    """Build a global ``Mesh(("data", "model"))`` where the model axis is
    contained within each host's local devices and the data axis spans
    hosts (+ optionally extra data shards inside a host).

    Works identically for single-process runs (data axis == data_per_host).
    """
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_local = len(jax.local_devices())
    n_proc = jax.process_count()
    if model_per_host is None:
        assert n_local % data_per_host == 0, (n_local, data_per_host)
        model_per_host = n_local // data_per_host
    assert data_per_host * model_per_host == n_local, (
        f"host has {n_local} devices, asked data={data_per_host} x "
        f"model={model_per_host}"
    )
    dev_array = np.asarray(devices).reshape(
        n_proc * data_per_host, model_per_host
    )
    return Mesh(dev_array, axis_names=("data", "model"))


def global_array(host_value, sharding) -> jax.Array:
    """Place identical host data (same on every process) as one global
    sharded array. Each process contributes only its addressable shards
    (multi-controller equivalent of the reference's per-rank H2D staging,
    engine/model_runner/base.py:205-233)."""
    host_value = np.asarray(host_value)
    return jax.make_array_from_callback(
        host_value.shape, sharding, lambda idx: host_value[idx]
    )


def global_tree(tree: dict, shardings: dict, mesh: Mesh) -> dict:
    """Multi-host version of ``sharding.apply_shardings``: device_put every
    leaf by rule via ``global_array`` (missing rules -> replicated)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def rec(t, s):
        out = {}
        for k, v in t.items():
            rule = s.get(k) if isinstance(s, dict) else None
            if isinstance(v, dict):
                out[k] = rec(v, rule if isinstance(rule, dict) else {})
            else:
                out[k] = global_array(
                    v, rule if isinstance(rule, NamedSharding) else repl
                )
        return out

    return rec(tree, shardings)


def collective_span_report(compiled_text: str, mesh: Mesh) -> dict:
    """Parse a compiled HLO dump and classify every collective by which mesh
    axis its replica groups span. This is the scaling-efficiency *proof*
    artifact: a decode step whose collectives all stay inside the "model"
    axis (ICI, host-local by mesh construction) has zero cross-host traffic,
    so the data axis scales linearly on real pod hardware regardless of
    what a shared-CPU simulation measures.

    Handles the two replica_groups forms XLA emits: explicit
    ``{{0,1},{2,3}}`` and iota ``[G,K]<=[N]`` (N ids reshaped to G groups
    of K).
    """
    import re

    # device global id -> data-axis coordinate
    data_coord = {}
    dev = mesh.devices  # [data, model]
    for i in range(dev.shape[0]):
        for j in range(dev.shape[1]):
            data_coord[dev[i, j].id] = i

    kinds = ("all-reduce", "all-gather", "reduce-scatter",
             "collective-permute", "all-to-all")
    counts = {"model_axis": 0, "cross_data_axis": 0, "unknown": 0}
    for m in re.finditer(
        r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
        r"[^\n]*?replica_groups=(\{\{[\d,{} ]*\}\}|\[\d+,\d+\]<=\[[\d,]+\][^,\s]*)",
        compiled_text,
    ):
        spec = m.group(2)
        groups = []
        if spec.startswith("{{"):
            groups = [
                [int(x) for x in g.split(",") if x.strip()]
                for g in re.findall(r"\{([\d, ]*)\}", spec.strip("{}"))
            ]
        else:
            im = re.match(r"\[(\d+),(\d+)\]<=\[([\d,]+)\](.*)", spec)
            if im and not im.group(4):  # plain iota, no transpose suffix
                g, k = int(im.group(1)), int(im.group(2))
                dims = [int(x) for x in im.group(3).split(",")]
                n = 1
                for x in dims:
                    n *= x
                ids = list(range(n))
                groups = [ids[i * k : (i + 1) * k] for i in range(g)]
        if not groups:
            counts["unknown"] += 1
            continue
        spans_data = any(
            len({data_coord.get(i, -1) for i in grp}) > 1 for grp in groups
        )
        counts["cross_data_axis" if spans_data else "model_axis"] += 1
    return counts


def process_span_report(mesh: Mesh) -> dict:
    """Describe which mesh axes cross process (DCN) boundaries — used by
    startup logging and the scaling benchmark to confirm the model axis
    stays on ICI."""
    procs = np.vectorize(lambda d: d.process_index)(mesh.devices)
    return {
        "processes": int(jax.process_count()),
        "mesh_shape": dict(zip(mesh.axis_names, mesh.devices.shape)),
        "model_axis_crosses_hosts": bool(
            (procs.min(axis=1) != procs.max(axis=1)).any()
        ),
        "data_axis_spans_hosts": bool(
            (procs.min(axis=0) != procs.max(axis=0)).any()
        ),
    }
