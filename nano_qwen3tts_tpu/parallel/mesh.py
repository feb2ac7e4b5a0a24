"""Device mesh construction.

TPU-native replacement for the reference's NCCL process-group setup
(engine/model_runner/base.py:38-52) and SharedMemory rank-RPC fan-out
(base.py:68-120): one logical program over a ``Mesh(("data", "model"))``;
XLA GSPMD inserts the collectives (psum after row-parallel matmuls,
all-gathers where layouts require) that the reference performs explicitly
via torch.distributed (layers/linear.py:151-153, embed_head.py:41,63-65).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans hosts — collectives ride ICI within a slice and DCN
across slices; there is no per-rank Python RPC loop to port.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 1, model: int = 1, devices: Optional[list] = None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev_array = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def mesh_for(n_devices: int, devices: Optional[list] = None) -> Mesh:
    """Pick a (data, model) factorization for n devices: prefer model-parallel
    pairs with a data axis when the device count allows."""
    if n_devices >= 4 and n_devices % 2 == 0:
        return make_mesh(data=2, model=n_devices // 2, devices=devices)
    return make_mesh(data=1, model=n_devices, devices=devices)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
