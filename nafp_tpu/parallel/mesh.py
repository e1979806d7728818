"""Device-mesh helpers.

The workload is a 19M-param CNN on 1-s segments: data parallelism over an
ICI mesh is the meaningful axis (the reference's unfinished
``NTxent_loss_tpu.py`` targeted exactly this). A 1-D ``('data',)`` mesh
covers single-chip, multi-chip, and the virtual CPU test mesh with one
code path; the NT-Xent all-gather and grad psum ride ICI.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def mesh_from_cfg(cfg: Dict[str, Any]) -> Mesh:
    n = int(cfg.get("DEVICE", {}).get("MESH_DATA_PARALLEL", -1) or -1)
    return make_data_mesh(None if n <= 0 else n)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
