"""Device mesh and sharding rules.

The reference has no multi-device support at all (single CUDA device,
SURVEY.md §2.4). Here parallelism is mesh-native: a 1-D ``data`` axis for
batch-parallel training (grad all-reduce rides ICI via the psum XLA inserts
from the shardings); the same program runs single-chip when the mesh has one
device. Multi-host runs initialize ``jax.distributed`` and use the identical
code path — there is no separate "distributed" implementation to keep in
sync.

The model is small (35 M params), so parameters are replicated; tensor /
pipeline sharding would add collective latency for no memory benefit
(documented out of scope, matching SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices > len(devices):
                raise ValueError(
                    f"requested {n_devices} devices, only {len(devices)} "
                    "available (a silently truncated mesh would fail later "
                    "with an opaque sharding error)")
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
