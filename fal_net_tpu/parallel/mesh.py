"""Mesh + sharding helpers.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
pinned to one GPU (Train_Stage1_K.py:172, §2.6 of SURVEY).  The TPU-native
equivalent is batch data-parallelism over a 1-D ``Mesh(('data',))``:
params/opt-state replicated, batches sharded on axis 0, and the gradient
all-reduce emitted by XLA from the sharding annotations (riding ICI).

Convs give no natural tensor-parallel axis, so scaling beyond data
parallelism is spatial: see ``fal_net_tpu.parallel.spatial`` (H-axis
sharding with halo exchange) for very large inputs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    axis_name: str = "data",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def make_mesh_for_batch(batch_size: int, axis_name: str = "data") -> Mesh:
    """Largest data mesh (<= available devices) that evenly divides the
    global batch; a batch not divisible by the device count would otherwise
    fail to shard."""
    n = len(jax.devices())
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(n, axis_name)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (batch) across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis_name: str = "data") -> Dict[str, Any]:
    """Place a host batch dict with batch-axis sharding over the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)) and np.issubdtype(np.asarray(v).dtype, np.number):
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out
