"""Spatial (H-axis) partitioning — scaling beyond data parallelism.

A purely convolutional model has no tensor-parallel axis worth sharding,
but its *activations* do: partitioning the image height across devices
splits every conv's FLOPs and memory, and XLA's SPMD partitioner inserts
the halo exchanges (ppermute of boundary rows) needed by 3x3 convs and the
stride-2 downsamples automatically.  This lets one logical image larger
than a chip's HBM (or a latency-critical batch-1 inference) run across a
mesh — a capability the reference (single-GPU DataParallel only, SURVEY
§2.6) has no analog of.

Usage: a 2-D mesh ('data', 'spatial'); batches sharded
P('data', 'spatial') — batch over data, rows over spatial; params
replicated.  The MED head's shifts act on W (unsharded), so only the
backbone's H-convolutions introduce collectives, and those ride ICI.

The fused Pallas MED kernel has no SPMD partitioning rule, but it rides
('data', 'spatial') meshes via ``shard_map`` — every MED op is row-local,
so the H-split is exact (``ops/med_pallas.py::med_outputs_fused_dp`` with
``spatial_axis``; wired by FalNet's ``med_spatial_axis``).  Only traced
per-sample bounds or indivisible shapes fall back to the jnp path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_2d_mesh(
    data: int,
    spatial: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    assert len(devs) >= data * spatial, (
        f"need {data * spatial} devices, have {len(devs)}"
    )
    grid = np.asarray(devs[: data * spatial]).reshape(data, spatial)
    return Mesh(grid, ("data", "spatial"))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch: batch over 'data', rows over 'spatial'."""
    return NamedSharding(mesh, P("data", "spatial"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
