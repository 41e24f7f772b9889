"""Pure-function image/volume ops (jnp reference implementations + Pallas)."""

from fal_net_tpu.ops.shift import hshift, hshift_planes, hflip
from fal_net_tpu.ops.med import (
    disparity_levels,
    normalized_offsets,
    pixel_shifts,
    disparity_expectation,
    med_outputs,
    MedOutputs,
)
from fal_net_tpu.ops.resize import (
    resize_nearest_torch,
    resize_bilinear_align_corners,
)

__all__ = [
    "hshift",
    "hshift_planes",
    "hflip",
    "disparity_levels",
    "normalized_offsets",
    "pixel_shifts",
    "disparity_expectation",
    "med_outputs",
    "MedOutputs",
    "resize_nearest_torch",
    "resize_bilinear_align_corners",
]
