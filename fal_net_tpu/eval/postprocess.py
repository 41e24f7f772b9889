"""Inference post-processing (Test_KITTI.py:199-205, 287-300).

Both post-processors run a second forward pass on a flipped input; the
model apply function is passed in so the whole pipeline stays jittable.
The reference's ``np.percentile`` host sync (Test_KITTI.py:297) is replaced
with an on-device ``jnp.percentile``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from fal_net_tpu.ops.shift import hflip
from fal_net_tpu.ops.resize import resize_bilinear_align_corners, resize_nearest_torch

# apply_fn(image_nhwc) -> disparity (B,H,W,1)
DispFn = Callable[[jax.Array], jax.Array]


def flip_post_process(image: jax.Array, disp_fn: DispFn, disp: jax.Array) -> jax.Array:
    """Average of disp and unflipped disp-of-flipped-input (Test_KITTI.py:199-203)."""
    flip_disp = hflip(disp_fn(hflip(image, axis=-2)), axis=-2)
    return (disp + flip_disp) / 2.0


def ms_post_process(
    image: jax.Array,
    disp_fn: DispFn,
    disp: jax.Array,
    up_fac: float = 2.0 / 3.0,
) -> jax.Array:
    """Multi-scale post-process (Test_KITTI.py:287-300).

    Second pass at ``up_fac`` scale on the flipped input; nearest-upsampled
    back (torch semantics), rescaled by 1/up_fac, re-flipped, and blended by
    ``norm = clamp(disp / percentile95(disp), <=1)``:
        out = (1-norm) * disp + norm * down_flip_disp
    """
    h, w = image.shape[-3], image.shape[-2]
    small_hw = (int(h * up_fac), int(w * up_fac))
    upscaled = resize_bilinear_align_corners(
        hflip(image, axis=-2), small_hw, align_corners=True
    )
    dwn_flip_disp = disp_fn(upscaled)
    dwn_flip_disp = (1.0 / up_fac) * resize_nearest_torch(dwn_flip_disp, (h, w))
    dwn_flip_disp = hflip(dwn_flip_disp, axis=-2)

    # Per-image percentile: the reference runs batch-1 (identical there),
    # and a batch-global percentile would couple each image's blend to its
    # batchmates (incl. zero-padded tail slots in the streaming pipeline).
    norm = disp / (jnp.percentile(disp, 95, axis=(1, 2, 3), keepdims=True) + 1e-6)
    norm = jnp.minimum(norm, 1.0)
    return (1.0 - norm) * disp + norm * dwn_flip_disp
