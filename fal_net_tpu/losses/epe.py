"""Endpoint-error metrics (reference loss_functions.py:115-173).

Only ``realEPE`` is consumed by the reference training scripts
(Train_Stage1_K.py:311); it bilinearly upsamples (align_corners=True) the
prediction to the target size and masks sparse targets (zeros = invalid).

Sparse masking note: the reference boolean-indexes the EPE map
(``EPE_map[~mask]``), which is shape-dynamic.  Under jit we compute the
identical mean with a weighted sum — same value, static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fal_net_tpu.ops.resize import resize_bilinear_align_corners


def epe(pred: jax.Array, target: jax.Array, sparse: bool = False, mean: bool = True) -> jax.Array:
    """L2 norm over the channel axis, averaged. NHWC layout.

    For disparity, channels == 1 and the 'invalid' sparse mask is
    ``target == 0`` on channel 0 (loss_functions.py:128-131).
    """
    epe_map = jnp.linalg.norm(target - pred, axis=-1)  # (B,H,W)
    if sparse:
        valid = (target[..., 0] != 0).astype(epe_map.dtype)
        if mean:
            return jnp.sum(epe_map * valid) / jnp.maximum(jnp.sum(valid), 1)
        batch = epe_map.shape[0]
        return jnp.sum(epe_map * valid) / batch
    if mean:
        return jnp.mean(epe_map)
    return jnp.sum(epe_map) / epe_map.shape[0]


def real_epe(pred: jax.Array, target: jax.Array, sparse: bool = False) -> jax.Array:
    """Upsample prediction to target size (bilinear, align_corners=True) then EPE."""
    h, w = target.shape[-3], target.shape[-2]
    up = resize_bilinear_align_corners(pred, (h, w), align_corners=True)
    return epe(up, target, sparse=sparse, mean=True)
