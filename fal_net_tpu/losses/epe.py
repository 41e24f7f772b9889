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


def real_epe_np(pred_hw, target_hw) -> float:
    """Host-side numpy twin of :func:`real_epe` for SAME-SIZE single-channel
    disparity maps (the eval/validation case: the forward runs at the native
    image resolution, so real_epe's align_corners=True upsample is the
    identity).  Computing this per image in jnp on already-fetched arrays
    would re-upload both maps and block on a device sync each frame."""
    import numpy as np

    assert pred_hw.shape == target_hw.shape, (pred_hw.shape, target_hw.shape)
    valid = (target_hw != 0).astype(pred_hw.dtype)
    return float(
        (np.abs(pred_hw - target_hw) * valid).sum() / max(valid.sum(), 1.0)
    )


def sparse_max_pool(x: jax.Array, size) -> jax.Array:
    """Adaptive max-pool that preserves signed sparse values
    (loss_functions.py:141-146): positives and negatives pooled separately
    so zeros (invalid) never win over valid negatives."""
    pos = jnp.where(x > 0, x, 0.0)
    neg = jnp.where(x < 0, -x, 0.0)
    return _adaptive_max_pool(pos, size) - _adaptive_max_pool(neg, size)


def _adaptive_max_pool(x: jax.Array, size) -> jax.Array:
    """torch adaptive_max_pool2d semantics on NHWC: bin i spans
    [floor(i*in/out), ceil((i+1)*in/out))."""
    import numpy as np

    out_h, out_w = size

    def _along(x, out_size, axis):
        in_size = x.shape[axis]
        starts = np.floor(np.arange(out_size) * in_size / out_size).astype(int)
        ends = np.ceil((np.arange(out_size) + 1) * in_size / out_size).astype(int)
        slices = [
            jnp.max(
                jax.lax.slice_in_dim(x, int(s), int(e), axis=axis),
                axis=axis,
                keepdims=True,
            )
            for s, e in zip(starts, ends)
        ]
        return jnp.concatenate(slices, axis=axis)

    x = _along(x, out_h, -3)
    x = _along(x, out_w, -2)
    return x


def multiscale_epe(
    outputs,
    target: jax.Array,
    weights=None,
    sparse: bool = False,
) -> jax.Array:
    """Weighted sum of per-scale EPEs (loss_functions.py:149-167).

    ``outputs`` is one array or a list of NHWC predictions at decreasing
    scales; the target is adaptively pooled (max for sparse, mean for
    dense) to each scale.
    """
    if not isinstance(outputs, (tuple, list)):
        outputs = [outputs]
    if weights is None:
        weights = [0.001, 0.005, 0.01, 0.02, 0.08, 0.32]  # FlowNet defaults
    assert len(weights) == len(outputs)

    total = 0.0
    for out, weight in zip(outputs, weights):
        h, w = out.shape[-3], out.shape[-2]
        if sparse:
            scaled = sparse_max_pool(target, (h, w))
        else:
            scaled = _adaptive_avg_pool(target, (h, w))
        total = total + weight * epe(out, scaled, sparse, mean=False)
    return total


def _adaptive_avg_pool(x: jax.Array, size) -> jax.Array:
    import numpy as np

    out_h, out_w = size

    def _along(x, out_size, axis):
        in_size = x.shape[axis]
        starts = np.floor(np.arange(out_size) * in_size / out_size).astype(int)
        ends = np.ceil((np.arange(out_size) + 1) * in_size / out_size).astype(int)
        slices = [
            jnp.mean(
                jax.lax.slice_in_dim(x, int(s), int(e), axis=axis),
                axis=axis,
                keepdims=True,
            )
            for s, e in zip(starts, ends)
        ]
        return jnp.concatenate(slices, axis=axis)

    x = _along(x, out_h, -3)
    x = _along(x, out_w, -2)
    return x
