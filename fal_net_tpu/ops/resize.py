"""Torch-semantics image resizes, needed for fp32 parity with the reference.

``jax.image.resize`` uses half-pixel centers for 'nearest', which does NOT
match ``torch.nn.functional.interpolate``:

  * torch 'nearest'  : src = floor(dst * H_in / H_out)
    (decoder upsampling, FAL_netB.py:58; ms-pp upscale, Test_KITTI.py:293)
  * torch 'bilinear', align_corners=True: src = dst * (H_in-1)/(H_out-1)
    (realEPE upsample, loss_functions.py:172; ms-pp downscale,
    Test_KITTI.py:291-292)

These are implemented as separable 1-D gathers, which XLA fuses well.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _nearest_indices(out_size: int, in_size: int) -> jax.Array:
    scale = in_size / out_size
    idx = jnp.floor(jnp.arange(out_size, dtype=jnp.float32) * scale).astype(jnp.int32)
    return jnp.clip(idx, 0, in_size - 1)


def resize_nearest_torch(x: jax.Array, size: tuple[int, int], *, h_axis: int = -3, w_axis: int = -2) -> jax.Array:
    """Nearest-neighbour resize matching torch ``interpolate(mode='nearest')``.

    ``x`` is NHWC by default (h_axis=-3, w_axis=-2).  Exact integer
    upscaling (src = floor(dst/k)) is lowered as ``jnp.repeat`` —
    broadcast+reshape instead of a TPU-hostile gather; identical indices.
    """

    def _along(x, out_size, axis):
        in_size = x.shape[axis]
        if out_size == in_size:
            return x
        if out_size % in_size == 0:
            return jnp.repeat(x, out_size // in_size, axis=axis)
        return jnp.take(x, _nearest_indices(out_size, in_size), axis=axis)

    out_h, out_w = size
    x = _along(x, out_h, h_axis % x.ndim)
    x = _along(x, out_w, w_axis % x.ndim)
    return x


def _linear_weights(out_size: int, in_size: int, align_corners: bool):
    # Sizes are static at trace time: compute indices/weights in float64 on
    # host for exactness (torch computes them in double on CPU too).
    import numpy as np

    if out_size == 1:
        src = np.zeros((1,), np.float64)
    elif align_corners:
        src = np.arange(out_size, dtype=np.float64) * ((in_size - 1) / (out_size - 1))
    else:
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * (in_size / out_size) - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.clip(np.floor(src).astype(np.int32), 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    t = (src - lo).astype(np.float32)
    return jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(t)


def resize_bilinear_align_corners(
    x: jax.Array,
    size: tuple[int, int],
    *,
    h_axis: int = -3,
    w_axis: int = -2,
    align_corners: bool = True,
) -> jax.Array:
    """Bilinear resize matching torch ``interpolate(mode='bilinear')``."""
    out_h, out_w = size

    def _along(x, out_size, axis):
        lo, hi, t = _linear_weights(out_size, x.shape[axis], align_corners)
        v0 = jnp.take(x, lo, axis=axis)
        v1 = jnp.take(x, hi, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = out_size
        t = t.reshape(shape).astype(x.dtype)
        return v0 * (1 - t) + v1 * t

    x = _along(x, out_h, h_axis % x.ndim)
    x = _along(x, out_w, w_axis % x.ndim)
    return x
