"""Horizontal fractional-pixel shift ops.

The reference warps each disparity plane with a full 2-D
``affine_grid`` + ``grid_sample`` (reference ``models/FAL_netB.py:231-282``),
but every warp it ever issues is a *pure horizontal translation*.  On TPU a
general 2-D bilinear sampler is a waste: we implement the warp as a 1-D
linear-interpolation gather along W with zero padding, which XLA lowers to
vectorized gathers / slices and fuses with neighbours.

Sampling convention (must match ``F.grid_sample(..., align_corners=True,
padding_mode='zeros')`` for a grid ``g[..., 0] += x_of``):

  output[x] = input[x + s]      (bilinear in 1-D, out-of-range reads 0)

where for a normalized offset ``x_of = 2*d/W`` the *pixel* shift is

  s = x_of * (W - 1) / 2 = d * (W - 1) / W         (align_corners=True)
  s = x_of * W / 2       = d                       (align_corners=False)

(the align_corners=True grid maps u∈[-1,1] to pixels [0, W-1], so a
normalized shift of 2d/W lands d*(W-1)/W pixels away — NOT exactly d).
See :func:`fal_net_tpu.ops.med.pixel_shifts`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hshift(x: jax.Array, shift, *, axis: int = -1) -> jax.Array:
    """Sample ``x`` at ``index + shift`` along ``axis`` (1-D linear interp).

    ``shift`` is a scalar number of pixels (python float or traced 0-d
    array).  Out-of-range samples read as zero, matching torch
    ``grid_sample``'s ``padding_mode='zeros'`` boundary behaviour: a sample
    position p in (W-1, W) still blends ``(1-t) * x[W-1]`` with a zero
    right-neighbour.
    """
    width = x.shape[axis]
    shift = jnp.asarray(shift, dtype=jnp.float32)
    base = jnp.floor(shift)
    frac = (shift - base).astype(x.dtype)
    # Clamp the integer part so indices stay in int32 range even for huge
    # shifts; anything beyond +-width is all-zeros regardless.
    base = jnp.clip(base, -width - 1, width + 1).astype(jnp.int32)
    cols = jnp.arange(width, dtype=jnp.int32)
    idx0 = cols + base
    # NB: jnp.take(mode='fill') wraps *negative* indices numpy-style before
    # filling, so out-of-range reads must be masked explicitly.
    ndim = x.ndim
    axis_ = axis % ndim
    shape = [1] * ndim
    shape[axis_] = width

    def _read(idx):
        oob = (idx < 0) | (idx >= width)
        v = jnp.take(x, jnp.clip(idx, 0, width - 1), axis=axis_)
        return jnp.where(oob.reshape(shape), 0, v)

    return (1 - frac) * _read(idx0) + frac * _read(idx0 + 1)


def hshift_planes(x: jax.Array, shifts: jax.Array, *, axis: int = -2) -> jax.Array:
    """Shift each plane ``x[..., n]`` by its own ``shifts[n]`` pixels.

    ``x`` has planes stacked on the last axis (e.g. logits ``(B, H, W, N)``)
    and is sampled along ``axis`` (default: the W axis at -2).  Replaces the
    reference's per-plane python loop of N ``grid_sample`` launches
    (``models/FAL_netB.py:236-247``) with one vectorized gather.
    """
    width = x.shape[axis]
    n = x.shape[-1]
    shifts = jnp.asarray(shifts, dtype=jnp.float32)
    base = jnp.floor(shifts)
    frac = (shifts - base).astype(x.dtype)  # (N,)
    base = jnp.clip(base, -width - 1, width + 1).astype(jnp.int32)

    cols = jnp.arange(width, dtype=jnp.int32)
    idx0 = cols[:, None] + base[None, :]  # (W, N)
    # Gather per (w, n) pair: one_hot-free approach via take_along_axis on
    # an axis-aligned view.  Move the sampled axis next to the plane axis.
    x_moved = jnp.moveaxis(x, axis, -2)  # (..., W, N)
    oob0 = (idx0 < 0) | (idx0 >= width)
    oob1 = (idx0 + 1 < 0) | (idx0 + 1 >= width)
    safe0 = jnp.clip(idx0, 0, width - 1)
    safe1 = jnp.clip(idx0 + 1, 0, width - 1)
    bshape = (1,) * (x_moved.ndim - 2) + (width, n)
    v0 = jnp.take_along_axis(x_moved, safe0.reshape(bshape), axis=-2)
    v1 = jnp.take_along_axis(x_moved, safe1.reshape(bshape), axis=-2)
    v0 = jnp.where(oob0.reshape(bshape), 0, v0)
    v1 = jnp.where(oob1.reshape(bshape), 0, v1)
    out = (1 - frac) * v0 + frac * v1
    return jnp.moveaxis(out, -2, axis)


def _lerp_axis(x: jax.Array, pos: jax.Array, axis: int) -> jax.Array:
    """Sample ``x`` at fractional positions ``pos`` (one per output index)
    along ``axis`` — 1-D linear interpolation, out-of-range reads zero."""
    n = x.shape[axis]
    base = jnp.floor(pos)
    frac = (pos - base).astype(x.dtype)
    base = jnp.clip(base, -n - 1, n + 1).astype(jnp.int32)
    ndim = x.ndim
    axis_ = axis % ndim
    shape = [1] * ndim
    shape[axis_] = pos.shape[0]

    def _read(idx):
        oob = (idx < 0) | (idx >= n)
        v = jnp.take(x, jnp.clip(idx, 0, n - 1), axis=axis_)
        return jnp.where(oob.reshape(shape), 0, v)

    frac = frac.reshape(shape)
    return (1 - frac) * _read(base) + frac * _read(base + 1)


def hshift_planes_quirk(
    x: jax.Array, levels: jax.Array, *, axis: int = -2, row_axis: int = -3
) -> jax.Array:
    """FAL_netA maskR quirk sampler: align_corners=False ``grid_sample`` of
    an align_corners=True grid offset by ``x_of = 2*d/W``.

    The reference's variant-A maskR warp omits ``align_corners``
    (models/FAL_netA.py:264, defaulting to False) on a grid built with
    align_corners=True (FAL_netA.py:234).  grid_sample(align_corners=False)
    unnormalizes a grid value g to pixel ``((g+1)*S - 1)/2`` on a size-S
    axis; with ``g_x = 2x/(W-1) - 1 + 2d/W`` and ``g_y = 2y/(H-1) - 1`` the
    source position becomes

        p_x(x, n) = x * W/(W-1) + d_n - 0.5
        p_y(y)    = y * H/(H-1)       - 0.5

    — a stretch plus half-pixel offset on BOTH axes (the ac=False
    reinterpretation warps the untouched y coordinate too), instead of the
    uniform ``x + d*(W-1)/W`` every other warp uses.  The grid is
    axis-aligned so the 2-D bilinear factorizes into two 1-D lerps (rows,
    then per-plane columns), each zero-padded.  Verified exact vs
    ``F.grid_sample`` in tests/test_round2_fixes.py.  Opt-in for
    bit-parity evaluation of published FAL_netA checkpoints; every shipped
    B/C config and our default A path use :func:`hshift_planes`.
    """
    height = x.shape[row_axis]
    width = x.shape[axis]
    n = x.shape[-1]
    levels = jnp.asarray(levels, dtype=jnp.float32)

    # rows: same fractional positions for every plane/column
    rows = jnp.arange(height, dtype=jnp.float32)
    x = _lerp_axis(x, rows * (height / (height - 1)) - 0.5, row_axis)

    # columns: per-plane positions (W, N)
    cols = jnp.arange(width, dtype=jnp.float32)
    pos = cols[:, None] * (width / (width - 1)) + levels[None, :] - 0.5
    base = jnp.floor(pos)
    frac = (pos - base).astype(x.dtype)  # (W, N)
    base = jnp.clip(base, -width - 1, width + 1).astype(jnp.int32)

    x_moved = jnp.moveaxis(x, axis, -2)  # (..., W, N)
    bshape = (1,) * (x_moved.ndim - 2) + (width, n)

    def _read(idx):
        oob = (idx < 0) | (idx >= width)
        v = jnp.take_along_axis(
            x_moved, jnp.clip(idx, 0, width - 1).reshape(bshape), axis=-2
        )
        return jnp.where(oob.reshape(bshape), 0, v)

    out = (1 - frac.reshape(bshape)) * _read(base) + frac.reshape(bshape) * _read(
        base + 1
    )
    return jnp.moveaxis(out, -2, axis)


def hflip(x: jax.Array, *, axis: int = -2) -> jax.Array:
    """Horizontal mirror flip.

    Equivalent to the reference's flip-grid ``grid_sample`` trick
    (``Train_Stage2_K.py:248-253``, ``Test_KITTI.py:175-179``): under both
    align_corners conventions a normalized-coordinate negation lands exactly
    on pixel ``W-1-x``, so an exact reverse is bit-identical and avoids the
    resampling entirely.
    """
    return jnp.flip(x, axis=axis)
