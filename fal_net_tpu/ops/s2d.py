"""Space-to-depth stem transform: exact low-channel-conv acceleration.

TPU convs with < 128 channels waste MXU lanes: measured on v5e, a 3x3
32->32 conv at 384x1280 runs at ~3.6 TFLOPs while 128->128 runs at ~37.
The FAL-net stem (conv0 3->32 + a 32-channel residual block at FULL
resolution, models/FAL_netB.py:99-100,144) dominates the backbone for that
reason.

A stride-1 conv is *exactly* representable in the space-to-depth domain:
with 2x2 phase blocks, output phase (py,px) at block (i,j) reads input
phases (qy,qx) at blocks (i+di, j+dj) where

    qy = (py + dy) mod 2,   di = (py + dy) // 2

so the transformed computation is a conv over (H/2, W/2, 4*C) with a
sparse kernel built from the canonical weights.  4x the nominal FLOPs, but
>4x the MXU utilization — and each output value is the same sum reordered
(fp32-exact up to reassociation).  A stride-2 3x3 conv similarly becomes a
2x2 conv over phase blocks (di, dj in {-1, 0}).

Odd sizes: pad the full-res input to even H/W *before* space_to_depth and
re-zero the pad phases after each nonlinearity (:func:`mask_pad_phases`) —
ELU(bias) is nonzero, so a pad row that flows through one conv stage would
otherwise contaminate the next stage's zero-padding semantics.

The canonical parameters keep their reference shapes — the transform runs
at trace time — so checkpoint import and parameter-count parity are
untouched.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); phase order (py, px) major over C."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # (B, H/2, W/2, py, px, C)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """(B, H/2, W/2, 4C) -> (B, H, W, C); inverse of :func:`space_to_depth`."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h2 * 2, w2 * 2, c)


def concat_s2d(parts) -> jax.Array:
    """Channel-concat in the s2d domain matching s2d(concat(full-res parts)):
    interleave per phase, not per tensor."""
    reshaped = [p.reshape(p.shape[:-1] + (4, p.shape[-1] // 4)) for p in parts]
    cat = jnp.concatenate(reshaped, axis=-1)
    return cat.reshape(cat.shape[:-2] + (cat.shape[-2] * cat.shape[-1],))


def mask_pad_phases(x: jax.Array, pad_h: int, pad_w: int) -> jax.Array:
    """Zero the phases of an s2d tensor that correspond to full-res pad
    rows/cols (pad_h/pad_w in {0,1})."""
    c = x.shape[-1] // 4
    if pad_h:
        # phases (1, *) of the last block row: channels [2c:4c]
        x = x.at[:, -1, :, 2 * c :].set(0.0)
    if pad_w:
        # phases (*, 1) of the last block col: channels [c:2c] and [3c:4c]
        x = x.at[:, :, -1, c : 2 * c].set(0.0)
        x = x.at[:, :, -1, 3 * c :].set(0.0)
    return x


def _tap_range(k: int):
    """Tap offsets for SAME padding of an odd kernel size (1 or 3)."""
    assert k in (1, 3), k
    return range(-(k // 2), k // 2 + 1)


def s2d_kernel_s1(kernel: jax.Array) -> jax.Array:
    """Canonical stride-1 HWIO kernel (kh,kw,Ci,Co), kh/kw in {1,3} ->
    s2d-domain kernel (kh', kw', 4Ci, 4Co) with kh' = kh if kh==3 else 1."""
    kh, kw, ci, co = kernel.shape
    kh2 = 3 if kh == 3 else 1
    kw2 = 3 if kw == 3 else 1
    out = jnp.zeros((kh2, kw2, 4 * ci, 4 * co), kernel.dtype)
    oy, ox = kh2 // 2, kw2 // 2
    for py in range(2):
        for px in range(2):
            for dy in _tap_range(kh):
                for dx in _tap_range(kw):
                    qy, di = (py + dy) % 2, (py + dy) // 2
                    qx, dj = (px + dx) % 2, (px + dx) // 2
                    out = out.at[
                        di + oy,
                        dj + ox,
                        (2 * qy + qx) * ci : (2 * qy + qx + 1) * ci,
                        (2 * py + px) * co : (2 * py + px + 1) * co,
                    ].set(kernel[dy + kh // 2, dx + kw // 2])
    return out


def s2d_kernel_input(kernel: jax.Array) -> jax.Array:
    """Canonical stride-1 HWIO kernel (kh,kw,Ci,Co), kh/kw in {1,3} ->
    fused input-space kernel (kh+1, kw+1, Ci, 4Co).

    ``s2d(conv_s1(x)) == conv(x, s2d_kernel_input(K), stride 2, pad kh//2)``
    — the output phase (py,px) of block (i,j) is the full-res conv output at
    (2i+py, 2j+px), whose 3x3 window lies inside the 4x4 stride-2 window
    rows 2i-1..2i+2.  This consumes the raw (B,H,W,Ci) input directly: no
    space_to_depth transpose copy is ever materialized (the copy pads Ci=3
    -> 4Ci=12 lanes in HBM and was the b56+ bf16 OOM driver), and the tap
    count drops from 9 x 4Ci to 16 x Ci (2.25x fewer MACs for conv0).
    """
    kh, kw, ci, co = kernel.shape
    assert kh in (1, 3) and kw in (1, 3), (kh, kw)
    out = jnp.zeros((kh + 1, kw + 1, ci, 4 * co), kernel.dtype)
    for py in range(2):
        for px in range(2):
            for dy in _tap_range(kh):
                for dx in _tap_range(kw):
                    out = out.at[
                        py + dy + kh // 2,
                        px + dx + kw // 2,
                        :,
                        (2 * py + px) * co : (2 * py + px + 1) * co,
                    ].set(kernel[dy + kh // 2, dx + kw // 2])
    return out


def conv_s2d_input(
    x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array] = None
) -> jax.Array:
    """Canonical stride-1 conv fused with space_to_depth of its output,
    reading the RAW full-res input (no s2d transpose of x).

    x: (B, H, W, Ci) with H, W even; kernel canonical (kh,kw,Ci,Co);
    returns (B, H/2, W/2, 4Co) == space_to_depth(conv_s1(x, kernel)).
    """
    kh, kw = kernel.shape[:2]
    k = s2d_kernel_input(kernel)
    p = (kh // 2, kw // 2)
    y = jax.lax.conv_general_dilated(
        x, k, (2, 2), ((p[0], p[0]), (p[1], p[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + jnp.tile(bias, 4)
    return y


def s2d_kernel_s2(kernel: jax.Array) -> jax.Array:
    """Canonical stride-2 3x3 HWIO kernel -> 2x2 phase-block kernel
    (2,2,4Ci,Co); apply with stride 1 and low-side padding 1."""
    kh, kw, ci, co = kernel.shape
    assert kh == 3 and kw == 3
    out = jnp.zeros((2, 2, 4 * ci, co), kernel.dtype)
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            qy, di = dy % 2, (dy - dy % 2) // 2
            qx, dj = dx % 2, (dx - dx % 2) // 2
            out = out.at[
                di + 1,
                dj + 1,
                (2 * qy + qx) * ci : (2 * qy + qx + 1) * ci,
                :,
            ].set(kernel[dy + 1, dx + 1])
    return out


def conv_s2d_s1(x_s2d: jax.Array, kernel: jax.Array, bias: Optional[jax.Array] = None) -> jax.Array:
    """Canonical stride-1 conv applied in the s2d domain.

    x_s2d: (B, H/2, W/2, 4Ci); kernel canonical (kh,kw,Ci,Co);
    returns (B, H/2, W/2, 4Co) = s2d of the full-res conv output.
    """
    k = s2d_kernel_s1(kernel)
    ph = (k.shape[0] - 1) // 2
    pw = (k.shape[1] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x_s2d, k, (1, 1), ((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + jnp.tile(bias, 4)
    return y


def conv_s2d_s2(x_s2d: jax.Array, kernel: jax.Array, bias: Optional[jax.Array] = None) -> jax.Array:
    """Canonical stride-2 3x3 conv (SAME (1,1)) applied in the s2d domain.

    x_s2d: (B, H/2, W/2, 4Ci); returns (B, H/2, W/2, Co) at the conv's
    native half resolution.
    """
    k = s2d_kernel_s2(kernel)
    y = jax.lax.conv_general_dilated(
        x_s2d, k, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias
    return y
