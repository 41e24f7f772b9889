"""Edge-aware disparity smoothness loss.

Reference ``smoothness`` (loss_functions.py:70-109): de-normalize the image
(add back the channel means), grayscale via Rec.601, measure the disparity's
second derivative plus both first derivatives per axis, weighted by
exp(-gamma * |image second derivative|).

The reference builds five 3x3 conv kernels *per call* and runs five conv2d
launches; the stencils are tiny and axis-aligned, so here they are explicit
shift-and-subtract expressions on a zero-padded array — exactly what the
zero-padding conv computes, but fully fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

RGB_MEAN = (0.411, 0.432, 0.45)  # the normalization recipe's channel means
_REC601 = (0.299, 0.587, 0.114)


def _grayscale(img: jax.Array) -> jax.Array:
    """(B,H,W,3) de-normalized luminance, keeping a trailing 1-channel."""
    mean = jnp.asarray(RGB_MEAN, img.dtype)
    x = img + mean
    w = jnp.asarray(_REC601, img.dtype)
    return jnp.einsum("bhwc,c->bhw", x, w)[..., None]


def _pad_hw(x: jax.Array) -> jax.Array:
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))


def smoothness(img: jax.Array, disp: jax.Array, gamma: float = 1.0) -> jax.Array:
    """img: (B,H,W,3) normalized; disp: (B,H,W,1). Returns scalar."""
    h, w = img.shape[-3], img.shape[-2]
    gray = _pad_hw(_grayscale(img))
    d = _pad_hw(disp)

    c = lambda a: a[:, 1 : 1 + h, 1 : 1 + w, :]
    left = lambda a: a[:, 1 : 1 + h, 0:w, :]
    right = lambda a: a[:, 1 : 1 + h, 2 : 2 + w, :]
    up = lambda a: a[:, 0:h, 1 : 1 + w, :]
    down = lambda a: a[:, 2 : 2 + h, 1 : 1 + w, :]

    # image second derivatives ([-1, 2, -1] stencils, zero padded)
    dx_img = 2 * c(gray) - left(gray) - right(gray)
    dy_img = 2 * c(gray) - up(gray) - down(gray)

    # disparity first derivatives: both one-sided differences per axis
    dx_d = c(d) - right(d)  # [0, 1, -1]
    dx1_d = c(d) - left(d)  # [-1, 1, 0]
    dy_d = c(d) - down(d)
    dy1_d = c(d) - up(d)

    cds = jnp.mean(
        (jnp.abs(dx_d) + jnp.abs(dx1_d)) * jnp.exp(-gamma * jnp.abs(dx_img))
        + (jnp.abs(dy_d) + jnp.abs(dy1_d)) * jnp.exp(-gamma * jnp.abs(dy_img))
    )
    return cds
