"""MED (Mirrored Exponential Disparity) probability-volume ops.

Pure-function jnp reference implementations of the reference model head
(``models/FAL_netB.py:200-297``), fully vectorized over the N disparity
planes (the reference runs python loops of N ``grid_sample`` launches and
O(N^2) ``torch.cat`` copies — ``models/FAL_netB.py:222-282``).

Semantics reproduced exactly:
  * exponential plane disparities  d_n = max_disp * r**(c_n - 1),
    r = max/min, c_n = n/(N-1)                      (FAL_netB.py:224-225)
  * disparity = softmax-expectation over planes      (FAL_netB.py:219-226)
  * Dprob      = softmax over planes of the *shifted logits*, where the
    shift pads with zero LOGITS (not -inf): out-of-range columns still
    contribute exp(0)=1 to the softmax                (FAL_netB.py:236-248)
  * pan (synthesized right view) = sum_n shift(left, +s_n) * Dprob_n
                                                      (FAL_netB.py:280-282)
  * sub-occlusion masks maskR / maskL from stop-gradded volumes, clamped
    to <= 1                                          (FAL_netB.py:264-292)

A fused Pallas TPU kernel with identical semantics lives in
``fal_net_tpu.ops.med_pallas``; this module is the correctness oracle and
the default autodiff path.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from fal_net_tpu.ops.shift import hshift_planes, hshift_planes_quirk


class MedOutputs(NamedTuple):
    """Outputs of the MED head; unrequested fields are None.

    Field order mirrors the reference's positional output list
    ``[pan?][disp?][maskL, maskR?]`` (FAL_netB.py:284-297).
    """

    pan: Optional[jax.Array]  # (B, H, W, C) synthesized right view
    disp: Optional[jax.Array]  # (B, H, W, 1) disparity, pixels
    maskL: Optional[jax.Array]  # (B, H, W, 1) left-visible-in-right mask
    maskR: Optional[jax.Array]  # (B, H, W, 1) right-visible-in-left mask


def disparity_levels(min_disp, max_disp, num_levels: int) -> jax.Array:
    """Exponentially-spaced plane disparities, in pixels.

    ``d_n = max_disp * (max/min)**(c_n - 1)`` spans [min_disp, max_disp]
    geometrically (reference FAL_netB.py:224-225).  ``min_disp`` /
    ``max_disp`` may be python floats (static) or traced scalars; the
    result broadcasts accordingly with shape (..., N).
    """
    min_disp = jnp.asarray(min_disp, jnp.float32)
    max_disp = jnp.asarray(max_disp, jnp.float32)
    c = jnp.arange(num_levels, dtype=jnp.float32) / (num_levels - 1)
    return max_disp[..., None] * jnp.exp(
        jnp.log(max_disp / min_disp)[..., None] * (c - 1.0)
    )


def normalized_offsets(min_disp, max_disp, num_levels: int, width: int) -> jax.Array:
    """Per-plane normalized grid offsets ``x_of = 2*d_n/W`` (FAL_netB.py:204-205, 241)."""
    return 2.0 * disparity_levels(min_disp, max_disp, num_levels) / width


def pixel_shifts(
    min_disp, max_disp, num_levels: int, width: int, *, align_corners: bool = True
) -> jax.Array:
    """Per-plane shifts in *pixels* as applied by the reference's sampler.

    With align_corners=True (all model-internal warps, FAL_netB.py:234,245)
    a normalized offset 2d/W moves d*(W-1)/W pixels, not d.  This subtle
    factor must be preserved for fp32 parity with the reference.
    """
    d = disparity_levels(min_disp, max_disp, num_levels)
    if align_corners:
        return d * (width - 1) / width
    return d


def disparity_expectation(probs: jax.Array, levels: jax.Array) -> jax.Array:
    """Softmax-expectation disparity: ``sum_n levels[..., n] * probs[..., n]``.

    probs: (B, H, W, N) plane probabilities; levels: (N,) or (B, N).
    Returns (B, H, W, 1).  (Reference loop at FAL_netB.py:219-226.)
    """
    if levels.ndim == 1:
        return jnp.einsum("bhwn,n->bhw", probs, levels)[..., None]
    return jnp.einsum("bhwn,bn->bhw", probs, levels)[..., None]


def med_outputs(
    logits: jax.Array,
    image: jax.Array,
    min_disp,
    max_disp,
    *,
    ret_disp: bool = True,
    ret_pan: bool = False,
    ret_subocc: bool = False,
    maskr_quirk: bool = False,
) -> MedOutputs:
    """Compute the requested MED head outputs from plane logits.

    Args:
      logits: (B, H, W, N) — the post-1x1-conv logits (reference ``dlog0``).
      image: (B, H, W, C) — the network input view (for pan synthesis).
      min_disp / max_disp: scalars or (B,) per-sample disparity range in
        pixels.  Python floats make every shift a compile-time constant.
      ret_*: which outputs to materialize (all static).
      maskr_quirk: opt-in bit-parity with the reference FAL_netA's maskR,
        whose warp omits align_corners (models/FAL_netA.py:264) — see
        :func:`fal_net_tpu.ops.shift.hshift_planes_quirk`.
    """
    num_levels = logits.shape[-1]
    width = logits.shape[-2]
    min_disp = jnp.asarray(min_disp, jnp.float32)
    max_disp = jnp.asarray(max_disp, jnp.float32)
    if min_disp.ndim > 0:
        # Per-sample ranges: vmap the scalar implementation over batch.
        fn = lambda lg, im, mn, mx: med_outputs(
            lg[None],
            im[None],
            mn,
            mx,
            ret_disp=ret_disp,
            ret_pan=ret_pan,
            ret_subocc=ret_subocc,
            maskr_quirk=maskr_quirk,
        )
        out = jax.vmap(fn)(logits, image, min_disp, max_disp)
        squeeze = lambda a: None if a is None else a[:, 0]
        return MedOutputs(*(squeeze(a) for a in out))

    levels = disparity_levels(min_disp, max_disp, num_levels)  # (N,)
    shifts = levels * (width - 1) / width  # align_corners=True pixel shifts

    disp = None
    if ret_disp:
        sm = jax.nn.softmax(logits, axis=-1)
        disp = disparity_expectation(sm, jax.lax.stop_gradient(levels))

    pan = None
    maskL = None
    maskR = None
    if ret_pan or ret_subocc:
        # Shift-then-softmax probability volume ("Dprob"): zero-padded
        # logit shift, softmax across planes AFTER shifting.
        shifted_logits = hshift_planes(logits, shifts, axis=-2)
        dprob = jax.nn.softmax(shifted_logits, axis=-1)

        if ret_pan:
            # pan[x] = sum_n image[x + s_n] * Dprob[n, x]
            img_planes = jnp.broadcast_to(
                image[..., None], image.shape + (num_levels,)
            )
            shifted_img = hshift_planes(img_planes, shifts, axis=-3)  # (B,H,W,C,N)
            pan = jnp.einsum("bhwcn,bhwn->bhwc", shifted_img, dprob)

        if ret_subocc:
            sm0 = jax.nn.softmax(logits, axis=-1)
            if maskr_quirk:
                shifted_sm0 = hshift_planes_quirk(
                    jax.lax.stop_gradient(sm0), levels, axis=-2
                )
            else:
                shifted_sm0 = hshift_planes(
                    jax.lax.stop_gradient(sm0), shifts, axis=-2
                )
            maskR = jnp.sum(shifted_sm0, axis=-1)[..., None]
            maskL = jnp.sum(
                hshift_planes(jax.lax.stop_gradient(dprob), -shifts, axis=-2), axis=-1
            )[..., None]
            maskR = jnp.minimum(maskR, 1.0)
            maskL = jnp.minimum(maskL, 1.0)

    return MedOutputs(pan=pan, disp=disp, maskL=maskL, maskR=maskR)
