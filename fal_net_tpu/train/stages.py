"""Loss assemblies for the three training strategies.

The reference's three training scripts differ only in how the loss is
assembled around the same model (SURVEY §2.5); here each is a pure function
``(params, batch, ...) -> (loss, aux)`` suitable for ``jax.value_and_grad``
inside one jitted train step.

Aux contract: every aux leaf is a per-batch MEAN scalar.  The trainer's
gradient-accumulation path averages aux across microbatches (and mean of
per-microbatch means == full-batch mean); adding a non-mean aux (count,
max, image) would silently break that reduction.

  * stage1      — left-view-only view synthesis (Train_Stage1_K.py:210-262)
  * stage1_slow — double batch of (left, flipped right) through one forward,
                  losses on both views (Train_Stage1_Kslow.py:237-283)
  * stage2      — MOM distillation: frozen flipped-input teacher, occlusion
                  masks, mirror loss (Train_Stage2_K.py:246-331)
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from fal_net_tpu.losses.photometric import rec_loss
from fal_net_tpu.losses.smoothness import smoothness
from fal_net_tpu.ops.shift import hflip

VggFn = Optional[Callable[[jax.Array], Sequence[jax.Array]]]


def _disp_bounds(batch, min_disp, max_disp):
    """Per-sample disparity bounds.

    The reference feeds each sample's ``x_pix`` (+/- max_pix, sign-flipped
    on a random L/R swap when fix=False) into the model as the per-sample
    ``max_disp`` tensor, with ``min_disp`` scaled proportionally —
    Datasets/listdataset_train.py:74-81, Train_Stage1_K.py:227,237.  When
    the batch carries no 'max_disp' (the fix_order=True trainers strip it
    so the bounds stay compile-time floats and the fused Pallas MED head
    applies), fall back to the static config scalars.
    """
    mx = batch.get("max_disp")
    if mx is None:
        return min_disp, max_disp
    mx = jnp.asarray(mx, jnp.float32).reshape(-1)
    return mx * (min_disp / max_disp), mx


def _stacked(bounds):
    """Bounds for the [view | flipped other-view] double-batch forwards
    (torch.cat((max_disp, max_disp)) — Train_Stage1_Kslow.py:248)."""
    mn, mx = bounds
    if isinstance(mx, jax.Array) and mx.ndim > 0:
        return jnp.concatenate([mn, mn]), jnp.concatenate([mx, mx])
    return mn, mx


def stage1_loss(
    params,
    batch: Dict[str, jax.Array],
    model_apply,
    *,
    min_disp: float,
    max_disp: float,
    a_p: float,
    a_sm: float,
    vgg_fn: VggFn = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    left, right = batch["left"], batch["right"]
    w = left.shape[-2]
    mn, mx = _disp_bounds(batch, min_disp, max_disp)
    out = model_apply(params, left, mn, mx, ret_disp=True, ret_pan=True)
    rpan, ldisp = out.pan, out.disp

    vgg_right = vgg_fn(right) if (a_p > 0 and vgg_fn is not None) else None
    rec = rec_loss(1.0, rpan, right, vgg_right, a_p, vgg_fn)

    sm = 0.0
    if a_sm > 0:
        # ignore the left 20% dis-occluded columns (no parallax supervision)
        x0 = int(0.20 * w)
        sm = smoothness(left[:, :, x0:, :], ldisp[:, :, x0:, :], gamma=2.0)

    loss = rec + a_sm * sm
    return loss, {"rec_loss": rec, "sm_loss": sm, "loss": loss}


def stage1_slow_loss(
    params,
    batch: Dict[str, jax.Array],
    model_apply,
    *,
    min_disp: float,
    max_disp: float,
    a_p: float,
    a_sm: float,
    vgg_fn: VggFn = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    left, right = batch["left"], batch["right"]
    b, _, w, _ = left.shape
    mn, mx = _stacked(_disp_bounds(batch, min_disp, max_disp))
    stacked = jnp.concatenate([left, hflip(right, axis=-2)], axis=0)
    out = model_apply(params, stacked, mn, mx, ret_disp=True, ret_pan=True)
    rpan, lpan = out.pan[:b], out.pan[b:]
    ldisp, rdisp = out.disp[:b], out.disp[b:]
    # un-flip the right-view outputs
    lpan = hflip(lpan, axis=-2)
    rdisp = hflip(rdisp, axis=-2)

    if a_p > 0 and vgg_fn is not None:
        vgg_right, vgg_left = vgg_fn(right), vgg_fn(left)
    else:
        vgg_right = vgg_left = None
    rec = (
        rec_loss(1.0, rpan, right, vgg_right, a_p, vgg_fn)
        + rec_loss(1.0, lpan, left, vgg_left, a_p, vgg_fn)
    ) / 2.0

    sm = 0.0
    if a_sm > 0:
        x0 = int(0.20 * w)
        x1 = int(0.80 * w)
        sm = (
            smoothness(left[:, :, x0:, :], ldisp[:, :, x0:, :], gamma=2.0)
            + smoothness(right[:, :, :x1, :], rdisp[:, :, :x1, :], gamma=2.0)
        ) / 2.0

    loss = rec + a_sm * sm
    return loss, {"rec_loss": rec, "sm_loss": sm, "loss": loss}


def stage2_loss(
    params,
    batch: Dict[str, jax.Array],
    model_apply,
    teacher_apply,
    teacher_params,
    *,
    min_disp: float,
    max_disp: float,
    a_p: float,
    a_sm: float,
    a_mr: float,
    vgg_fn: VggFn = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    left, right = batch["left"], batch["right"]
    b, h, w, _ = left.shape
    x0, x1 = int(0.20 * w), int(0.80 * w)
    mn, mx = _stacked(_disp_bounds(batch, min_disp, max_disp))

    # Teacher (frozen): disparities for the mirrored pair.
    mldisp = mrdisp = None
    if a_mr > 0:
        t_in = jnp.concatenate([hflip(left, axis=-2), right], axis=0)
        t_out = teacher_apply(teacher_params, t_in, mn, mx, ret_disp=True)
        t_disp = jax.lax.stop_gradient(t_out.disp)
        mldisp = hflip(t_disp[:b], axis=-2)
        mrdisp = t_disp[b:]

    # Student: double batch with sub-occlusion masks.
    s_in = jnp.concatenate([left, hflip(right, axis=-2)], axis=0)
    out = model_apply(
        params, s_in, mn, mx, ret_disp=True, ret_pan=True, ret_subocc=True
    )
    rpan, lpan = out.pan[:b], hflip(out.pan[b:], axis=-2)
    ldisp, rdisp = out.disp[:b], hflip(out.disp[b:], axis=-2)
    lmask, rmask = out.maskL[:b], hflip(out.maskL[b:], axis=-2)
    rlmask, lrmask = out.maskR[:b], hflip(out.maskR[b:], axis=-2)

    # Occlusion masks with the dis-occluded borders forced visible
    # (Train_Stage2_K.py:296-299).
    if a_mr > 0:
        col = jnp.arange(w)
        force_l = (col < x0)[None, None, :, None]
        force_r = (col >= x1)[None, None, :, None]
        O_L = jnp.where(force_l, 1.0, lmask * lrmask)
        O_R = jnp.where(force_r, 1.0, rmask * rlmask)
    else:
        O_L = O_R = 1.0  # "just more training" (Train_Stage2_K.py:300-302)

    if a_p > 0 and vgg_fn is not None:
        vgg_right, vgg_left = vgg_fn(right), vgg_fn(left)
    else:
        vgg_right = vgg_left = None
    rec = (
        rec_loss(O_R, rpan, right, vgg_right, a_p, vgg_fn)
        + rec_loss(O_L, lpan, left, vgg_left, a_p, vgg_fn)
    ) / 2.0

    sm = 0.0
    if a_sm > 0:
        sm = (
            smoothness(left[:, :, x0:, :], ldisp[:, :, x0:, :], gamma=2.0)
            + smoothness(right[:, :, :x1, :], rdisp[:, :, :x1, :], gamma=2.0)
        ) / 2.0

    mirror = 0.0
    if a_mr > 0:
        # normalized by each image's max teacher disparity
        nmaxl = 1.0 / jnp.max(mldisp, axis=(1, 2, 3), keepdims=True)
        nmaxr = 1.0 / jnp.max(mrdisp, axis=(1, 2, 3), keepdims=True)
        mirror = (
            jnp.mean(
                nmaxl
                * (1.0 - O_L)[:, :, x0:, :]
                * jnp.abs(ldisp - mldisp)[:, :, x0:, :]
            )
            + jnp.mean(
                nmaxr
                * (1.0 - O_R)[:, :, :x1, :]
                * jnp.abs(rdisp - mrdisp)[:, :, :x1, :]
            )
        ) / 2.0

    loss = rec + a_sm * sm + a_mr * mirror
    return loss, {
        "rec_loss": rec,
        "sm_loss": sm,
        "mirror_loss": mirror,
        "loss": loss,
    }
