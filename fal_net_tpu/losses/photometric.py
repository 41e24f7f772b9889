"""Reconstruction (photometric + perceptual) loss.

Reference: ``rec_loss_fnc`` / ``perceptual_loss`` (loss_functions.py:52-67):

  rec = mean(mask * |synth - label|)
      + a_p * sum_{i<3} MSE(vgg_i(mask*synth + (1-mask)*label), vgg_i(label))

The composited image routes gradients only through the occlusion-visible
region; ``vgg_label`` features are precomputed once per step by the caller.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def perceptual_loss(
    out_features: Sequence[jax.Array],
    label_features: Sequence[jax.Array],
    layer: Optional[int] = None,
) -> jax.Array:
    if layer is not None:
        diff = out_features[layer] - label_features[layer]
        return jnp.mean(jnp.square(diff))
    total = 0.0
    for i in range(3):
        total = total + jnp.mean(jnp.square(out_features[i] - label_features[i]))
    return total


def rec_loss(
    mask,
    synth: jax.Array,
    label: jax.Array,
    vgg_label: Optional[Sequence[jax.Array]],
    a_p: float,
    vgg_apply: Optional[Callable[[jax.Array], Sequence[jax.Array]]] = None,
) -> jax.Array:
    """Masked L1 + optional perceptual term.

    ``mask`` may be a plain scalar 1 (stage-1 left-only training,
    Train_Stage1_K.py:246) or a (B,H,W,1) occlusion mask (stage 2).
    ``vgg_apply`` maps an image to its VGG feature tuple; required when
    ``a_p > 0`` and ``vgg_label`` is given.
    """
    loss = jnp.mean(mask * jnp.abs(synth - label))
    if a_p > 0 and vgg_label is not None:
        composited = mask * synth + (1 - mask) * label
        loss = loss + a_p * perceptual_loss(vgg_apply(composited), vgg_label)
    return loss
