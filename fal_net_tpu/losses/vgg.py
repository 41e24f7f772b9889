"""VGG19 perceptual feature extractor (flax, NHWC).

Mirrors the reference's ``Vgg19_pc`` (loss_functions.py:7-44): torchvision
VGG19 config-E features sliced after pool1 / pool2 / pool3 (+ optional
pool4 with ``full=True``), frozen.

Weights: the reference downloads ImageNet-pretrained torchvision weights at
import time (``models.vgg19(pretrained=True)``, loss_functions.py:10) — in a
zero-egress environment that is impossible for either implementation, so
this module accepts a local torch ``state_dict`` file via
:func:`load_torch_vgg19` and otherwise falls back to Kaiming random init
(:func:`init_vgg19`) with a warning; random VGG features still provide a
useful structured-similarity signal but do not match pretrained fidelity.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fal_net_tpu.models.layers import kaiming_normal

log = logging.getLogger(__name__)

# torchvision vgg19.features conv layer indices per stage (config E).
_STAGE_CONVS: Tuple[Tuple[int, ...], ...] = (
    (0, 2),  # conv1_1, conv1_2  -> pool1
    (5, 7),  # conv2_1, conv2_2  -> pool2
    (10, 12, 14, 16),  # conv3_1..conv3_4 -> pool3
    (19, 21, 23, 25),  # conv4_1..conv4_4 -> pool4
)
_STAGE_WIDTH = (64, 128, 256, 512)


class Vgg19Features(nn.Module):
    """Returns (pool1, pool2, pool3[, pool4]) feature maps."""

    full: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, ...]:
        outs = []
        num_stages = 4 if self.full else 3
        for stage in range(num_stages):
            for idx in _STAGE_CONVS[stage]:
                x = nn.Conv(
                    _STAGE_WIDTH[stage],
                    (3, 3),
                    padding=((1, 1), (1, 1)),
                    kernel_init=kaiming_normal,
                    dtype=self.dtype,
                    name=f"conv{idx}",
                )(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            outs.append(x)
        return tuple(outs)


def init_vgg19(full: bool = False, dtype=jnp.float32, seed: int = 0):
    """Random-init VGG19 features (documented pretrained-weights fallback)."""
    log.warning(
        "VGG19 perceptual net initialized with RANDOM weights; supply a "
        "torchvision vgg19 state_dict via load_torch_vgg19() for pretrained "
        "perceptual fidelity."
    )
    model = Vgg19Features(full=full, dtype=dtype)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)))
    return model, jax.lax.stop_gradient(params)


def convert_torch_vgg19(state_dict: Dict[str, Any], full: bool = False) -> Dict[str, Any]:
    """torchvision ``vgg19().features.state_dict()``-style numpy dict -> flax params."""
    params: Dict[str, Any] = {}
    num_stages = 4 if full else 3
    for stage in range(num_stages):
        for idx in _STAGE_CONVS[stage]:
            w = None
            for key in (f"features.{idx}.weight", f"{idx}.weight"):
                if key in state_dict:
                    w = np.asarray(state_dict[key])
                    b = np.asarray(state_dict[key.replace("weight", "bias")])
                    break
            if w is None:
                raise KeyError(f"missing vgg19 conv weight for features index {idx}")
            params[f"conv{idx}"] = {
                "kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
                "bias": b,
            }
    return {"params": params}


def load_torch_vgg19(path: str, full: bool = False, dtype=jnp.float32):
    """Load VGG19 weights from a torch checkpoint file (state_dict or full model)."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(data, "state_dict"):
        data = data.state_dict()
    sd = {k: v.numpy() for k, v in data.items() if hasattr(v, "numpy")}
    model = Vgg19Features(full=full, dtype=dtype)
    return model, convert_torch_vgg19(sd, full=full)
