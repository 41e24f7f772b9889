"""Building-block layers shared by the FAL-net variants.

All convs are NHWC/HWIO (TPU-native layouts).  Weight init matches the
reference's ``nn.init.kaiming_normal_`` (fan-in, gain sqrt(2), full normal —
reference models/FAL_netB.py:131-138) with zero biases.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from fal_net_tpu.ops.resize import resize_nearest_torch

kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class ConvElu(nn.Module):
    """3x3 conv (+bias when no norm) followed by ELU.

    Mirrors reference ``conv_elu`` (models/FAL_netB.py:35-48).  The shipped
    configs never enable batch-norm, so convs carry bias.
    """

    features: int
    stride: int = 1
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=True,
            kernel_init=kaiming_normal,
            dtype=self.dtype,
            name="conv",
        )(x)
        return nn.elu(x)


class ResidualBlock(nn.Module):
    """Two convs + skip: ``elu(conv2(elu(conv1(x))) + x)``.

    ``separable=False``: two full 3x3 convs (FAL_netB.py:69-80, FAL_netC).
    ``separable=True``: a (k,1) then (1,k) pair (FAL_netA.py:69-80).
    Both conv weights are bias-free.
    """

    separable: bool = False
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        k, p = self.kernel, (self.kernel - 1) // 2
        if self.separable:
            shapes = [((k, 1), ((p, p), (0, 0))), ((1, k), ((0, 0), (p, p)))]
        else:
            shapes = [((k, k), ((p, p), (p, p)))] * 2
        y = x
        for i, (ks, pad) in enumerate(shapes):
            y = nn.Conv(
                features,
                ks,
                padding=pad,
                use_bias=False,
                kernel_init=kaiming_normal,
                dtype=self.dtype,
                name=f"conv{i + 1}",
            )(y)
            if i == 0:
                y = nn.elu(y)
        return nn.elu(y + x)


class Deconv(nn.Module):
    """Nearest-neighbour upsample to a reference size + 3x3 conv + ELU.

    Mirrors reference ``deconv`` (FAL_netB.py:51-60): the upsample targets
    the *skip tensor's* exact spatial size (handles odd sizes), using
    torch 'nearest' index semantics.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip_hw: tuple[int, int]):
        x = resize_nearest_torch(x, skip_hw)
        x = nn.Conv(
            self.features,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            kernel_init=kaiming_normal,
            dtype=self.dtype,
            name="conv",
        )(x)
        return nn.elu(x)
