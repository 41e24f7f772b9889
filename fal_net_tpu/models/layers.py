"""Building-block layers shared by the FAL-net variants.

All convs are NHWC/HWIO (TPU-native layouts).  Weight init matches the
reference's ``nn.init.kaiming_normal_`` (fan-in, gain sqrt(2), full normal —
reference models/FAL_netB.py:131-138) with zero biases.

``domain='s2d'`` runs the SAME canonical convolution in the space-to-depth
phase domain (see :mod:`fal_net_tpu.ops.s2d`) — exact math, ~4x better MXU
utilization for the low-channel full-resolution stem.  Parameters keep
their canonical shapes either way, so checkpoints are domain-agnostic.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fal_net_tpu.ops.resize import resize_nearest_torch
from fal_net_tpu.ops.s2d import (
    conv_s2d_input,
    conv_s2d_s1,
    conv_s2d_s2,
    mask_pad_phases,
)

kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")

PadMask = Tuple[int, int]  # (pad_h, pad_w) in {0,1}


class ConstPlane(NamedTuple):
    """A full-resolution single-channel input plane that is CONSTANT per
    batch item (zero in any bottom/right even-padding rows) — the FAL-net
    "flow" conditioning plane (reference FAL_netB.py:208-209 broadcasts
    max_disp/100 over HxW).

    Convolving a constant plane is a closed form: the contribution to
    output (y, x) is ``value * sum(kernel taps whose input position is
    in-bounds and not padding)``.  Passing the plane to ConvOp's split-sum
    s2d branch as a ConstPlane replaces an entire stride-2 conv (9 taps x
    one full 128-lane register for the 1 real channel) with a tiny
    edge-weight einsum plus a fused broadcast add.
    """

    value: jax.Array  # scalar or (B,1,1,1): the per-item plane value
    pad: PadMask  # (pad_h, pad_w): 1 if the last full-res row/col is
    #               zero padding (odd sizes padded to even), else 0


def _const_plane_weights(h2: int, w2: int, h_valid: int, w_valid: int):
    """Tap-validity masks for a stride-2 3x3 SAME conv over a constant
    plane: output (y, x) reads input rows 2y-1+d, d in {0,1,2}; a tap is
    live iff its row/col is in [0, h_valid) / [0, w_valid)."""
    import numpy as np

    rows = 2 * np.arange(h2)[:, None] - 1 + np.arange(3)[None, :]
    cols = 2 * np.arange(w2)[:, None] - 1 + np.arange(3)[None, :]
    vh = ((rows >= 0) & (rows < h_valid)).astype(np.float32)
    vw = ((cols >= 0) & (cols < w_valid)).astype(np.float32)
    return vh, vw


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _conv_accum(x, kernel, stride, padding, out_dtype):
    """NHWC/HWIO conv that accumulates to ``out_dtype`` on the MXU
    (``preferred_element_type``) with a hand-written VJP.

    JAX's conv transpose rule can't differentiate a mixed-dtype conv (it
    builds a conv over the bf16 kernel and the fp32 cotangent and trips
    the same-dtype check), so the backward casts the cotangent down to
    the operand dtype and uses the standard same-dtype conv VJP — exactly
    the gradient of the old conv-then-convert formulation.
    """
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        stride,
        padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype,
    )


def _conv_accum_fwd(x, kernel, stride, padding, out_dtype):
    return _conv_accum(x, kernel, stride, padding, out_dtype), (x, kernel)


def _conv_accum_bwd(stride, padding, out_dtype, res, g):
    x, kernel = res

    def plain(x_, k_):
        return jax.lax.conv_general_dilated(
            x_, k_, stride, padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    _, vjp = jax.vjp(plain, x, kernel)
    dx, dk = vjp(g.astype(x.dtype))
    return dx, dk


_conv_accum.defvjp(_conv_accum_fwd, _conv_accum_bwd)


class ConvOp(nn.Module):
    """Conv with canonical (kh,kw,Ci,Co) params, computable in the plain or
    s2d domain.  Param paths match nn.Conv ('kernel'/'bias').

    ``out_dtype``: emit the conv output in this dtype straight from the MXU
    accumulator (``preferred_element_type``) instead of the compute dtype.
    Used at the bf16-backbone -> fp32-MED-head boundary: a separate
    bf16->fp32 convert of the (B,H,W,N) logits forces a tiling relayout and
    breaks softmax fusion (measured +17 ms at 384x1280 b8, see CLAUDE.md);
    accumulating to fp32 inside the conv is free.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: int = 1
    use_bias: bool = True
    domain: str = "plain"  # 'plain' | 's2d' | 's2d_input' | 'up2'
    dtype: jnp.dtype = jnp.float32
    out_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x) -> jax.Array:
        kh, kw = self.kernel_size
        if isinstance(x, (tuple, list)) and self.domain == "s2d":
            # Stem conv1 fuse: split-sum of one phase-domain part (x0_s)
            # plus extra FULL-RES parts — raw arrays, or ConstPlane for the
            # constant flow plane.  Equals the stride-2 conv over the
            # full-res concat (fp reassociation only), but never
            # materializes s2d(flow) or the lane-padded concat in HBM, and
            # a ConstPlane costs no conv at all: without the split, the
            # 132-channel concat pads to 2 input registers (measured: conv1
            # runs at exactly that 2-register time, runs/roofline.json);
            # with it, the x0_s part reads 1 exact register and the flow
            # term is a closed-form broadcast.
            assert self.stride == 2 and (kh, kw) == (3, 3)
            assert self.out_dtype is None, "out_dtype not plumbed for s2d"
            x_s2d, *extras = x
            c0 = x_s2d.shape[-1] // 4
            cin = c0 + sum(
                1 if isinstance(p, ConstPlane) else p.shape[-1] for p in extras
            )
            kernel = self.param(
                "kernel", kaiming_normal, (kh, kw, cin, self.features)
            ).astype(self.dtype)
            bias = (
                self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias
                else None
            )
            y = conv_s2d_s2(
                x_s2d.astype(self.dtype),
                jax.lax.slice_in_dim(kernel, 0, c0, axis=2),
            )
            h2, w2 = y.shape[-3], y.shape[-2]
            off = c0
            for p in extras:
                if isinstance(p, ConstPlane):
                    # conv(const plane) in closed form: per-position sum of
                    # the in-bounds, non-padding kernel taps, scaled by the
                    # plane value.  Tiny einsum + a broadcast add that XLA
                    # fuses into the conv epilogue.
                    ksl = jax.lax.slice_in_dim(kernel, off, off + 1, axis=2)
                    ksl = ksl[:, :, 0, :]  # (3, 3, Co)
                    vh, vw = _const_plane_weights(
                        h2, w2, 2 * h2 - p.pad[0], 2 * w2 - p.pad[1]
                    )
                    edge = jnp.einsum(
                        "yd,xe,deo->yxo",
                        jnp.asarray(vh, self.dtype),
                        jnp.asarray(vw, self.dtype),
                        ksl,
                    )
                    y = y + jnp.asarray(p.value, self.dtype) * edge
                    off += 1
                    continue
                c = p.shape[-1]
                # Raw full-res stride-2 SAME conv; low-side pad 1 matches
                # conv_s2d_s2's block-domain padding (windows at 2o-1..2o+1).
                y = y + jax.lax.conv_general_dilated(
                    p.astype(self.dtype),
                    jax.lax.slice_in_dim(kernel, off, off + c, axis=2),
                    (2, 2),
                    ((1, 0), (1, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                off += c
            if bias is not None:
                y = y + bias.astype(self.dtype)
            return y
        if isinstance(x, (tuple, list)):
            # Split-sum form of conv(concat(parts)): one conv per part over
            # the matching input-channel slice of the SAME canonical kernel,
            # summed.  Algebraically identical (fp reassociation only) to
            # concatenating first, but skips materializing the concat in
            # HBM.  Pays only when every part keeps >=128 real input lanes
            # (measured: scripts/probe_concat_conv.py).
            assert self.domain == "plain" and self.stride == 1
            assert self.out_dtype is None, "out_dtype not plumbed for split"
            parts = [p.astype(self.dtype) for p in x]
            cin = sum(p.shape[-1] for p in parts)
            kernel = self.param(
                "kernel", kaiming_normal, (kh, kw, cin, self.features)
            ).astype(self.dtype)
            bias = (
                self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias
                else None
            )
            padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
            y = None
            off = 0
            for p in parts:
                c = p.shape[-1]
                contrib = jax.lax.conv_general_dilated(
                    p,
                    jax.lax.slice_in_dim(kernel, off, off + c, axis=2),
                    (1, 1),
                    padding,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                y = contrib if y is None else y + contrib
                off += c
            if bias is not None:
                y = y + bias.astype(self.dtype)
            return y
        cin = x.shape[-1] // 4 if self.domain == "s2d" else x.shape[-1]
        kernel = self.param("kernel", kaiming_normal, (kh, kw, cin, self.features))
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        out_dtype = self.out_dtype or self.dtype
        bias = bias.astype(out_dtype) if bias is not None else None
        if self.domain == "up2":
            # conv3x3 over the nearest-2x upsample of x, phase-decomposed
            # into four 2x2 convs at source resolution — exact, 2.25x
            # fewer FLOPs, measured 1.4-1.9x at decoder shapes
            # (ops/phase_deconv.py).  Same canonical (3,3,Ci,Co) param.
            from fal_net_tpu.ops.phase_deconv import conv3x3_on_up2

            assert (kh, kw) == (3, 3) and self.stride == 1
            assert self.out_dtype is None, "out_dtype not plumbed for up2"
            y = conv3x3_on_up2(x, kernel)
            if bias is not None:
                y = y + bias
            return y
        if self.domain == "s2d":
            assert self.out_dtype is None, "out_dtype not plumbed for s2d"
            if self.stride == 1:
                return conv_s2d_s1(x, kernel, bias)
            assert self.stride == 2 and (kh, kw) == (3, 3)
            return conv_s2d_s2(x, kernel, bias)
        if self.domain == "s2d_input":
            # Raw full-res input, s2d-domain output: the stride-1 conv and
            # the space_to_depth of its output collapse into ONE stride-2
            # conv over a fused (kh+1,kw+1) kernel — no s2d transpose copy
            # of x is ever materialized (ops/s2d.py::conv_s2d_input).
            assert self.out_dtype is None, "out_dtype not plumbed for s2d"
            assert self.stride == 1
            return conv_s2d_input(x, kernel, bias)
        stride = (self.stride, self.stride)
        padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
        if jnp.dtype(out_dtype) != jnp.dtype(self.dtype):
            # mixed-dtype accumulation needs the custom VJP (see above)
            y = _conv_accum(x, kernel, stride, padding, out_dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kernel,
                stride,
                padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=out_dtype,
            )
        if bias is not None:
            y = y + bias
        return y


class ConvParams(nn.Module):
    """Declare a ConvOp-compatible parameter tree ('kernel' [+ 'bias'])
    WITHOUT applying the conv — for weights consumed by a composed/fused
    formulation elsewhere (e.g. iconv1 composed with logits_1x1, which
    are consecutive linear convs).  Named like the ConvOp it replaces, it
    yields a bit-identical param tree and init values, so checkpoints are
    interchangeable between the fused and unfused forms."""

    features: int
    kernel_size: Tuple[int, int]
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", kaiming_normal, (kh, kw, self.in_features, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class ConvElu(nn.Module):
    """3x3 conv (+bias when no norm) followed by ELU.

    Mirrors reference ``conv_elu`` (models/FAL_netB.py:35-48).  The shipped
    configs never enable batch-norm, so convs carry bias.
    """

    features: int
    stride: int = 1
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32
    domain: str = "plain"

    @nn.compact
    def __call__(self, x, pad_mask: PadMask = (0, 0)):
        x = ConvOp(
            self.features,
            (self.kernel, self.kernel),
            stride=self.stride,
            domain=self.domain,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.elu(x)
        if (
            self.domain in ("s2d", "s2d_input")
            and self.stride == 1
            and any(pad_mask)
        ):
            x = mask_pad_phases(x, *pad_mask)
        return x


class ResidualBlock(nn.Module):
    """Two convs + skip: ``elu(conv2(elu(conv1(x))) + x)``.

    ``separable=False``: two full 3x3 convs (FAL_netB.py:69-80, FAL_netC).
    ``separable=True``: a (k,1) then (1,k) pair (FAL_netA.py:69-80).
    Both conv weights are bias-free.
    """

    separable: bool = False
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32
    domain: str = "plain"

    @nn.compact
    def __call__(self, x, pad_mask: PadMask = (0, 0)):
        k = self.kernel
        features = x.shape[-1] // 4 if self.domain == "s2d" else x.shape[-1]
        if self.separable:
            shapes = [(k, 1), (1, k)]
        else:
            shapes = [(k, k)] * 2
        y = x
        for i, ks in enumerate(shapes):
            y = ConvOp(
                features,
                ks,
                use_bias=False,
                domain=self.domain,
                dtype=self.dtype,
                name=f"conv{i + 1}",
            )(y)
            if i == 0:
                y = nn.elu(y)
                if self.domain == "s2d" and any(pad_mask):
                    y = mask_pad_phases(y, *pad_mask)
        y = nn.elu(y + x)
        if self.domain == "s2d" and any(pad_mask):
            y = mask_pad_phases(y, *pad_mask)
        return y


class Deconv(nn.Module):
    """Nearest-neighbour upsample to a reference size + 3x3 conv + ELU.

    Mirrors reference ``deconv`` (FAL_netB.py:51-60): the upsample targets
    the *skip tensor's* exact spatial size (handles odd sizes), using
    torch 'nearest' index semantics.

    ``domain='s2d'``: the target is exactly 2x the input (even sizes), so
    the upsample's s2d is a phase tile of the input and the conv runs in
    the phase domain; returns the s2d-domain result.

    ``phase=True`` (default): when the target is exactly 2x the input,
    skip the materialized upsample entirely and run the phase-decomposed
    conv (ConvOp ``domain='up2'`` — exact, 2.25x fewer FLOPs, measured
    1.4-1.9x at the decoder shapes).  Non-2x targets (odd KITTI-raw
    sizes) fall back to the plain resize+conv path; parameters are
    identical either way.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    domain: str = "plain"
    phase: bool = True

    @nn.compact
    def __call__(self, x, skip_hw: Tuple[int, int]):
        h, w = x.shape[-3], x.shape[-2]
        if self.domain == "plain" and self.phase and skip_hw == (2 * h, 2 * w):
            x = ConvOp(
                self.features,
                (3, 3),
                use_bias=False,
                domain="up2",
                dtype=self.dtype,
                name="conv",
            )(x)
            return nn.elu(x)
        if self.domain == "s2d":
            assert skip_hw == (2 * h, 2 * w), (skip_hw, x.shape)
            # s2d(nearest 2x upsample): all four phases equal the input
            x = jnp.tile(x[..., None, :], (1, 1, 1, 4, 1)).reshape(
                x.shape[:-1] + (4 * x.shape[-1],)
            )
        else:
            x = resize_nearest_torch(x, skip_hw)
        x = ConvOp(
            self.features,
            (3, 3),
            use_bias=False,
            domain=self.domain,
            dtype=self.dtype,
            name="conv",
        )(x)
        return nn.elu(x)
