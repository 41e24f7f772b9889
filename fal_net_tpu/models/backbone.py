"""U-Net style conv encoder-decoder backbone, parameterized over the
A/B/C variants of the reference (models/FAL_netA.py / FAL_netB.py /
FAL_netC.py) instead of three near-duplicate files.

Channel specs (verified against the reference by CPU instantiation):

  variant | encoder conv1..conv6            | deconv6..1              | iconv6..2
  --------+---------------------------------+-------------------------+---------------------
  A       | 64 128 128 256 256 256          | 128 128 128  64 64 64   | 256 256 128 128 64
  B       | 64 128 256 256 256 512          | 256 128 128 128 64 64   | 256 256 256 128 64
  C       | 64 128 256 256 512 512          | 256 256 128 128 64 64   | 512 256 256 128 64

conv0 is always 3->32 stride 1; a 1-channel "flow" conditioning plane is
concatenated before conv1 (FAL_netB.py:101,145); each encoder conv is
followed by a residual block (separable k x 1 / 1 x k pairs for variant A).
The final iconv1 is a bias-free 3x3 conv emitting ``num_out`` plane logits.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

from fal_net_tpu.models.layers import (
    ConstPlane,
    ConvElu,
    ConvOp,
    ConvParams,
    Deconv,
    ResidualBlock,
    _conv_accum,
    kaiming_normal,
)


@dataclasses.dataclass(frozen=True)
class VariantSpec:
    name: str
    enc: Tuple[int, ...]  # conv1..conv6 output channels
    deconv: Tuple[int, ...]  # deconv6..deconv1 output channels
    iconv: Tuple[int, ...]  # iconv6..iconv2 output channels
    separable_residual: bool
    default_levels: int
    has_amask: bool  # reference declares (but never calls) an amask head;
    #                  its params still count toward checkpoint parity
    torch_backbone_key: str  # attribute name in reference checkpoints
    torch_name: str  # reference factory name stored in checkpoints


VARIANTS = {
    "A": VariantSpec(
        name="A",
        enc=(64, 128, 128, 256, 256, 256),
        deconv=(128, 128, 128, 64, 64, 64),
        iconv=(256, 256, 128, 128, 64),
        separable_residual=True,
        default_levels=33,
        has_amask=False,
        torch_backbone_key="BackBone",
        torch_name="FAL_netA",
    ),
    "B": VariantSpec(
        name="B",
        enc=(64, 128, 256, 256, 256, 512),
        deconv=(256, 128, 128, 128, 64, 64),
        iconv=(256, 256, 256, 128, 64),
        separable_residual=False,
        default_levels=49,
        has_amask=True,
        torch_backbone_key="backbone",
        torch_name="FAL_netB",
    ),
    "C": VariantSpec(
        name="C",
        enc=(64, 128, 256, 256, 512, 512),
        deconv=(256, 256, 128, 128, 64, 64),
        iconv=(512, 256, 256, 128, 64),
        separable_residual=False,
        default_levels=33,
        has_amask=True,
        torch_backbone_key="synth",
        torch_name="FAL_netC",
    ),
    # Dev/test-only variant: same topology, minimal widths. Not in the
    # reference; used by smoke tests and examples to keep compiles fast.
    "tiny": VariantSpec(
        name="tiny",
        enc=(8, 8, 8, 8, 8, 8),
        deconv=(8, 8, 8, 8, 8, 8),
        iconv=(8, 8, 8, 8, 8),
        separable_residual=False,
        default_levels=5,
        has_amask=False,
        torch_backbone_key="backbone",
        torch_name="FAL_netTiny",
    ),
}


class FalNetBackbone(nn.Module):
    """Encoder-decoder emitting ``num_out`` disparity-plane logits (NHWC).

    ``s2d_stem=True`` (default) computes the full-resolution stem (conv0 +
    its residual block + the stride-2 conv1) in the space-to-depth phase
    domain — exact math, ~4x MXU utilization for the 3..33-channel
    full-res convs that otherwise dominate the backbone (see
    fal_net_tpu/ops/s2d.py).  Parameters are identical either way.
    """

    spec: VariantSpec
    num_out: int
    dtype: jnp.dtype = jnp.float32
    s2d_stem: bool = True
    stem_input_fuse: bool = False  # fuse space_to_depth INTO conv0 (one
    #   stride-2 4x4 conv over the raw image, ops/s2d.py::conv_s2d_input)
    #   — exact up to fp reassociation; never materializes s2d(image) in
    #   HBM.  Cycle model predicts 16/9 slower (16 taps vs 9 at equal
    #   register counts) but the measured conv0 is NOT at its register
    #   ceiling (12% — transpose-bound, runs/roofline.json), so on-chip
    #   measurement decides (scripts/probe_stem_fuse.py).
    stem_flow_analytic: bool = False  # conv1 as a split-sum: x0_s part in
    #   the phase domain (1 exact input register instead of the concat's
    #   padded 2) + the constant flow plane in closed form (ConstPlane —
    #   no conv at all).  Exact up to reassociation; cycle model predicts
    #   ~2x on conv1 (4.7 ms at exactly its 2-register time in
    #   runs/roofline.json).  REQUIRES a per-item-constant flow plane:
    #   only flow[:, :1, :1, :] is read.  FalNet always satisfies this
    #   (it broadcasts max_disp/100, falnet.py / FAL_netB.py:208-209);
    #   concrete (non-traced) inputs are verified at call time.
    s2d_tail: bool = False  # measured slower at batch 8 (4x redundant FLOPs
    #                         outweigh lane utilization once M is large)
    phase_deconv: bool = True  # exact phase-decomposed deconvs (2.25x fewer
    #                            FLOPs, 1.4-1.9x measured) at exact-2x
    #                            upsamples; see ops/phase_deconv.py
    split_fuse: bool = False  # decoder fuse convs as split-sum (one conv
    #   per concat part over the matching kernel slice, summed) when every
    #   part keeps >=128 real input lanes — skips materializing the concat
    #   in HBM; exact up to fp reassociation (probe_concat_conv.py)
    # Activation-sharding pins for 2-D ('data', 'spatial') meshes: without
    # them, GSPMD's fwd pass replicates low-res activations over 'spatial'
    # (H too small to split) while the bwd pass asks for an H-split of the
    # same saved tensor, and the partitioner falls back to "involuntary
    # full rematerialization" (replicate-then-partition) in the hot bwd
    # path — seen at rb6 on the 4x2 dryrun mesh (MULTICHIP_r03.json).
    # _constrain() pins every stage boundary to batch-over-data plus
    # rows-over-spatial *only when H divides evenly*, so fwd and bwd agree.
    mesh: Optional[jax.sharding.Mesh] = None
    data_axis: Optional[str] = None
    spatial_axis: Optional[str] = None

    def _constrain(
        self, x: jnp.ndarray, h_ref: Optional[int] = None
    ) -> jnp.ndarray:
        """``h_ref``: also require this height (e.g. a deconv's *input* H)
        to divide the spatial axis — a spatially-sharded deconv output whose
        input is too short to shard makes GSPMD demand a degenerate H-split
        of the input (the involuntary-remat fallback this fix removes)."""
        if self.mesh is None or self.data_axis is None:
            return x
        nsp = (
            self.mesh.shape.get(self.spatial_axis, 1) if self.spatial_axis else 1
        )
        h = x.shape[-3] if h_ref is None else min(x.shape[-3], h_ref)
        sp = self.spatial_axis if nsp > 1 and h % nsp == 0 else None
        nd = self.mesh.shape.get(self.data_axis, 1)
        da = self.data_axis if nd > 1 and x.shape[0] % nd == 0 else None
        if da is None and sp is None:
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, PartitionSpec(da, sp))
        )

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,
        flow: jnp.ndarray,
        compose_logits=None,
    ) -> jnp.ndarray:
        """``compose_logits``: optional ``(kernel_1x1, bias)`` of a linear
        1x1 conv to compose INTO iconv1 at trace time.  iconv1 and the
        reference's extra logits 1x1 (FAL_netB.py:190-192) are consecutive
        linear convs — no nonlinearity between them — so
        ``conv1x1(conv3x3(x, Ki), K1) == conv3x3(x, Ki @ K1)``; composing
        deletes the 1x1's full-resolution MXU pass (~1 register-pass per
        output tile) and its intermediate.  The composed conv accumulates
        to fp32 on the MXU (the MED head is always fp32)."""
        spec = self.spec
        rb = lambda name, domain="plain": ResidualBlock(
            separable=spec.separable_residual,
            dtype=self.dtype,
            domain=domain,
            name=name,
        )

        h, w = image.shape[-3], image.shape[-2]
        if self.stem_flow_analytic and not isinstance(flow, jax.core.Tracer):
            # The closed-form flow term reads only flow[:, :1, :1, :]; a
            # spatially varying plane would be silently wrong.  Traced
            # values can't be inspected, but any eager call (tests, direct
            # backbone use) is checked here.  FalNet itself always passes
            # a broadcast constant (max_disp/100).
            fv = np.asarray(flow)
            if not (fv == fv[:, :1, :1, :]).all():
                raise ValueError(
                    "stem_flow_analytic requires a per-item-constant flow "
                    "plane (only flow[:, :1, :1, :] is read)"
                )
        if self.s2d_stem:
            from fal_net_tpu.ops.s2d import (
                concat_s2d,
                depth_to_space,
                space_to_depth,
            )

            pad_h, pad_w = h % 2, w % 2
            mask = (pad_h, pad_w)
            if pad_h or pad_w:
                image = jnp.pad(image, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
                flow = jnp.pad(flow, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            if self.stem_input_fuse:
                x0_s = ConvElu(
                    32, dtype=self.dtype, domain="s2d_input", name="conv0"
                )(image, mask)
            else:
                img_s = space_to_depth(image)
                x0_s = ConvElu(32, dtype=self.dtype, domain="s2d", name="conv0")(
                    img_s, mask
                )
            x0_s = rb("rb0", "s2d")(x0_s, mask)
            x0 = depth_to_space(x0_s)[:, :h, :w, :]
            if self.stem_flow_analytic:
                # The flow plane is constant per item (FAL_netB.py:208-209
                # broadcasts max_disp/100); its conv contribution has a
                # closed form.  Top-left value is the constant (padding,
                # if any, is bottom/right).
                x = ConvElu(
                    spec.enc[0], stride=2, dtype=self.dtype, domain="s2d",
                    name="conv1",
                )((x0_s, ConstPlane(flow[:, :1, :1, :], mask)))
            else:
                cat_s = concat_s2d([x0_s, space_to_depth(flow.astype(x0.dtype))])
                x = ConvElu(
                    spec.enc[0], stride=2, dtype=self.dtype, domain="s2d",
                    name="conv1",
                )(cat_s)
        else:
            x0 = rb("rb0")(ConvElu(32, dtype=self.dtype, name="conv0")(image))
            x = ConvElu(spec.enc[0], stride=2, dtype=self.dtype, name="conv1")(
                jnp.concatenate([x0, flow.astype(x0.dtype)], axis=-1)
            )

        # Encoder: 6 stride-2 stages, each followed by a residual block.
        x = self._constrain(rb("rb1")(x))
        skips = [self._constrain(x0), x]
        for i, ch in enumerate(spec.enc[1:], start=2):
            x = ConvElu(ch, stride=2, dtype=self.dtype, name=f"conv{i}")(x)
            x = self._constrain(rb(f"rb{i}")(x))
            skips.append(x)
        # skips = [x0, x1, ..., x6]; bottleneck is skips[6] at 1/64 res.

        # Decoder: upsample-to-skip + concat(deconv_out, skip) + fuse.
        y = skips[6]
        for j in range(6, 1, -1):  # deconv6..deconv2 fuse with skips 5..1
            skip = skips[j - 1]
            d = Deconv(
                spec.deconv[6 - j], dtype=self.dtype,
                phase=self.phase_deconv, name=f"deconv{j}",
            )(y, (skip.shape[-3], skip.shape[-2]))
            d = self._constrain(d, h_ref=y.shape[-3])
            fuse = ConvElu(spec.iconv[6 - j], dtype=self.dtype, name=f"iconv{j}")
            if self.split_fuse and d.shape[-1] >= 128 and skip.shape[-1] >= 128:
                y = self._constrain(fuse((d, skip)))
            else:
                y = self._constrain(fuse(jnp.concatenate([d, skip], axis=-1)))

        # Decoder tail: deconv1 (to full res) + iconv1 are the two largest
        # low-channel full-resolution convs in the net — run them in the
        # phase domain too when sizes are even (the training and headline
        # inference shapes are; odd KITTI-raw heights fall back).
        from fal_net_tpu.ops.s2d import concat_s2d as _concat_s2d
        from fal_net_tpu.ops.s2d import depth_to_space as _d2s

        use_s2d_tail = (
            self.s2d_tail
            and self.s2d_stem
            and h % 2 == 0
            and w % 2 == 0
            and y.shape[-3] * 2 == h
            and y.shape[-2] * 2 == w
        )
        if use_s2d_tail:
            assert compose_logits is None, "fuse_logits requires s2d_tail=False"
            d1_s = Deconv(
                spec.deconv[5], dtype=self.dtype, domain="s2d", name="deconv1"
            )(y, (h, w))
            cat_s = _concat_s2d([d1_s, x0_s])
            logits = _d2s(
                ConvOp(
                    self.num_out,
                    (3, 3),
                    use_bias=False,
                    domain="s2d",
                    dtype=self.dtype,
                    name="iconv1",
                )(cat_s)
            )
        else:
            d1 = Deconv(
                spec.deconv[5], dtype=self.dtype,
                phase=self.phase_deconv, name="deconv1",
            )(y, (x0.shape[-3], x0.shape[-2]))
            concat1 = jnp.concatenate([d1, x0], axis=-1)
            if compose_logits is not None:
                k1, b1 = compose_logits
                ki, _ = ConvParams(
                    self.num_out, (3, 3), concat1.shape[-1],
                    use_bias=False, name="iconv1",
                )()
                # Compose in fp32 (the params' storage dtype) so the
                # composed kernel rounds to self.dtype exactly once.
                kc = jnp.einsum("abim,mo->abio", ki, k1[0, 0])
                logits = _conv_accum(
                    concat1.astype(self.dtype),
                    kc.astype(self.dtype),
                    (1, 1),
                    ((1, 1), (1, 1)),
                    jnp.float32,
                ) + b1.astype(jnp.float32)
            else:
                logits = ConvOp(
                    self.num_out,
                    (3, 3),
                    use_bias=False,
                    dtype=self.dtype,
                    name="iconv1",
                )(concat1)

        if spec.has_amask:
            # The reference constructs an occlusion-mask head that forward()
            # never invokes (FAL_netB.py:128, predict_amask:83-89).  Its
            # parameters still live in every shipped checkpoint, so declare
            # them for state-dict and parameter-count parity without paying
            # any compute.
            cin = spec.deconv[5] + 32
            self.param("amask_conv1_kernel", kaiming_normal, (3, 3, cin, cin // 2))
            self.param("amask_conv1_bias", nn.initializers.zeros, (cin // 2,))
            self.param("amask_conv2_kernel", kaiming_normal, (3, 3, cin // 2, 1))

        return logits
