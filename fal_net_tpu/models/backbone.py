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
from jax.sharding import NamedSharding, PartitionSpec

from fal_net_tpu.models.layers import (
    ConvElu,
    ConvOp,
    Deconv,
    ResidualBlock,
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
    #   and run conv1 as a split-sum (phase-domain x0_s part + raw full-res
    #   flow part) — exact up to fp reassociation, and never materializes
    #   s2d(image), s2d(flow) or the 33-channel lane-padded concat in HBM
    #   (the s2d(image) transpose copy was the bf16 b56+ OOM driver).
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
    def __call__(self, image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
        spec = self.spec
        rb = lambda name, domain="plain": ResidualBlock(
            separable=spec.separable_residual,
            dtype=self.dtype,
            domain=domain,
            name=name,
        )

        h, w = image.shape[-3], image.shape[-2]
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
            if self.stem_input_fuse:
                x = ConvElu(
                    spec.enc[0], stride=2, dtype=self.dtype, domain="s2d",
                    name="conv1",
                )((x0_s, flow.astype(x0.dtype)))
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
