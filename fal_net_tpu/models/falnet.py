"""FAL-net: backbone + MED probability-volume head.

Functional port of the reference head (models/FAL_netB.py:179-297):
  * "flow" conditioning plane = max_disp/100 broadcast over HxW
    (FAL_netB.py:208-209) tells the net the disparity scale.
  * an extra 1x1 conv on the logits ("not shown in paper",
    FAL_netB.py:190-192).
  * MED volume outputs via :func:`fal_net_tpu.ops.med.med_outputs`.

Deliberate divergence from FAL_netA: the reference's variant-A maskR
``grid_sample`` omits ``align_corners`` (models/FAL_netA.py:264, defaulting
to False) while every other warp — including maskL two lines below — uses
True on the very same align_corners=True grid.  That mismatch resamples
maskR through a spurious W/(W-1) stretch plus a half-pixel offset (an
effective sub-pixel mis-shift that varies across columns); we treat it as
a reference bug and use align_corners=True shifts uniformly for all
variants.  The divergence is quantified in
tests/test_round2_fixes.py::test_falneta_maskr_align_corners_quirk: on
white-noise probability volumes the mis-shift changes maskR by up to ~0.67
(half-pixel resampling of high-frequency planes); on smooth real masks the
effect is proportionally smaller but nonzero.  For evaluating *published
A checkpoints* bit-for-bit, the opt-in ``a_maskr_quirk=True`` flag
reproduces the reference resample exactly
(ops/shift.py::hshift_planes_quirk, parity-tested vs a torch
transcription of the FAL_netA warp in tests/test_round2_fixes.py).
"""

from __future__ import annotations

from typing import Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from fal_net_tpu.models.backbone import FalNetBackbone, VariantSpec, VARIANTS
from fal_net_tpu.models.layers import ConvOp, ConvParams
from fal_net_tpu.ops.med import MedOutputs, med_outputs


def _fused_med_available() -> bool:
    """The fused Pallas head needs a Mosaic-compiling TPU backend —
    allowlist ('tpu' plus this container's remote-TPU 'axon' backend)
    rather than assume every non-cpu/gpu platform can compile it."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


class FalNet(nn.Module):
    spec: VariantSpec
    num_levels: int
    dtype: jnp.dtype = jnp.float32
    # 'auto': fused Pallas MED head on TPU, jnp reference path elsewhere.
    med_impl: str = "auto"  # 'auto' | 'fused' | 'reference'
    s2d_stem: bool = True  # phase-domain full-res stem (+17%, ops/s2d.py)
    stem_input_fuse: bool = True  # fuse s2d INTO conv0 — skips the
    #   s2d(image) HBM copy; see FalNetBackbone.stem_input_fuse.  Alone it
    #   measured 0.98x, but combined with stem_flow_analytic the stem
    #   materializes NO s2d/concat copies at all and the pair + fuse_logits
    #   is 1.14x fp32 b8 / 1.19x bf16 b48 (probe_stem_fuse.py, round 5,
    #   DESIGN.md §Stem/logits fusion) — defaults ON.
    stem_flow_analytic: bool = True  # split-sum conv1 with the constant
    #   flow plane in closed form; see FalNetBackbone.stem_flow_analytic.
    #   Measured 1.10x alone on-chip (round 5) — default ON.
    fuse_logits: bool = True  # compose the linear iconv1 and logits_1x1
    #   convs into ONE 3x3 conv at trace time (exact; identical param
    #   tree) — deletes the 1x1's full-res MXU pass.  Requires
    #   s2d_tail=False.  Measured 1.02x alone on-chip (round 5) — default
    #   ON.
    s2d_tail: bool = False  # measured slower at batch 8; kept selectable
    phase_deconv: bool = True  # exact phase-decomposed decoder deconvs
    #                            (1.4-1.9x measured, ops/phase_deconv.py)
    split_fuse: bool = False  # decoder fuse convs in split-sum form where
    #                           every concat part keeps >=128 input lanes
    #                           (see FalNetBackbone.split_fuse)
    # Batch-data-parallel fused head: with a mesh whose med_axis size > 1,
    # the fused MED kernel runs per-device via shard_map (pallas_call has
    # no SPMD rule; without this, sharded runs lose the 1.85x fused head).
    # med_spatial_axis: also shard image rows over that mesh axis (all MED
    # math is row-local, so the H-split is exact — parallel/spatial.py).
    med_mesh: Optional[jax.sharding.Mesh] = None
    med_axis: str = "data"
    med_spatial_axis: Optional[str] = None
    med_interpret: bool = False  # interpret-mode kernel (CPU tests/dryrun)
    a_maskr_quirk: bool = False  # opt-in: reproduce the reference
    #   FAL_netA's align_corners-less maskR warp bit-for-bit (see module
    #   docstring); forces the jnp MED path

    @nn.compact
    def __call__(
        self,
        left: jax.Array,
        min_disp: Union[float, jax.Array],
        max_disp: Union[float, jax.Array],
        *,
        ret_disp: bool = True,
        ret_pan: bool = False,
        ret_subocc: bool = False,
    ) -> MedOutputs:
        b, h, w, _ = left.shape
        max_arr = jnp.asarray(max_disp, jnp.float32)
        flow = jnp.broadcast_to(
            (max_arr / 100.0).reshape((-1,) + (1,) * 3).astype(left.dtype),
            (b, h, w, 1),
        )
        backbone = FalNetBackbone(
            self.spec,
            num_out=self.num_levels,
            dtype=self.dtype,
            s2d_stem=self.s2d_stem,
            stem_input_fuse=self.stem_input_fuse,
            stem_flow_analytic=self.stem_flow_analytic,
            s2d_tail=self.s2d_tail,
            phase_deconv=self.phase_deconv,
            split_fuse=self.split_fuse,
            # Pin per-stage activation shardings on multi-device meshes so
            # GSPMD's fwd and bwd passes agree at low-res stages (avoids the
            # "involuntary full rematerialization" bwd fallback at rb6 on
            # ('data', 'spatial') meshes — see FalNetBackbone._constrain).
            mesh=self.med_mesh,
            data_axis=self.med_axis if self.med_mesh is not None else None,
            spatial_axis=self.med_spatial_axis,
            name="backbone",
        )
        if self.fuse_logits:
            # iconv1 and the extra 1x1 (FAL_netB.py:190-192) are consecutive
            # LINEAR convs: compose them into one 3x3 conv at trace time
            # (see FalNetBackbone.__call__).  Param tree is identical —
            # ConvParams declares 'logits_1x1/{kernel,bias}' exactly as the
            # unfused ConvOp would — so checkpoints are interchangeable.
            assert not self.s2d_tail, "fuse_logits requires s2d_tail=False"
            k1, b1 = ConvParams(
                self.num_levels, (1, 1), self.num_levels,
                use_bias=True, name="logits_1x1",
            )()
            logits = backbone(left, flow, compose_logits=(k1, b1))
        else:
            dlog = backbone(left, flow)
            # The logits conv reads the backbone dtype but emits fp32
            # straight from the MXU accumulator: the MED head below is
            # always fp32, and a separate bf16->fp32 convert of this
            # (B,H,W,N) tensor would cost a tiling relayout + lost softmax
            # fusion (measured: the entire bf16-inference slowdown,
            # 63.8 -> 47 ms at 384x1280 b8).
            logits = ConvOp(
                self.num_levels,
                (1, 1),
                use_bias=True,
                dtype=self.dtype,
                out_dtype=jnp.float32,
                name="logits_1x1",
            )(dlog)
        # The MED head runs in fp32 regardless of backbone compute dtype:
        # softmax over 49 planes and the disparity expectation are cheap and
        # precision-sensitive.
        # Fused kernel only pays off when the shifted volume is needed
        # (pan/masks); disp-only is a softmax+expectation XLA fuses fine,
        # and skipping the kernel avoids the NHWC<->NCHW relayouts.
        use_fused = not self.a_maskr_quirk and (
            self.med_impl == "fused"
            or (
                self.med_impl == "auto"
                and (ret_pan or ret_subocc)
                and (_fused_med_available() or self.med_interpret)
                and isinstance(min_disp, (int, float))
                and isinstance(max_disp, (int, float))
            )
        )
        if use_fused:
            from fal_net_tpu.ops.med_pallas import (
                med_outputs_fused,
                med_outputs_fused_dp,
            )

            kw = dict(
                ret_disp=ret_disp,
                ret_pan=ret_pan,
                ret_subocc=ret_subocc,
                interpret=self.med_interpret,
            )
            sharded = self.med_mesh is not None and (
                self.med_mesh.shape.get(self.med_axis, 1) > 1
                or (
                    self.med_spatial_axis is not None
                    and self.med_mesh.shape.get(self.med_spatial_axis, 1) > 1
                )
            )
            if sharded:
                return med_outputs_fused_dp(
                    logits.astype(jnp.float32),
                    left.astype(jnp.float32),
                    min_disp,
                    max_disp,
                    mesh=self.med_mesh,
                    axis_name=self.med_axis,
                    spatial_axis=self.med_spatial_axis,
                    **kw,
                )
            return med_outputs_fused(
                logits.astype(jnp.float32),
                left.astype(jnp.float32),
                min_disp,
                max_disp,
                **kw,
            )
        return med_outputs(
            logits.astype(jnp.float32),
            left.astype(jnp.float32),
            min_disp,
            max_disp,
            ret_disp=ret_disp,
            ret_pan=ret_pan,
            ret_subocc=ret_subocc,
            maskr_quirk=self.a_maskr_quirk,
        )


def create_model(
    variant: str = "B",
    num_levels: int | None = None,
    dtype: jnp.dtype = jnp.float32,
    med_impl: str = "auto",
    s2d_stem: bool = True,
    stem_input_fuse: bool = True,
    stem_flow_analytic: bool = True,
    fuse_logits: bool = True,
    s2d_tail: bool = False,
    phase_deconv: bool = True,
    split_fuse: bool = False,
    med_mesh: Optional[jax.sharding.Mesh] = None,
    med_axis: str = "data",
    med_spatial_axis: Optional[str] = None,
    med_interpret: bool = False,
    a_maskr_quirk: bool = False,
) -> FalNet:
    """Build a FAL-net variant ('A' | 'B' | 'C', or reference names like
    'FAL_netB')."""
    key = variant
    if key not in VARIANTS:
        for spec in VARIANTS.values():
            if spec.torch_name == variant:
                key = spec.name
                break
    if key not in VARIANTS:
        raise ValueError(f"unknown variant {variant!r}; have {sorted(VARIANTS)}")
    spec = VARIANTS[key]
    return FalNet(
        spec=spec,
        num_levels=num_levels if num_levels is not None else spec.default_levels,
        dtype=dtype,
        med_impl=med_impl,
        s2d_stem=s2d_stem,
        stem_input_fuse=stem_input_fuse,
        stem_flow_analytic=stem_flow_analytic,
        fuse_logits=fuse_logits,
        s2d_tail=s2d_tail,
        phase_deconv=phase_deconv,
        split_fuse=split_fuse,
        med_mesh=med_mesh,
        med_axis=med_axis,
        med_spatial_axis=med_spatial_axis,
        med_interpret=med_interpret,
        a_maskr_quirk=a_maskr_quirk,
    )
