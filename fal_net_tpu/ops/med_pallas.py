"""Fused Pallas TPU kernel for the MED probability-volume head.

Replaces the whole chain
    shift logits (2N gathers) -> softmax -> shift image (2*3N gathers)
    -> pan blend -> sub-occlusion masks -> disparity expectation
with ONE pass over the logits volume per output tile (plus a matching
hand-derived backward kernel).  The reference issues ~4N separate
``grid_sample`` kernels and O(N^2) cat copies per forward
(models/FAL_netB.py:222-282); the jnp reference path
(:mod:`fal_net_tpu.ops.med`) already vectorizes them but still materializes
the shifted logits volume and a (B,H,W,C,N) shifted-image volume in HBM.
Here everything stays in VMEM.

Layout: plane-major blocks ``(N, TILE_H, W)`` so W rides the 128-wide lanes
(N=49 on the last axis would waste 60% of each lane tile).  Per-plane
shifts live in SMEM and every shifted row is a dynamic slice of a
zero-padded VMEM scratch — ``lax.fori_loop`` over planes keeps the Mosaic
program small (a fully unrolled N=49 variant took >4 min to compile).

Grid: (B, H // TILE_H).  Requires H % TILE_H == 0 (the public wrapper pads
and crops).  All math fp32 in-kernel regardless of input dtype.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fal_net_tpu.ops.med import MedOutputs, med_outputs

TILE_H = 8
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_row_len(x: int) -> int:
    """Padded scratch row length: the next POWER-OF-TWO multiple of LANE.

    Plain 128-alignment is not enough: the backend's Mosaic lowers the
    dynamic-amount ``pltpu.roll`` incorrectly when the lane dimension is a
    non-power-of-two multiple of 128 — rotated data lands in the wrong
    lane tile, so every shifted read returns the zero margin (or worse,
    misplaced rows).  Measured on-chip: 3x/5x/6x128 rows are wrong for
    every nonzero shift, 4x/8x/16x128 are exact
    (scripts/probe_roll_bug.py, runs/probe_roll_bug_r05.log; this broke
    FAL_netA/C synthetic training at w=128 — all-zero pan).  The extra
    zeros land in the right margin, which the window reads never touch;
    the cost is VMEM only (the production 384x1280 shape is 2048 = 16x128
    either way, so its program is unchanged).
    """
    tiles = -(-x // LANE)
    return LANE * (1 << max(0, (tiles - 1).bit_length()))


def _plane_tables(min_disp: float, max_disp: float, num_levels: int, width: int):
    """Host-side per-plane tables: disparity level, forward shift floor/frac,
    backward (negative) shift floor/frac."""
    lev = np.empty(num_levels, np.float32)
    f_fw = np.empty(num_levels, np.int32)
    t_fw = np.empty(num_levels, np.float32)
    f_bw = np.empty(num_levels, np.int32)
    t_bw = np.empty(num_levels, np.float32)
    ratio = math.log(max_disp / min_disp)
    max_shift = 0.0
    for n in range(num_levels):
        c = n / (num_levels - 1)
        d = max_disp * math.exp(ratio * (c - 1.0))
        s = d * (width - 1) / width  # align_corners=True pixel shift
        max_shift = max(max_shift, abs(s))
        lev[n] = d
        f_fw[n] = math.floor(s)
        t_fw[n] = s - math.floor(s)
        f_bw[n] = math.floor(-s)
        t_bw[n] = -s - math.floor(-s)
    pad = _round_up(int(math.ceil(max_shift)) + 2, LANE)
    return lev, f_fw, t_fw, f_bw, t_bw, pad


# ---------------------------------------------------------------------------
# Kernel helpers
# ---------------------------------------------------------------------------


def _shift_sample(rows, f, t, pad, width):
    """out[:, y] = (1-t)*rows[:, pad+y+f] + t*rows[:, pad+y+f+1].

    ``rows`` is a zero-padded (TILE_H, WP) array; ``f`` may be a traced
    int32 (from SMEM).  Mosaic forbids dynamic *unaligned* lane slices but
    has a native dynamic lane rotate, so: roll left by f, then two static
    slices.  The >= pad+2 zero margin absorbs the circular wrap-around, so
    no wrapped element ever lands in the [pad, pad+width) window.
    """
    r = pltpu.roll(rows, -f, axis=1)
    return (1.0 - t) * r[:, pad : pad + width] + t * r[:, pad + 1 : pad + 1 + width]


def _zero_fill(ref):
    ref[...] = jnp.zeros(ref.shape, ref.dtype)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    lev_ref,  # (N,) SMEM
    ffw_ref,  # (N,) SMEM int32
    tfw_ref,  # (N,) SMEM f32
    fbw_ref,  # (N,) SMEM int32
    tbw_ref,  # (N,) SMEM f32
    logits_ref,  # (1, N, TILE_H, W) VMEM
    img_ref,  # (1, C, TILE_H, W) VMEM
    disp_ref,  # (1, 1, TILE_H, W)
    pan_ref,  # (1, C, TILE_H, W)
    maskl_ref,  # (1, 1, TILE_H, W)
    maskr_ref,  # (1, 1, TILE_H, W)
    pad_log,  # (N, TILE_H, WP) scratch
    pad_img,  # (C, TILE_H, WP) scratch
    dvol,  # (N, TILE_H, W) scratch — Dprob
    rowbuf,  # (TILE_H, WP) scratch
    *,
    num_levels: int,
    channels: int,
    width: int,
    pad: int,
    want_disp: bool,
    want_pan: bool,
    want_subocc: bool,
):
    N, C, W, L = num_levels, channels, width, pad
    f32 = jnp.float32
    zeros = lambda: jnp.zeros((TILE_H, W), f32)

    logit = lambda n: logits_ref[0, n].astype(f32)

    def fw_shift(buf, ch, n):
        return _shift_sample(buf[ch], ffw_ref[n], tfw_ref[n], L, W)

    # ---- plain softmax over planes (disp + maskR source) ----
    m0 = jax.lax.fori_loop(
        1, N, lambda n, m: jnp.maximum(m, logit(n)), logit(0)
    )

    def zacc_body(n, carry):
        z0, acc = carry
        e = jnp.exp(logit(n) - m0)
        return z0 + e, acc + lev_ref[n] * e

    z0, acc = jax.lax.fori_loop(0, N, zacc_body, (zeros(), zeros()))
    if want_disp:
        disp_ref[0, 0] = (acc / z0).astype(disp_ref.dtype)

    if want_subocc:
        # maskR shifts the NORMALIZED probabilities (z0 varies spatially:
        # the division must happen at the source, before the shift; pads
        # stay zero = the reference's zero padding of sm0).
        _zero_fill(pad_log)
        inv_z0 = 1.0 / z0

        def fill_sm0(n, _):
            pad_log[n, :, L : L + W] = jnp.exp(logit(n) - m0) * inv_z0
            return 0

        jax.lax.fori_loop(0, N, fill_sm0, 0)
        mr = jax.lax.fori_loop(
            0, N, lambda n, m: m + fw_shift(pad_log, n, n), zeros()
        )
        maskr_ref[0, 0] = jnp.minimum(mr, 1.0).astype(maskr_ref.dtype)

    if not (want_pan or want_subocc):
        return

    # ---- shifted-logits softmax (Dprob) ----
    _zero_fill(pad_log)

    def fill_logits(n, _):
        pad_log[n, :, L : L + W] = logit(n)
        return 0

    jax.lax.fori_loop(0, N, fill_logits, 0)

    def shift_store(n, m):
        s = fw_shift(pad_log, n, n)
        dvol[n] = s
        return jnp.maximum(m, s)

    m = jax.lax.fori_loop(0, N, shift_store, jnp.full((TILE_H, W), -jnp.inf, f32))

    def exp_store(n, z):
        e = jnp.exp(dvol[n] - m)
        dvol[n] = e
        return z + e

    z = jax.lax.fori_loop(0, N, exp_store, zeros())
    inv_z = 1.0 / z

    if want_subocc:
        # maskL shifts normalized probabilities per-pixel at the SOURCE, so
        # the volume must be normalized in place.  The pan-only path (the
        # stage-1 training config) skips this whole pass and folds inv_z
        # into the final blend instead.
        def norm_store(n, _):
            dvol[n] = dvol[n] * inv_z
            return 0

        jax.lax.fori_loop(0, N, norm_store, 0)

    # ---- pan: sum_n shift(img)_n * Dprob_n ----
    if want_pan:
        _zero_fill(pad_img)
        for c in range(C):  # C=3: tiny static unroll
            pad_img[c, :, L : L + W] = img_ref[0, c].astype(f32)

        def pan_body(n, accs):
            d = dvol[n]
            return tuple(
                accs[c] + fw_shift(pad_img, c, n) * d for c in range(C)
            )

        pans = jax.lax.fori_loop(0, N, pan_body, tuple(zeros() for _ in range(C)))
        scale = 1.0 if want_subocc else inv_z  # dvol held raw exps otherwise
        for c in range(C):
            pan_ref[0, c] = (pans[c] * scale).astype(pan_ref.dtype)

    # ---- maskL: sum_n shift_{-s_n}(Dprob_n) ----
    if want_subocc:
        _zero_fill(rowbuf)

        def ml_body(n, m):
            rowbuf[:, L : L + W] = dvol[n]
            return m + _shift_sample(rowbuf[...], fbw_ref[n], tbw_ref[n], L, W)

        ml = jax.lax.fori_loop(0, N, ml_body, zeros())
        maskl_ref[0, 0] = jnp.minimum(ml, 1.0).astype(maskl_ref.dtype)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    lev_ref,
    ffw_ref,
    tfw_ref,
    logits_ref,  # (1, N, TILE_H, W)
    img_ref,  # (1, C, TILE_H, W)
    gdisp_ref,  # (1, 1, TILE_H, W)
    gpan_ref,  # (1, C, TILE_H, W)
    glog_ref,  # (1, N, TILE_H, W) out
    gimg_ref,  # (1, C, TILE_H, W) out
    pad_log,  # (N, TILE_H, WP)
    pad_img,  # (C, TILE_H, WP)
    dvol,  # (N, TILE_H, W)
    rowbuf,  # (TILE_H, WP)
    *,
    num_levels: int,
    channels: int,
    width: int,
    pad: int,
    want_disp: bool,
    want_pan: bool,
):
    """Hand-derived VJP.  Masks are stop-gradient in the reference
    (FAL_netB.py:264-273), so only disp and pan carry cotangents.

      disp term:  g_l_n += sm0_n * (w_n - disp) * g_disp
      pan terms:  g_D_n  = sum_c S_n(img_c) * g_pan_c
                  q_n    = D_n * g_D_n ;  g_shifted_n = q_n - D_n * sum_m q_m
                  g_l_n += S_n^T(g_shifted_n)
                  g_img_c = sum_n S_n^T(D_n * g_pan_c)
      where S^T(g)[y] = (1-t) g[y-f] + t g[y-f-1]  (transposed lerp-gather).
    """
    N, C, W, L = num_levels, channels, width, pad
    f32 = jnp.float32
    zeros = lambda: jnp.zeros((TILE_H, W), f32)
    logit = lambda n: logits_ref[0, n].astype(f32)

    def fw_shift(buf, ch, n):
        return _shift_sample(buf[ch], ffw_ref[n], tfw_ref[n], L, W)

    def shift_T(n):
        """rowbuf holds padded g; S_n^T(g)[y] = (1-t) g[y-f] + t g[y-f-1],
        i.e. a forward sample with f' = -f-1 and t' = 1-t."""
        return _shift_sample(rowbuf[...], -ffw_ref[n] - 1, 1.0 - tfw_ref[n], L, W)

    # --- recompute sm0 stats ---
    m0 = jax.lax.fori_loop(1, N, lambda n, m: jnp.maximum(m, logit(n)), logit(0))

    def zacc_body(n, carry):
        z0, acc = carry
        e = jnp.exp(logit(n) - m0)
        return z0 + e, acc + lev_ref[n] * e

    z0, acc = jax.lax.fori_loop(0, N, zacc_body, (zeros(), zeros()))
    disp = acc / z0
    gdisp = gdisp_ref[0, 0].astype(f32)

    sum_q = zeros()
    if want_pan:
        # --- recompute Dprob into dvol ---
        _zero_fill(pad_log)

        def fill_logits(n, _):
            pad_log[n, :, L : L + W] = logit(n)
            return 0

        jax.lax.fori_loop(0, N, fill_logits, 0)

        def shift_store(n, m):
            s = fw_shift(pad_log, n, n)
            dvol[n] = s
            return jnp.maximum(m, s)

        m = jax.lax.fori_loop(0, N, shift_store, jnp.full((TILE_H, W), -jnp.inf, f32))

        def exp_store(n, z):
            e = jnp.exp(dvol[n] - m)
            dvol[n] = e
            return z + e

        z = jax.lax.fori_loop(0, N, exp_store, zeros())
        inv_z = 1.0 / z

        def norm_store(n, _):
            dvol[n] = dvol[n] * inv_z
            return 0

        jax.lax.fori_loop(0, N, norm_store, 0)

        # --- padded image; q_n into pad_log center (logits copy is spent) ---
        _zero_fill(pad_img)
        for c in range(C):
            pad_img[c, :, L : L + W] = img_ref[0, c].astype(f32)
        gpan = [gpan_ref[0, c].astype(f32) for c in range(C)]

        def q_body(n, sq):
            gd = zeros()
            for c in range(C):
                gd = gd + fw_shift(pad_img, c, n) * gpan[c]
            q = dvol[n] * gd
            pad_log[n, :, L : L + W] = q
            return sq + q

        sum_q = jax.lax.fori_loop(0, N, q_body, zeros())

        # --- g_img: sum_n S^T(D_n * g_pan_c) ---
        _zero_fill(rowbuf)
        for c in range(C):
            def gi_body(n, gi):
                rowbuf[:, L : L + W] = dvol[n] * gpan[c]
                return gi + shift_T(n)

            gimg_ref[0, c] = jax.lax.fori_loop(0, N, gi_body, zeros()).astype(
                gimg_ref.dtype
            )
    else:
        _zero_fill(gimg_ref)

    # --- g_logits ---
    _zero_fill(rowbuf)

    def gl_body(n, _):
        g = zeros()
        if want_disp:
            sm0_n = jnp.exp(logit(n) - m0) / z0
            g = g + sm0_n * (lev_ref[n] - disp) * gdisp
        if want_pan:
            g_shift = pad_log[n, :, L : L + W] - dvol[n] * sum_q
            rowbuf[:, L : L + W] = g_shift
            g = g + shift_T(n)
        glog_ref[0, n] = g.astype(glog_ref.dtype)
        return 0

    jax.lax.fori_loop(0, N, gl_body, 0)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------


def _block(nc: int, w: int):
    return pl.BlockSpec(
        (1, nc, TILE_H, w),
        lambda b, i: (b, 0, i, 0),
        memory_space=pltpu.VMEM,
    )


def _smem(n: int):
    return pl.BlockSpec(memory_space=pltpu.SMEM)


@functools.partial(
    jax.jit,
    static_argnames=(
        "min_disp", "max_disp", "want_disp", "want_pan", "want_subocc", "interpret",
    ),
)
def _med_fused_fwd_call(
    logits: jax.Array,  # (B, N, H, W) fp32
    image: jax.Array,  # (B, C, H, W) fp32
    *,
    min_disp: float,
    max_disp: float,
    want_disp: bool,
    want_pan: bool,
    want_subocc: bool,
    interpret: bool = False,
):
    b, n, h, w = logits.shape
    c = image.shape[1]
    assert h % TILE_H == 0, f"H={h} not a multiple of {TILE_H}"
    lev, f_fw, t_fw, f_bw, t_bw, pad = _plane_tables(min_disp, max_disp, n, w)
    # dynamic lane rotates require a 128-aligned, power-of-two-tile row
    # length (see _pad_row_len; extra zeros land in the right margin)
    wp = _pad_row_len(w + 2 * pad)

    kernel = functools.partial(
        _fwd_kernel,
        num_levels=n,
        channels=c,
        width=w,
        pad=pad,
        want_disp=want_disp,
        want_pan=want_pan,
        want_subocc=want_subocc,
    )
    out_shapes = (
        jax.ShapeDtypeStruct((b, 1, h, w), jnp.float32),  # disp
        jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),  # pan
        jax.ShapeDtypeStruct((b, 1, h, w), jnp.float32),  # maskL
        jax.ShapeDtypeStruct((b, 1, h, w), jnp.float32),  # maskR
    )
    disp, pan, maskl, maskr = pl.pallas_call(
        kernel,
        grid=(b, h // TILE_H),
        in_specs=[_smem(n)] * 5 + [_block(n, w), _block(c, w)],
        out_specs=(_block(1, w), _block(c, w), _block(1, w), _block(1, w)),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((n, TILE_H, wp), jnp.float32),
            pltpu.VMEM((c, TILE_H, wp), jnp.float32),
            pltpu.VMEM((n, TILE_H, w), jnp.float32),
            pltpu.VMEM((TILE_H, wp), jnp.float32),
        ],
        interpret=interpret,
    )(lev, f_fw, t_fw, f_bw, t_bw, logits, image)
    return disp, pan, maskl, maskr


@functools.partial(
    jax.jit,
    static_argnames=("min_disp", "max_disp", "want_disp", "want_pan", "interpret"),
)
def _med_fused_bwd_call(
    logits: jax.Array,
    image: jax.Array,
    gdisp: jax.Array,
    gpan: jax.Array,
    *,
    min_disp: float,
    max_disp: float,
    want_disp: bool,
    want_pan: bool,
    interpret: bool = False,
):
    b, n, h, w = logits.shape
    c = image.shape[1]
    lev, f_fw, t_fw, _f_bw, _t_bw, pad = _plane_tables(min_disp, max_disp, n, w)
    wp = _pad_row_len(w + 2 * pad)  # see fwd: pow2-tile dynamic rotates

    kernel = functools.partial(
        _bwd_kernel,
        num_levels=n,
        channels=c,
        width=w,
        pad=pad,
        want_disp=want_disp,
        want_pan=want_pan,
    )
    glog, gimg = pl.pallas_call(
        kernel,
        grid=(b, h // TILE_H),
        in_specs=[_smem(n)] * 3
        + [_block(n, w), _block(c, w), _block(1, w), _block(c, w)],
        out_specs=(_block(n, w), _block(c, w)),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, TILE_H, wp), jnp.float32),
            pltpu.VMEM((c, TILE_H, wp), jnp.float32),
            pltpu.VMEM((n, TILE_H, w), jnp.float32),
            pltpu.VMEM((TILE_H, wp), jnp.float32),
        ],
        interpret=interpret,
    )(lev, f_fw, t_fw, logits, image, gdisp, gpan)
    return glog, gimg


# Public API -----------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _med_fused(logits, image, min_disp, max_disp, want_disp, want_pan, want_subocc, interpret):
    return _med_fused_fwd_call(
        logits,
        image,
        min_disp=min_disp,
        max_disp=max_disp,
        want_disp=want_disp,
        want_pan=want_pan,
        want_subocc=want_subocc,
        interpret=interpret,
    )


def _med_fused_fwd(logits, image, min_disp, max_disp, want_disp, want_pan, want_subocc, interpret):
    outs = _med_fused_fwd_call(
        logits,
        image,
        min_disp=min_disp,
        max_disp=max_disp,
        want_disp=want_disp,
        want_pan=want_pan,
        want_subocc=want_subocc,
        interpret=interpret,
    )
    return outs, (logits, image)


def _med_fused_bwd(min_disp, max_disp, want_disp, want_pan, want_subocc, interpret, res, g):
    logits, image = res
    gdisp, gpan, _gml, _gmr = g  # masks are stop-gradient
    glog, gimg = _med_fused_bwd_call(
        logits,
        image,
        gdisp,
        gpan,
        min_disp=min_disp,
        max_disp=max_disp,
        want_disp=want_disp,
        want_pan=want_pan,
        interpret=interpret,
    )
    return glog, gimg


_med_fused.defvjp(_med_fused_fwd, _med_fused_bwd)


def med_outputs_fused_dp(
    logits: jax.Array,  # (B, H, W, N) — model layout, batch-sharded
    image: jax.Array,  # (B, H, W, C)
    min_disp,
    max_disp,
    *,
    mesh: jax.sharding.Mesh,
    axis_name: str = "data",
    spatial_axis: Optional[str] = None,
    ret_disp: bool = True,
    ret_pan: bool = False,
    ret_subocc: bool = False,
    interpret: bool = False,
) -> MedOutputs:
    """Batch-data-parallel (optionally height-sharded) fused MED head.

    ``pallas_call`` has no SPMD partitioning rule, so under a sharded jit
    XLA cannot split it across devices; ``shard_map`` over the mesh's data
    axis runs the kernel per-device on its local batch shard instead.  The
    kernel grid is batch-major (one grid row per sample), so sharding axis
    0 is exact — no collectives, each device's shard is independent.  The
    custom VJP applies inside the shard too, keeping the fused backward on
    multi-chip training.  Requires static float bounds (falls back to the
    jnp path otherwise, which XLA shards like any other op) and a batch
    divisible by the axis size.

    ``spatial_axis``: additionally shard image rows over this mesh axis
    (parallel/spatial.py meshes).  Every MED op — per-plane W-shift,
    cross-plane softmax, blends — is row-local, so an H-split is exact
    too; each device pads its local rows to the kernel tile independently.
    """
    if not (isinstance(min_disp, (int, float)) and isinstance(max_disp, (int, float))):
        return med_outputs(
            logits, image, min_disp, max_disp,
            ret_disp=ret_disp, ret_pan=ret_pan, ret_subocc=ret_subocc,
        )
    from jax.sharding import PartitionSpec as P

    n_shards = mesh.shape[axis_name]
    if spatial_axis is not None and mesh.shape.get(spatial_axis, 1) <= 1:
        spatial_axis = None
    # An indivisible H (full-size KITTI heights like 375 on a spatial
    # mesh) only disables the H-split — the batch-sharded fused kernel is
    # still exact.  An indivisible batch (e.g. the batch-1 validation
    # forward on a model built with a training mesh) can't shard_map at
    # all; fall back to the jnp path, which XLA places or partitions like
    # any other op instead of crashing the run.
    if spatial_axis is not None and logits.shape[1] % mesh.shape[spatial_axis] != 0:
        spatial_axis = None
    if logits.shape[0] % n_shards != 0:
        return med_outputs(
            logits, image, min_disp, max_disp,
            ret_disp=ret_disp, ret_pan=ret_pan, ret_subocc=ret_subocc,
        )
    fields = [
        name
        for name, want in zip(
            MedOutputs._fields, (ret_pan, ret_disp, ret_subocc, ret_subocc)
        )
        if want
    ]

    def local(lg, im):
        out = med_outputs_fused(
            lg, im, min_disp, max_disp,
            ret_disp=ret_disp, ret_pan=ret_pan, ret_subocc=ret_subocc,
            interpret=interpret,
        )
        return tuple(getattr(out, name) for name in fields)

    spec = P(axis_name, spatial_axis) if spatial_axis else P(axis_name)
    outs = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=tuple(spec for _ in fields),
        # pallas_call's out_shape carries no varying-mesh-axes metadata, so
        # the default check_vma=True rejects it; the mapping here is the
        # trivial batch split (no collectives), safe to skip the check.
        check_vma=False,
    )(logits, image)
    vals = {name: None for name in MedOutputs._fields}
    vals.update(zip(fields, outs))
    return MedOutputs(**vals)


def med_outputs_fused(
    logits: jax.Array,  # (B, H, W, N) — model layout
    image: jax.Array,  # (B, H, W, C)
    min_disp,
    max_disp,
    *,
    ret_disp: bool = True,
    ret_pan: bool = False,
    ret_subocc: bool = False,
    interpret: bool = False,
) -> MedOutputs:
    """Drop-in fused replacement for :func:`fal_net_tpu.ops.med.med_outputs`.

    Requires python-float disparity bounds (the trainers' fixed +300/2
    config); falls back to the jnp reference path for traced bounds.
    """
    if not (isinstance(min_disp, (int, float)) and isinstance(max_disp, (int, float))):
        return med_outputs(
            logits, image, min_disp, max_disp,
            ret_disp=ret_disp, ret_pan=ret_pan, ret_subocc=ret_subocc,
        )
    b, h, w, n = logits.shape
    pad_h = (-h) % TILE_H
    lg = jnp.transpose(logits, (0, 3, 1, 2)).astype(jnp.float32)
    im = jnp.transpose(image, (0, 3, 1, 2)).astype(jnp.float32)
    if pad_h:
        lg = jnp.pad(lg, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
        im = jnp.pad(im, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
    disp, pan, maskl, maskr = _med_fused(
        lg, im, float(min_disp), float(max_disp),
        ret_disp, ret_pan, ret_subocc, interpret,
    )
    unpad = lambda x: x[:, :, :h, :] if pad_h else x
    to_nhwc = lambda x: jnp.transpose(unpad(x), (0, 2, 3, 1))
    return MedOutputs(
        pan=to_nhwc(pan) if ret_pan else None,
        disp=to_nhwc(disp) if ret_disp else None,
        maskL=to_nhwc(maskl) if ret_subocc else None,
        maskR=to_nhwc(maskr) if ret_subocc else None,
    )
