"""Prototype: K-packed Pallas 3x3 conv for low-channel layers.

XLA lowers a 3x3 conv as 9 per-tap matmuls with K=C_in, N=C_out; for the
FAL-net stem/decoder (C=32..96) that uses <25% of the MXU's 128-lane K and
N dims (measured 3.6 TFLOPs vs 105 peak).  This kernel instead builds the
(9*C_in, W) patch matrix in VMEM per output row and runs ONE matmul with
K=9*C_in (288 for C=32), N=W on lanes, M=C_out:

    out[co, y, :] = W2[co, (dy,dx,ci)] @ B[(dy,dx,ci), x] ,
    B[(dy,dx,ci), x] = in[ci, y+dy-1, x+dx-1]

Run on the TPU to decide whether a full conv stack (fwd+dgrad+wgrad) is
worth building in round 2:

    python scripts/proto_conv_kernel.py

MEASURED VERDICT (v5e, 2026-08-16): bit-exact (err 0) but NOT faster —
1.01x / 0.94x at batch 1, 0.59x at batch 8, and the 96ch full-res case
VMEM-OOMs (the (1,cout,8,W) output block + scratch exceed 16 MB).  The
matmul is not the bottleneck; per-row patch building (9 rolls + a 36-tile
sublane concat, x8 rows) and the unpipelined DMA dominate.  A competitive
kernel would need double-buffered DMA, incremental patch reuse across
output rows, and wider matmuls — parked for round 2; XLA's conv stands.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8


def _kernel(w_ref, x_hbm, o_ref, xbuf, sem, *, cin, cout, width, wp, tile_h):
    i = pl.program_id(1)
    b = pl.program_id(0)
    # halo-overlapped row block: rows [i*TH, i*TH + TH+2) of the padded input
    # DMA slice sizes on the sublane dim must be 8-aligned: fetch 16 rows
    # (rows 0..tile_h+1 of the buffer are the halo window we use)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(i * tile_h, tile_h + 8), :],
        xbuf,
        sem,
    )
    cp.start()
    cp.wait()

    for y in range(tile_h):  # static unroll
        rows = []
        for dy in range(3):
            full = xbuf[:, y + dy, :]  # (Cin, Wp)
            for dx in range(3):
                # static lane-rotate so every concat operand has offset 0
                # (Mosaic rejects concats with mismatched lane offsets)
                # left-rotate by dx == right-rotate by wp-dx (static roll
                # amounts must be non-negative)
                shifted = pltpu.roll(full, wp - dx, axis=1) if dx else full
                rows.append(shifted[:, 0:width])
        bmat = jnp.concatenate(rows, axis=0)  # (9*Cin, W)
        o_ref[0, :, y, :] = jnp.dot(
            w_ref[...], bmat, preferred_element_type=jnp.float32
        )


@functools.partial(jax.jit, static_argnames=())
def conv3x3_packed(x, w2):
    """x: (B, Cin, H, W) fp32; w2: (Cout, 9*Cin) repacked weights."""
    bsz, cin, h, w = x.shape
    cout = w2.shape[0]
    assert h % TILE_H == 0
    wp = ((w + 2 + 127) // 128) * 128
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 7), (1, wp - w - 1)))
    return pl.pallas_call(
        functools.partial(
            _kernel, cin=cin, cout=cout, width=w, wp=wp, tile_h=TILE_H
        ),
        grid=(bsz, h // TILE_H),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, whole
            pl.BlockSpec(memory_space=pltpu.ANY),  # input stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, cout, TILE_H, w), lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, cout, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((cin, TILE_H + 8, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(w2, xp)


def repack_weights(k_hwio):
    """(3,3,Ci,Co) HWIO -> (Co, 9*Ci) with K order (dy, dx, ci)."""
    kh, kw, ci, co = k_hwio.shape
    return jnp.transpose(k_hwio, (3, 0, 1, 2)).reshape(co, kh * kw * ci)


def bench(fn, *args, iters=20):
    @jax.jit
    def chained(x, *rest):
        def body(_, carry):
            x, acc = carry
            out = fn(x, *rest)
            acc = acc + jnp.sum(out)
            return x + (1e-12 * acc) * jnp.ones_like(x), acc

        return jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))[1]

    float(chained(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(chained(*args))
        best = min(best, time.time() - t0)
    return best / iters * 1000


def main():
    rng = np.random.default_rng(0)
    cases = [
        (1, 32, 384, 1280, 32),   # stem residual conv, full res
        (1, 64, 192, 640, 64),    # level-1 residual conv
        (8, 64, 192, 640, 64),    # training batch
        (1, 96, 384, 1280, 49),   # decoder tail iconv1
    ]
    for bsz, cin, h, w, cout in cases:
        x = jnp.asarray(rng.standard_normal((bsz, cin, h, w)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.05)
        w2 = repack_weights(k)

        got = conv3x3_packed(x, w2)
        want = jax.lax.conv_general_dilated(
            jnp.transpose(x, (0, 2, 3, 1)), k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        err = float(jnp.max(jnp.abs(jnp.transpose(got, (0, 2, 3, 1)) - want)))
        flops = 2 * bsz * h * w * cin * cout * 9

        ms_p = bench(lambda xx: conv3x3_packed(xx, w2), x)
        xn = jnp.transpose(x, (0, 2, 3, 1))
        ms_x = bench(
            lambda xx: jax.lax.conv_general_dilated(
                xx, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ),
            xn,
        )
        print(
            f"b{bsz} {cin:3d}->{cout:3d} @{h}x{w}: packed {ms_p:7.2f} ms "
            f"({flops/ms_p*1e-9:5.1f} TF) | xla {ms_x:7.2f} ms "
            f"({flops/ms_x*1e-9:5.1f} TF) | speedup {ms_x/ms_p:4.2f}x | err {err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
