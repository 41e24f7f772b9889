"""Does an int8 conv actually run ~2x on the v5e MXU through XLA?

v5e: 394 TOPS int8 vs 197 TFLOP/s bf16.  Before building any quantized
inference path, measure raw conv throughput at representative backbone
shapes: int8xint8->int32 conv vs the default fp32 conv (which already
runs single-pass bf16 on the MXU), including the dequant+ELU+requant
elementwise cost a per-layer quantized net would pay.

Usage: PYTHONPATH=/root/repo python scripts/probe_int8_conv.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 30


def conv(x, k, preferred=None):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )


def time_chain(fn, x, repeats=3):
    @jax.jit
    def chained(x):
        def body(_, c):
            x, acc = c
            y = fn(x)
            acc = acc + jnp.sum(y.astype(jnp.float32))
            # feed something of x's dtype back to serialize
            x = (x + (acc * 0).astype(x.dtype)).astype(x.dtype)
            return x, acc

        return jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0)))[1]

    float(chained(x))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(chained(x))
        best = min(best, time.time() - t0)
    return best / ITERS


def main():
    rng = np.random.default_rng(0)
    rows = []

    def rec(name, sec, flops):
        rows.append({
            "probe": name,
            "ms": round(sec * 1e3, 3),
            "tflops": round(flops / sec / 1e12, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    for b, h, w, ci, co in [(8, 96, 320, 128, 128), (8, 48, 160, 256, 256)]:
        flops = 2 * 9 * ci * co * b * h * w
        xf = jnp.asarray(rng.standard_normal((b, h, w, ci)).astype(np.float32))
        kf = jnp.asarray(
            rng.standard_normal((3, 3, ci, co)).astype(np.float32) * 0.05
        )
        rec(f"fp32 conv {ci}->{co} @{h}x{w}", time_chain(lambda x: conv(x, kf), xf), flops)

        xi = jnp.asarray(rng.integers(-127, 127, (b, h, w, ci), dtype=np.int8))
        ki = jnp.asarray(rng.integers(-127, 127, (3, 3, ci, co), dtype=np.int8))
        try:
            rec(
                f"int8 conv {ci}->{co} @{h}x{w}",
                time_chain(lambda x: conv(x, ki, jnp.int32), xi),
                flops,
            )
        except Exception as e:
            print(json.dumps({"probe": f"int8 conv {ci}->{co}", "error": str(e)[:200]}))

        # full quantized-layer cost: int8 conv -> dequant fp32 -> ELU ->
        # requant int8 (what a per-layer quantized net pays between convs)
        def qlayer(x):
            y = conv(x, ki, jnp.int32).astype(jnp.float32) * (1.0 / 127)
            y = jax.nn.elu(y)
            return jnp.clip(jnp.round(y * 127.0), -127, 127).astype(jnp.int8)

        try:
            rec(f"int8 conv+deq+elu+req {ci}->{co}", time_chain(qlayer, xi), flops)
        except Exception as e:
            print(json.dumps({"probe": f"qlayer {ci}->{co}", "error": str(e)[:200]}))

    print(json.dumps({"all": rows}))


if __name__ == "__main__":
    main()
