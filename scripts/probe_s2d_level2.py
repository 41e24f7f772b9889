"""Measure s2d at encoder level 2 (round-1 VERDICT #8).

CLAUDE.md left "deeper s2d levels likely similar — don't bother without
measuring".  This measures it: the level-2 block is conv2 (3x3 stride-2
64->128 at 192x640 input, models/FAL_netB.py:101-112) followed by rb2
(two 3x3 128->128 convs at 96x320).

Candidate transforms, timed against the plain path on the real chip:
  a) conv2 in the s2d domain: s2d the 192x640x64 input -> 96x320x256,
     2x2 phase-block kernel (1.78x FLOPs: 16 taps vs 9), output at native
     96x320x128.  Includes the space_to_depth relayout cost.
  b) rb1 (64ch full 3x3 pair at 192x640) in the s2d domain: 96x320x256
     stride-1 convs (4x FLOPs for full-lane utilization).

Usage: PYTHONPATH=/root/repo python scripts/probe_s2d_level2.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from fal_net_tpu.ops.s2d import conv_s2d_s1, conv_s2d_s2, space_to_depth

B, H, W = 8, 192, 640  # level-2 input resolution at training batch
ITERS = 20


def time_fn(fn, x, iters=ITERS, repeats=3):
    @jax.jit
    def chained(x):
        def body(_, carry):
            x, acc = carry
            out = fn(x)
            acc = acc + jnp.sum(out.astype(jnp.float32))
            x = x + (1e-12 * acc).astype(x.dtype) * jnp.ones_like(x)
            return x, acc

        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
        return acc

    float(chained(x))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(chained(x))
        best = min(best, time.time() - t0)
    return best / iters


def conv(x, k, stride=1):
    pad = ((k.shape[0] // 2,) * 2, (k.shape[1] // 2,) * 2)
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def main():
    rng = np.random.default_rng(0)
    x64 = jnp.asarray(rng.standard_normal((B, H, W, 64)).astype(np.float32))
    k2 = jnp.asarray(rng.standard_normal((3, 3, 64, 128)).astype(np.float32) * 0.05)
    krb = [
        jnp.asarray(rng.standard_normal((3, 3, 128, 128)).astype(np.float32) * 0.05)
        for _ in range(2)
    ]
    krb1 = [
        jnp.asarray(rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * 0.05)
        for _ in range(2)
    ]

    rows = []

    def rec(name, sec):
        row = {"probe": name, "ms": round(sec * 1e3, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # Level-2 block: conv2 + rb2, plain vs conv2-in-s2d.
    def level2_plain(x):
        y = jax.nn.elu(conv(x, k2, stride=2))
        z = jax.nn.elu(conv(y, krb[0]))
        return jax.nn.elu(conv(z, krb[1]) + y)

    def level2_s2d(x):
        y = jax.nn.elu(conv_s2d_s2(space_to_depth(x), k2))
        z = jax.nn.elu(conv(y, krb[0]))
        return jax.nn.elu(conv(z, krb[1]) + y)

    rec("level2 conv2+rb2 plain", time_fn(level2_plain, x64))
    rec("level2 conv2-s2d + rb2", time_fn(level2_s2d, x64))

    # rb1 (64ch stride-1 pair at 192x640), plain vs s2d domain.
    def rb1_plain(x):
        z = jax.nn.elu(conv(x, krb1[0]))
        return jax.nn.elu(conv(z, krb1[1]) + x)

    def rb1_s2d(x):
        xs = space_to_depth(x)
        z = jax.nn.elu(conv_s2d_s1(xs, krb1[0]))
        out = jax.nn.elu(conv_s2d_s1(z, krb1[1]) + xs)
        return out  # stays in s2d domain; next op (conv2) could consume it

    rec("rb1 64ch plain", time_fn(rb1_plain, x64))
    rec("rb1 64ch s2d", time_fn(rb1_s2d, x64))

    print(json.dumps({"all": rows}))


if __name__ == "__main__":
    main()
