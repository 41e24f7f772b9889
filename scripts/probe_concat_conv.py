"""Probe: decoder iconv as concat-then-conv vs split-sum convs.

Every decoder fuse is ``conv3x3(concat([deconv_out, skip]))``
(backbone.py decoder loop; reference FAL_netB.py:150-176).  On TPU, XLA
emits convolutions itself and does NOT fuse a concatenate into a conv's
input — the concat materializes a full-channel activation in HBM (write
Cd+Cs, read Cd+Cs).  The algebraically identical split form

    conv(d, W[:, :, :Cd]) + conv(skip, W[:, :, Cd:])

skips that round-trip at the cost of a second conv launch and an add.
At the full-res tail (iconv1: 96ch at 384x1280 b8 fp32 = 1.5 GB) the
concat traffic is ~3.8 ms of HBM time if unfused — measurable if real.

Standalone wins here have LOST in-model before (probe_disp_head.py:
XLA fuses iconv1+logits_1x1 into one fusion and overlaps the head) — if
the split form wins standalone, A/B the full forward before shipping.

    PYTHONPATH=/root/repo python scripts/probe_concat_conv.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B = 8
DN = ("NHWC", "HWIO", "NHWC")


def time_fn(fn, *args, lo=8, hi=72, repeats=3):
    """Per-iteration ms by the slope method (see probe_roofline.py): chain
    length is a traced arg, two run lengths, the slope cancels the ~30 ms
    relay dispatch cost that floors every naive sub-5 ms measurement."""

    @jax.jit
    def chained(n, *a):
        def body(_, carry):
            x, acc = carry
            out = fn(x, *a[1:])
            acc = acc + jnp.sum(out.astype(jnp.float32))
            x = x + (1e-12 * acc) * jnp.ones_like(x)
            return x, acc

        x, acc = jax.lax.fori_loop(
            0, n, body, (a[0], jnp.zeros((), jnp.float32))
        )
        return acc

    float(chained(lo, *args))
    float(chained(hi, *args))

    def best(n):
        b = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(chained(n, *args))
            b = min(b, time.perf_counter() - t0)
        return b

    return max((best(hi) - best(lo)) / (hi - lo), 1e-9) * 1e3


def conv(x, k):
    return jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                        dimension_numbers=DN)


def probe(name, h, w, cd, cs, cout):
    key = jax.random.PRNGKey(0)
    kd, ks, kk = jax.random.split(key, 3)
    d = jax.random.normal(kd, (B, h, w, cd), jnp.float32) * 0.05
    s = jax.random.normal(ks, (B, h, w, cs), jnp.float32) * 0.05
    k = jax.random.normal(kk, (3, 3, cd + cs, cout), jnp.float32) * 0.05

    def concat_form(d, s, k):
        return conv(jnp.concatenate([d, s], axis=-1), k)

    def split_form(d, s, k):
        return conv(d, k[:, :, :cd]) + conv(s, k[:, :, cd:])

    # numerics: identical up to fp reassociation
    a = jax.jit(concat_form)(d, s, k)
    b = jax.jit(split_form)(d, s, k)
    md = float(np.abs(np.asarray(a) - np.asarray(b)).max())

    ms_c = time_fn(lambda d, s, k: concat_form(d, s, k), d, s, k)
    ms_s = time_fn(lambda d, s, k: split_form(d, s, k), d, s, k)
    print(f"{name:34s} concat {ms_c:7.3f} ms  split {ms_s:7.3f} ms "
          f"({ms_c / ms_s:4.2f}x)  maxdiff {md:.1e}")


def main() -> int:
    print("devices:", jax.devices())
    H, W = 384, 1280
    probe("iconv1 64+32->49 @384x1280", H, W, 64, 32, 49)
    probe("iconv2 64+64->64 @192x640", H // 2, W // 2, 64, 64, 64)
    probe("iconv3 128+128->128 @96x320", H // 4, W // 4, 128, 128, 128)
    probe("iconv5 128+256->256 @24x80", H // 16, W // 16, 128, 256, 256)
    return 0


if __name__ == "__main__":
    sys.exit(main())
