"""Per-layer wall-clock breakdown of the FAL_netB forward on the real chip.

Times each backbone stage standalone at its actual shape (batch 8,
384x1280 input, fp32 default precision) with the chained data-dependent
pattern from bench.py (one jit, K iterations serialized by a data dep,
one scalar fetch).  CAVEATS: at iters=8 each number carries a ~3.7 ms
relay floor (30 ms round-trip / 8) plus the chain's full-input rewrite
per iteration — compare rows, don't read them as absolute layer costs,
and remember in-model fusion changes everything (see probe_disp_head.py:
standalone wins there LOST in the full model).  Use this to find
candidate hotspots only; always A/B the full forward before shipping.

    PYTHONPATH=/root/repo python scripts/probe_layer_breakdown.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, *args, iters=8, repeats=3):
    """Best seconds/iter for fn chained iters times on device."""

    @jax.jit
    def chained(*a):
        def body(_, carry):
            x, acc = carry
            out = fn(x, *a[1:])
            acc = acc + jnp.sum(out.astype(jnp.float32))
            x = x + (1e-12 * acc) * jnp.ones_like(x)
            return x, acc

        x, acc = jax.lax.fori_loop(
            0, iters, body, (a[0], jnp.zeros((), jnp.float32))
        )
        return acc

    float(chained(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def conv(x, k, b=None, stride=1, pad="SAME"):
    y = jax.lax.conv_general_dilated(
        x, k, (stride, stride), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y if b is None else y + b


def elu(x):
    return jnp.where(x > 0, x, jnp.expm1(x))


def main():
    B, H, W = 8, 384, 1280
    key = jax.random.PRNGKey(0)
    rows = []

    def add(name, seconds, gmacs):
        rows.append((name, seconds * 1e3, gmacs))

    def mk(shape):
        nonlocal key
        key, sub = jax.random.split(key)
        return jax.random.normal(sub, shape, jnp.float32) * 0.05

    def time_conv_elu(name, h, w, cin, cout, stride=1, kh=3, kw=3, act=True):
        x = mk((B, h, w, cin))
        k = mk((kh, kw, cin, cout))
        fn = (lambda x, k: elu(conv(x, k, stride=stride))) if act else (
            lambda x, k: conv(x, k, stride=stride)
        )
        sec = time_fn(fn, x, k)
        gmacs = (h // stride) * (w // stride) * cout * cin * kh * kw * B / 1e9
        add(name, sec, gmacs)
        return sec

    def time_rb(name, h, w, c):
        x = mk((B, h, w, c))
        k1, k2 = mk((3, 3, c, c)), mk((3, 3, c, c))

        def fn(x, k1, k2):
            return elu(x + conv(elu(conv(x, k1)), k2))

        sec = time_fn(fn, x, k1, k2)
        add(name, sec, 2 * h * w * c * c * 9 * B / 1e9)
        return sec

    # ---- stem (plain domain for reference; the model runs s2d) ----
    time_conv_elu("conv0 3->32 @384x1280 (plain)", H, W, 3, 32)
    time_rb("rb0 32 @384x1280 (plain)", H, W, 32)
    time_conv_elu("conv1 33->64 s2 (plain)", H, W, 33, 64, stride=2)

    # s2d stem equivalents: 12->32*4 ... conv in phase domain
    time_conv_elu("conv0 s2d 12->128 @192x640", H // 2, W // 2, 12, 128)
    time_rb("rb0 s2d 128 @192x640", H // 2, W // 2, 128)

    # ---- encoder ----
    time_rb("rb1 64 @192x640", H // 2, W // 2, 64)
    time_conv_elu("conv2 64->128 s2", H // 2, W // 2, 64, 128, stride=2)
    time_rb("rb2 128 @96x320", H // 4, W // 4, 128)
    time_conv_elu("conv3 128->256 s2", H // 4, W // 4, 128, 256, stride=2)
    time_rb("rb3 256 @48x160", H // 8, W // 8, 256)
    time_conv_elu("conv4 256->256 s2", H // 8, W // 8, 256, 256, stride=2)
    time_rb("rb4 256 @24x80", H // 16, W // 16, 256)
    time_conv_elu("conv5 256->256 s2", H // 16, W // 16, 256, 256, stride=2)
    time_rb("rb5 256 @12x40", H // 32, W // 32, 256)
    time_conv_elu("conv6 256->512 s2", H // 32, W // 32, 256, 512, stride=2)
    time_rb("rb6 512 @6x20", H // 64, W // 64, 512)

    # ---- decoder (dilated-form deconvs: input-dilated conv w/ 4x4 kernel,
    # costed here as the composed conv at output res with k=4x4 on the
    # dilated input == 4 taps live of 16 -> MACs = out*cin*cout*4) ----
    def time_dilated_deconv(name, hin, win, cin, cout):
        x = mk((B, hin, win, cin))
        k = mk((4, 4, cin, cout))

        def fn(x, k):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 2), (1, 2)], lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return elu(y)

        sec = time_fn(fn, x, k)
        add(name, sec, hin * 2 * win * 2 * cout * cin * 4 * B / 1e9)
        return sec

    time_dilated_deconv("deconv6 512->256 ->12x40", 6, 20, 512, 256)
    time_conv_elu("iconv6 512->256 @12x40", 12, 40, 512, 256)
    time_dilated_deconv("deconv5 256->128 ->24x80", 12, 40, 256, 128)
    time_conv_elu("iconv5 384->256 @24x80", 24, 80, 384, 256)
    time_dilated_deconv("deconv4 256->128 ->48x160", 24, 80, 256, 128)
    time_conv_elu("iconv4 384->256 @48x160", 48, 160, 384, 256)
    time_dilated_deconv("deconv3 256->128 ->96x320", 48, 160, 256, 128)
    time_conv_elu("iconv3 256->128 @96x320", 96, 320, 256, 128)
    time_dilated_deconv("deconv2 128->64 ->192x640", 96, 320, 128, 64)
    time_conv_elu("iconv2 128->64 @192x640", 192, 640, 128, 64)
    time_dilated_deconv("deconv1 64->64 ->384x1280", 192, 640, 64, 64)
    time_conv_elu("iconv1 96->49 @384x1280 (no act)", H, W, 96, 49, act=False)

    # iconv1 variants worth knowing about
    time_conv_elu("iconv1-pad128 96->128 @384x1280", H, W, 96, 128, act=False)
    time_conv_elu("head 1x1 49->49 @384x1280", H, W, 49, 49, kh=1, kw=1,
                  act=False)

    # iconv1 with s2d-packed OUTPUT: stride-2 conv, 4x4 kernel, 196 ch out
    def iconv1_s2d_out():
        x = mk((B, H, W, 96))
        k = mk((4, 4, 96, 196))

        def fn(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (2, 2), [(1, 2), (1, 2)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        sec = time_fn(fn, x, k)
        add("iconv1 s2d-out 96->196 s2 k4", sec,
            (H // 2) * (W // 2) * 196 * 96 * 16 * B / 1e9)

    iconv1_s2d_out()

    total = sum(r[1] for r in rows)
    print(f"\n{'layer':42s} {'ms/iter':>8s} {'GMAC(b8)':>9s} {'TF/s':>6s}")
    for name, ms, gmacs in sorted(rows, key=lambda r: -r[1]):
        tf = 2 * gmacs / ms / 1e9 * 1e12 / 1e12  # GMAC*2 / ms -> TF/s
        tf = 2 * gmacs * 1e9 / (ms * 1e-3) / 1e12
        print(f"{name:42s} {ms:8.3f} {gmacs:9.2f} {tf:6.1f}")
    print(f"\nsum of timed layers: {total:.1f} ms (model layers overlap; "
          "variant rows double-count)")


if __name__ == "__main__":
    main()
