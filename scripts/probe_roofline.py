"""Per-layer roofline for the shipped FAL_netB forward (VERDICT r3 #5).

For every conv-shaped layer of the batch-8 384x1280 forward (s2d stem +
dilated-form deconvs — the shipped config), measure on the real chip:

  * the layer's wall time and achieved TF/s (chained-iteration timing,
    bench.py pattern — a per-call host sync costs ~28 ms via this relay);
  * the SAME spatial shape with channels padded up to the next 128-lane
    multiple — its achieved TF/s is the *hardware ceiling for that shape*
    (if real and padded run in the same wall time, output-lane padding is
    eating the difference, the round-3 s2d finding);
  * the layer's conv-bound floor: real FLOPs at the padded-shape TF/s.

The sum of floors vs the measured full-forward time quantifies how close
the model is to its conv-bound ceiling — the number DESIGN.md's roofline
section cites.  Emits a markdown table + JSON (runs/roofline.json).

    PYTHONPATH=/root/repo python scripts/probe_roofline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 8, 384, 1280
PEAK_TF = 197.0  # v5e bf16 MXU peak (bench.py); fp32 convs run the MXU in
#                  single-pass bf16 at default precision (CLAUDE.md round-2)


def time_fn(fn, *args, lo=8, hi=72, repeats=3):
    """Per-iteration seconds by the SLOPE method.

    A single relay round-trip costs ~30 ms host-side (CLAUDE.md), so at
    iters=8 every layer reads >=3.7 ms/iter no matter how small it is —
    the first version of this probe measured 171 ms summed standalone
    layers for a forward that takes 40 ms end-to-end.  Instead make the
    chain length a *traced* argument (one compile), run the same program
    at two lengths, and take (T_hi - T_lo) / (hi - lo): the fixed
    dispatch/sync cost cancels exactly.
    """

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

    float(chained(lo, *args))  # compile once (n is dynamic)
    float(chained(hi, *args))

    def best(n):
        b = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(chained(n, *args))
            b = min(b, time.perf_counter() - t0)
        return b

    slope = (best(hi) - best(lo)) / (hi - lo)
    return max(slope, 1e-6)  # clamp: relay jitter can drive tiny layers <0


def pad128(c):
    return max(128, ((c + 127) // 128) * 128)


_key = [jax.random.PRNGKey(0)]


def mk(shape):
    _key[0], sub = jax.random.split(_key[0])
    return jax.random.normal(sub, shape, jnp.float32) * 0.05


def conv_ms(h, w, cin, cout, kh, kw, stride=1, lhs_dilation=None, pad="SAME"):
    x = mk((B, h, w, cin))
    k = mk((kh, kw, cin, cout))
    dn = ("NHWC", "HWIO", "NHWC")

    if lhs_dilation:
        # the shipped dilated-form deconv (ops/phase_deconv.py:71-78)
        def fn(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), [(2, 2), (2, 2)], lhs_dilation=lhs_dilation,
                dimension_numbers=dn,
            )
    else:
        def fn(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (stride, stride), pad, dimension_numbers=dn
            )

    return time_fn(fn, x, k) * 1e3


def main() -> int:
    print("devices:", jax.devices())
    # (name, h, w, cin, cout, kh, kw, stride, lhs_dilation, live_taps)
    # live_taps: fraction of kernel taps that meet real (non-dilation-zero)
    # inputs — 4/16 for the composed 4x4 dilated deconv kernel.
    LAYERS = [
        # s2d stem (shipped): phase-domain conv0/rb0 at half res
        ("conv0 s2d 12->128 @192x640", H // 2, W // 2, 12, 128, 3, 3, 1, None, 1.0),
        ("rb0a s2d 128 @192x640", H // 2, W // 2, 128, 128, 3, 3, 1, None, 1.0),
        ("rb0b s2d 128 @192x640", H // 2, W // 2, 128, 128, 3, 3, 1, None, 1.0),
        ("conv1 s2d 132->64 k2 @192x640", H // 2, W // 2, 132, 64, 2, 2, 1, None, 1.0),
        # encoder
        ("rb1a 64 @192x640", H // 2, W // 2, 64, 64, 3, 3, 1, None, 1.0),
        ("rb1b 64 @192x640", H // 2, W // 2, 64, 64, 3, 3, 1, None, 1.0),
        ("conv2 64->128 s2 @192x640", H // 2, W // 2, 64, 128, 3, 3, 2, None, 1.0),
        ("rb2a 128 @96x320", H // 4, W // 4, 128, 128, 3, 3, 1, None, 1.0),
        ("rb2b 128 @96x320", H // 4, W // 4, 128, 128, 3, 3, 1, None, 1.0),
        ("conv3 128->256 s2 @96x320", H // 4, W // 4, 128, 256, 3, 3, 2, None, 1.0),
        ("rb3a 256 @48x160", H // 8, W // 8, 256, 256, 3, 3, 1, None, 1.0),
        ("rb3b 256 @48x160", H // 8, W // 8, 256, 256, 3, 3, 1, None, 1.0),
        ("conv4 256->256 s2 @48x160", H // 8, W // 8, 256, 256, 3, 3, 2, None, 1.0),
        ("rb4a 256 @24x80", H // 16, W // 16, 256, 256, 3, 3, 1, None, 1.0),
        ("rb4b 256 @24x80", H // 16, W // 16, 256, 256, 3, 3, 1, None, 1.0),
        ("conv5 256->256 s2 @24x80", H // 16, W // 16, 256, 256, 3, 3, 2, None, 1.0),
        ("rb5a 256 @12x40", H // 32, W // 32, 256, 256, 3, 3, 1, None, 1.0),
        ("rb5b 256 @12x40", H // 32, W // 32, 256, 256, 3, 3, 1, None, 1.0),
        ("conv6 256->512 s2 @12x40", H // 32, W // 32, 256, 512, 3, 3, 2, None, 1.0),
        ("rb6a 512 @6x20", H // 64, W // 64, 512, 512, 3, 3, 1, None, 1.0),
        ("rb6b 512 @6x20", H // 64, W // 64, 512, 512, 3, 3, 1, None, 1.0),
        # decoder: dilated-form deconvs (composed 4x4 kernel, 4/16 taps live)
        ("deconv6 512->256 ->12x40", H // 64, W // 64, 512, 256, 4, 4, 1, (2, 2), 0.25),
        ("iconv6 512->256 @12x40", H // 32, W // 32, 512, 256, 3, 3, 1, None, 1.0),
        ("deconv5 256->128 ->24x80", H // 32, W // 32, 256, 128, 4, 4, 1, (2, 2), 0.25),
        ("iconv5 384->256 @24x80", H // 16, W // 16, 384, 256, 3, 3, 1, None, 1.0),
        ("deconv4 256->128 ->48x160", H // 16, W // 16, 256, 128, 4, 4, 1, (2, 2), 0.25),
        ("iconv4 384->256 @48x160", H // 8, W // 8, 384, 256, 3, 3, 1, None, 1.0),
        ("deconv3 256->128 ->96x320", H // 8, W // 8, 256, 128, 4, 4, 1, (2, 2), 0.25),
        ("iconv3 256->128 @96x320", H // 4, W // 4, 256, 128, 3, 3, 1, None, 1.0),
        ("deconv2 128->64 ->192x640", H // 4, W // 4, 128, 64, 4, 4, 1, (2, 2), 0.25),
        ("iconv2 128->64 @192x640", H // 2, W // 2, 128, 64, 3, 3, 1, None, 1.0),
        ("deconv1 64->64 ->384x1280", H // 2, W // 2, 64, 64, 4, 4, 1, (2, 2), 0.25),
        ("iconv1 96->49 @384x1280", H, W, 96, 49, 3, 3, 1, None, 1.0),
        ("logits_1x1 49->49 @384x1280", H, W, 49, 49, 1, 1, 1, None, 1.0),
    ]

    rows = []
    for (name, h, w, cin, cout, kh, kw, stride, dil, live) in LAYERS:
        ms = conv_ms(h, w, cin, cout, kh, kw, stride, dil)
        hout = h * 2 if dil else h // stride
        wout = w * 2 if dil else w // stride
        gmac = hout * wout * cout * cin * kh * kw * live * B / 1e9
        tf = 2 * gmac * 1e9 / (ms * 1e-3) / 1e12
        # ceiling: same spatial shape, channels padded to 128-lane multiples
        cin_p, cout_p = pad128(cin), pad128(cout)
        if (cin_p, cout_p) == (cin, cout):
            ms_p, gmac_p = ms, gmac
        else:
            ms_p = conv_ms(h, w, cin_p, cout_p, kh, kw, stride, dil)
            gmac_p = hout * wout * cout_p * cin_p * kh * kw * live * B / 1e9
        tf_ceiling = 2 * gmac_p * 1e9 / (ms_p * 1e-3) / 1e12
        floor_ms = 2 * gmac * 1e9 / (tf_ceiling * 1e12) * 1e3
        rows.append(dict(
            name=name, ms=ms, gmac=gmac, tf=tf,
            padded=f"{cin_p}->{cout_p}", ms_padded=ms_p,
            tf_ceiling=tf_ceiling, floor_ms=floor_ms,
            pct_of_ceiling=100 * tf / tf_ceiling,
        ))
        print(f"{name:34s} {ms:7.3f} ms {tf:6.1f} TF/s "
              f"(ceil {tf_ceiling:6.1f} @ {cin_p}->{cout_p}, "
              f"floor {floor_ms:6.3f} ms, {100 * tf / tf_ceiling:5.1f}%)")

    total_ms = sum(r["ms"] for r in rows)
    total_floor = sum(r["floor_ms"] for r in rows)
    total_gmac = sum(r["gmac"] for r in rows)
    print(f"\nsum measured (standalone, slope-timed — dispatch floor "
          f"cancelled): {total_ms:.1f} ms")
    print(f"sum conv-bound floors: {total_floor:.1f} ms "
          f"({2 * total_gmac / total_floor:.0f} TF/s effective)")
    print(f"raw-peak floor (all FLOPs at {PEAK_TF:.0f} TF/s): "
          f"{2 * total_gmac * 1e9 / (PEAK_TF * 1e12) * 1e3:.1f} ms")
    print("compare to the measured full fwd (bench.py b8): the gap between "
          "full-fwd and sum-of-floors is lane padding + non-conv ops (MED "
          "head, ELUs, concats) + schedule overhead.")

    out = dict(batch=B, h=H, w=W, peak_tf=PEAK_TF, rows=rows,
               total_ms=total_ms, total_floor_ms=total_floor,
               total_gmac=total_gmac)
    os.makedirs("runs", exist_ok=True)
    with open("runs/roofline.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote runs/roofline.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
