"""Probe: phase-decomposed deconv vs plain XLA conv-on-upsampled.

The decoder's ``Deconv`` is nearest-2x-upsample + 3x3 conv
(models/layers.py:200, reference FAL_netB.py:51-60).  On the upsampled
grid every 3x3 window touches at most 2x2 DISTINCT source pixels, so the
op factorizes EXACTLY into 4 phase convs with collapsed 2x2 kernels at
source resolution + a depth-to-space interleave:

  output row 2i   reads source rows {i-1, i}: row-weights (W[-1], W[0]+W[1])
  output row 2i+1 reads source rows {i, i+1}: row-weights (W[-1]+W[0], W[1])
  (same per column) => 4 * (2*2) = 16 MACs/source-pos vs 4 * 9 = 36 naive
  = 2.25x fewer FLOPs on deconv1..3 (~9% of the model forward).

The question is whether the 4-conv + interleave structure beats one fused
XLA conv in practice (the s2d-tail lesson: relayouts can eat the math).

    PYTHONPATH=/root/repo python scripts/proto_phase_deconv.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def collapse_kernel(w3, di, dj):
    """w3: (3, 3, Cin, Cout) HWIO -> collapsed (2, 2, Cin, Cout) for
    output phase (di, dj).  Index groups per phase (offset a in {-1,0,1}
    maps to source-tap group 0 or 1):
      phase 0: {-1} -> tap 0, {0, 1} -> tap 1
      phase 1: {-1, 0} -> tap 0, {1} -> tap 1
    """
    groups = {
        0: ([0], [1, 2]),  # kernel index 0 == offset -1
        1: ([0, 1], [2]),
    }
    rg, cg = groups[di], groups[dj]
    k = jnp.zeros((2, 2) + w3.shape[2:], w3.dtype)
    for r in (0, 1):
        for c in (0, 1):
            k = k.at[r, c].set(sum(w3[a, b] for a in rg[r] for b in cg[c]))
    return k


def phase_deconv(x, w3):
    """Exact nearest-2x-upsample + conv3x3(zero pad) via 4 phase convs."""
    dn = ("NHWC", "HWIO", "NHWC")
    phases = []
    # phase 0 taps rows {i-1, i} (pad top), phase 1 taps {i, i+1} (pad bottom)
    pad = {0: (1, 0), 1: (0, 1)}
    for di in (0, 1):
        for dj in (0, 1):
            k = collapse_kernel(w3, di, dj)
            phases.append(
                jax.lax.conv_general_dilated(
                    x, k, (1, 1), (pad[di], pad[dj]), dimension_numbers=dn
                )
            )
    # interleave: out[2i+di, 2j+dj] = phases[di*2+dj][i, j]
    b, h, w, f = phases[0].shape
    stacked = jnp.stack(phases, axis=-2)  # (B,H,W,4,F), order (di,dj)
    out = stacked.reshape(b, h, w, 2, 2, f)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, f)
    return out


def plain_deconv(x, w3):
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    dn = ("NHWC", "HWIO", "NHWC")
    return jax.lax.conv_general_dilated(
        up, w3, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
    )


def time_fn(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out))  # warm + sync

    @jax.jit
    def chained(*a):
        def body(_, carry):
            x, acc = carry
            o = fn(x, *a[1:])
            acc = acc + jnp.sum(o)
            x = x + 1e-12 * acc
            return x, acc

        _, acc = jax.lax.fori_loop(0, iters, body, (a[0], jnp.float32(0)))
        return acc

    float(chained(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(chained(*args))
        best = min(best, time.time() - t0)
    return best / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    # FAL_netB decoder shapes at 384x1280 batch 8 (deconv1..3)
    cases = [
        ("deconv1 64->64 192x640->384x1280", 8, 192, 640, 64, 64),
        ("deconv2 128->64 96x320->192x640", 8, 96, 320, 128, 64),
        ("deconv3 256->128 48x160->96x320", 8, 48, 160, 256, 128),
    ]
    for name, b, h, w, cin, cout in cases:
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
        w3 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.float32)
        ref = np.asarray(jax.jit(plain_deconv)(x, w3))
        got = np.asarray(jax.jit(phase_deconv)(x, w3))
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        t_plain = time_fn(jax.jit(plain_deconv), x, w3)
        t_phase = time_fn(jax.jit(phase_deconv), x, w3)
        print(
            f"{name}: rel-err {err:.2e}, plain {t_plain:.3f} ms, "
            f"phase {t_phase:.3f} ms ({t_plain / t_phase:.2f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
