"""Probe 2 for the deconv rewrite: why the 4-phase form regresses
in-model, and whether the single dilated-conv form does better.

  plain:   conv3x3(nearest_up2(x))
  phases:  4 x conv2x2 at source res + interleave   (1.4-1.9x ISOLATED,
           but 169 -> 126 imgs/s IN-MODEL — layout/fusion effects)
  dilated: nearest_up2 = dilate2(x) * ones(2x2)  =>  the whole op is ONE
           conv with lhs_dilation=(2,2) and composed kernel
           K4 = ones(2) (*) W3 per axis (4x4) — native XLA transposed-conv
           structure, no manual interleave.

Also times the FULL FAL_netB forward with phase_deconv on/off to pin the
in-model numbers.

    PYTHONPATH=/root/repo python scripts/proto_phase_deconv2.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from scripts.proto_phase_deconv import phase_deconv, plain_deconv, time_fn


def composed_kernel(w3):
    """K4[t, u] = sum_{r,s in {0,1}} W3[t-r, u-s] (ones2x2 correlated with
    W3): (3,3,Ci,Co) -> (4,4,Ci,Co)."""
    k = jnp.zeros((4, 4) + w3.shape[2:], w3.dtype)
    for t in range(4):
        for u in range(4):
            acc = 0
            for r in (0, 1):
                for s in (0, 1):
                    a, b = t - r, u - s
                    if 0 <= a < 3 and 0 <= b < 3:
                        acc = acc + w3[a, b]
            k = k.at[t, u].set(acc)
    return k


def dilated_deconv(x, w3):
    k4 = composed_kernel(w3)
    # padding (2,2) on the dilated grid gives exactly (2H, 2W) output and
    # matches the plain path (verified in the sweep below / on CPU)
    y = jax.lax.conv_general_dilated(
        x, k4, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y


def main():
    rng = np.random.default_rng(0)
    # correctness sweep of the padding offset on a small case
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 3)), jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((3, 3, 3, 2)) * 0.1, jnp.float32)
    ref = np.asarray(plain_deconv(x, w3))
    for pt in ((2, 1), (1, 2), (2, 2), (1, 1)):
        y = jax.lax.conv_general_dilated(
            x, composed_kernel(w3), (1, 1), (pt, pt), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = np.asarray(y)
        if y.shape == ref.shape:
            err = np.abs(y - ref).max()
            print(f"pad {pt}: shape {y.shape}, err {err:.2e}", flush=True)
        else:
            print(f"pad {pt}: shape {y.shape} (want {ref.shape})", flush=True)

    cases = [
        ("deconv1 64->64 192x640", 8, 192, 640, 64, 64),
        ("deconv2 128->64 96x320", 8, 96, 320, 128, 64),
    ]
    for name, b, h, w, cin, cout in cases:
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
        w3 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.float32)
        t_plain = time_fn(jax.jit(plain_deconv), x, w3)
        t_phase = time_fn(jax.jit(phase_deconv), x, w3)
        t_dil = time_fn(jax.jit(dilated_deconv), x, w3)
        print(
            f"{name}: plain {t_plain:.2f} phase {t_phase:.2f} "
            f"dilated {t_dil:.2f} ms",
            flush=True,
        )

    # full-model A/B
    from fal_net_tpu.models import create_model

    left = jnp.asarray(rng.standard_normal((8, 384, 1280, 3)) * 0.3, jnp.float32)
    for flag in (True, False):
        model = create_model("B", 49, phase_deconv=flag)
        v = model.init(jax.random.PRNGKey(0), left[:1], 2.0, 300.0, ret_disp=True)

        def fwd(x_, v_):  # image first: time_fn threads arg 0 through the loop
            return model.apply(v_, x_, 2.0, 300.0, ret_disp=True).disp

        t = time_fn(jax.jit(fwd), left, v, iters=10)
        print(f"full model phase_deconv={flag}: {t:.2f} ms/batch8", flush=True)


if __name__ == "__main__":
    main()
