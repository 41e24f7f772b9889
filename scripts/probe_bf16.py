"""Root-cause probe for the bf16 inference slowdown (round-1 VERDICT #4).

Round-1 measurement: bf16 disp-only inference at 384x1280 b8 ran at 123
imgs/s vs 170 fp32 — backwards for a conv net on v5e.  This script
localizes it by timing the full model and its pieces in both dtypes,
batch 8 and batch 1, all with the chained-iteration timing method
(CLAUDE.md: a bare per-call sync costs ~28 ms through the relay).

Usage: python scripts/probe_bf16.py [--quick]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fal_net_tpu.models import create_model
from fal_net_tpu.models.backbone import FalNetBackbone, VARIANTS

H, W = 384, 1280
ITERS = 10


def time_fn(fn, *args, iters=ITERS, repeats=3):
    """Best wall-clock per iteration for a chained fn(x)->same-shape-ish."""

    @jax.jit
    def chained(*a):
        x = a[-1]

        def body(_, carry):
            x, acc = carry
            out = fn(*a[:-1], x)
            acc = acc + jnp.sum(out.astype(jnp.float32))
            x = x + (1e-12 * acc).astype(x.dtype) * jnp.ones_like(x)
            return x, acc

        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
        return acc

    float(chained(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(chained(*args))
        best = min(best, time.time() - t0)
    return best / iters


def probe_full(dtype, batch, s2d_stem=True):
    model = create_model("B", 49, dtype=dtype, s2d_stem=s2d_stem)
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((batch, H, W, 3)).astype(np.float32) * 0.3)
    # init at batch 1: eager init keeps every intermediate alive and OOMs
    # at 384x1280 b16+; the jitted forward itself fits fine
    variables = model.init(jax.random.PRNGKey(0), left[:1], 2.0, 300.0, ret_disp=True)

    def fwd(v, x):
        return model.apply(v, x, 2.0, 300.0, ret_disp=True).disp

    t = time_fn(fwd, variables, left)
    return t


def probe_backbone(dtype, batch, s2d_stem=True):
    bb = FalNetBackbone(VARIANTS["B"], num_out=49, dtype=dtype, s2d_stem=s2d_stem)
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((batch, H, W, 3)).astype(np.float32) * 0.3)
    flow = jnp.full((batch, H, W, 1), 3.0, jnp.float32)
    variables = bb.init(jax.random.PRNGKey(0), left, flow)

    def fwd(v, x):
        return bb.apply(v, x, flow)

    return time_fn(fwd, variables, left)


def main():
    quick = "--quick" in sys.argv
    rows = []

    def rec(name, batch, seconds):
        row = {
            "probe": name,
            "batch": batch,
            "ms": round(seconds * 1e3, 2),
            "imgs_per_s": round(batch / seconds, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    for batch in ([8] if quick else [8, 1]):
        rec("full fp32 s2d", batch, probe_full(jnp.float32, batch))
        rec("full bf16 s2d", batch, probe_full(jnp.bfloat16, batch))
        if not quick:
            rec("full fp32 plain", batch, probe_full(jnp.float32, batch, s2d_stem=False))
            rec("full bf16 plain", batch, probe_full(jnp.bfloat16, batch, s2d_stem=False))
            rec("backbone fp32 s2d", batch, probe_backbone(jnp.float32, batch))
            rec("backbone bf16 s2d", batch, probe_backbone(jnp.bfloat16, batch))

    print(json.dumps({"all": rows}))


if __name__ == "__main__":
    main()
