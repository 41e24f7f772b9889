"""Batch-size saturation sweep for the 384x1280 FAL_netB N=49 forward.

Round-4 measurements on one v5e chip (chained-iteration timing from
bench.py — the ~28 ms relay sync cancels):

    fp32 b8   201.7 imgs/s   (the bench headline, kept for comparability)
    fp32 b16  215.8
    fp32 b24  225.4          <- fp32 peak
    fp32 b32  221.9
    bf16 b32  237.7
    bf16 b48  244.1          <- overall best-throughput serving config
    bf16 b56+ OOM: 17.6G > 15.75G HBM; the largest allocation is the
              s2d-stem transpose copy (bf16[B,192,2,640,2,32], 4x lane
              padding) plus the full-res deconv1 output (2x padding).

bench.py's bf16_best secondary reports the b48 config.  Run:

    PYTHONPATH=/root/repo python scripts/probe_batch_sweep.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _time_chained
from fal_net_tpu.models import create_model

H, W = 384, 1280
SWEEP = [
    ("fp32", 8), ("fp32", 16), ("fp32", 24), ("fp32", 32),
    ("bf16", 32), ("bf16", 48),
]


def main() -> None:
    rng = np.random.default_rng(0)
    base = rng.standard_normal((8, H, W, 3)).astype(np.float32) * 0.3

    model_fp32 = create_model("B", 49)
    model_bf16 = create_model("B", 49, dtype=jnp.bfloat16)
    variables = model_fp32.init(
        jax.random.PRNGKey(0), jnp.asarray(base[:1]), 2.0, 300.0
    )

    for dtype, b in SWEEP:
        model = model_bf16 if dtype == "bf16" else model_fp32
        x = jnp.concatenate([jnp.asarray(base)] * ((b + 7) // 8))[:b]
        iters = 20
        try:
            best = _time_chained(model, variables, x, iters=iters)
        except Exception as e:  # OOM at large batches surfaces as a compile error
            print(f"{dtype} b{b}: FAILED {type(e).__name__}: {str(e)[:120]}")
            continue
        print(
            f"{dtype} b{b}: {iters * b / best:.1f} imgs/s "
            f"({best / iters * 1e3:.2f} ms/batch)",
            flush=True,
        )


if __name__ == "__main__":
    main()
