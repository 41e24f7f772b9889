"""Probe bf16 batches past the chained-program compile ceiling (b128).

The round-5 fused-stem sweep (runs/probe_fused_sweep_r05.log) hit
server-side `tpu_compile_helper exit 1` crashes for every CHAINED timing
program above b128 (b136/b144/b160/b192/b256) — but a plain (unchained)
b56 forward compiled fine when its chained form crashed, so the crash is
a property of the big fori_loop program, not the per-batch shapes.

This probe times plain single-batch programs instead, serialized across
dispatches by threading a scalar accumulator (each call consumes the
previous call's on-device output, so the K dispatches cannot overlap and
the wall measures real per-batch time PLUS per-dispatch relay overhead —
a conservative UNDERestimate of on-device throughput, ~30 ms/dispatch
through this tunnel ≈ 10% at these batch sizes).

Run (healthy relay only; each fresh compile can take ~10 min):

    PYTHONPATH=/root/repo python scripts/probe_plain_big_batch.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from fal_net_tpu.models import create_model

H, W = 384, 1280
BATCHES = [128, 136, 144, 160]  # b128 re-timed plain as the control
K = 8  # timed dispatches per batch size


def main() -> None:
    rng = np.random.default_rng(0)
    base = rng.standard_normal((8, H, W, 3)).astype(np.float32) * 0.3
    model = create_model("B", 49, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(base[:1]), 2.0, 300.0)

    @jax.jit
    def step(variables, x, acc):
        disp = model.apply(variables, x + (1e-12 * acc) * jnp.ones_like(x),
                           2.0, 300.0, ret_disp=True).disp
        return acc + jnp.sum(disp)

    for b in BATCHES:
        x = jnp.concatenate([jnp.asarray(base)] * ((b + 7) // 8))[:b]
        try:
            t0 = time.time()
            acc = step(variables, x, jnp.float32(0))
            float(acc)  # compile + warm
            print(f"b{b}: compiled in {time.time() - t0:.0f} s", flush=True)
            best = float("inf")
            for _ in range(3):
                acc = jnp.float32(0)
                t0 = time.time()
                for _ in range(K):
                    acc = step(variables, x, acc)
                float(acc)
                best = min(best, time.time() - t0)
            ms = best / K * 1e3
            print(f"bf16 b{b} plain: {ms:8.2f} ms/batch ({K * b / best:.1f} imgs/s, "
                  f"incl. per-dispatch relay overhead)", flush=True)
        except Exception as e:
            print(f"bf16 b{b} plain FAILED: {type(e).__name__}: {str(e)[:140]}",
                  flush=True)


if __name__ == "__main__":
    main()
