"""Disp-only MED head optimization probes — MEASURED DEAD END (round 3).

A profiler trace of the batch-8 384x1280 disp-only forward named the
softmax `div` fusion (8.7 ms) + expectation reduce (3.2 ms) as the top
non-conv ops, suggesting ~12 ms of head fat.  Three attacks, all measured
on the real chip:

  standalone [8,384,1280,49] head (slope-timed, relay cancelled):
    softmax+einsum (shipped)          5.45 ms
    two-reduce (no softmax in HBM)    5.27 ms
    dot with [N,2] (levels|ones)      4.46 ms  (bf16 MXU dot: 0.96 px off)
    Pallas plane-major kernel         3.26 ms  (+transpose ~= free standalone)
    Pallas channel-minor (N in lanes)13.88 ms  (49/128 lane masking + relayout)

  IN-MODEL full forward (the number that matters):
    shipped softmax+einsum            40.2 ms   <- fastest
    two-reduce                        47.1 ms
    Pallas plane-major (+transpose)   48.0 ms

Lesson: the trace's per-op times are inflated/serialised under profiling;
in the real schedule XLA fuses the head into the iconv1+logits_1x1
convolution epilogue (one `convolution_add_fusion` computes BOTH convs)
and overlaps the lane-reduces, so there is no 12 ms to claim.  Both
rewrites BREAK that fusion: the two-reduce form splits the epilogue, and
pallas_call forces a full (B,H,W,49)->(B,N,H,W) relayout of the conv
output (layout {3,0,2,1}) that costs more than the kernel saves.  Don't
re-attack the disp-only head without an idea that keeps the conv fusion
intact.

    PYTHONPATH=/root/repo python scripts/probe_disp_head.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from fal_net_tpu.models import create_model


def timed(fn, *args, iters=10, reps=3):
    @jax.jit
    def chained(v, x):
        def body(_, carry):
            x, acc = carry
            d = fn(v, x)
            acc = acc + jnp.sum(d)
            x = x + 1e-20 * acc
            return x, acc

        return jax.lax.fori_loop(
            0, iters, body, (x, jnp.zeros((), jnp.float32))
        )[1]

    float(chained(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    model = create_model("B", num_levels=49)
    x = jnp.zeros((1, 384, 1280, 3))
    variables = model.init(jax.random.PRNGKey(0), x, 2.0, 300.0, ret_disp=True)
    xb = jnp.asarray(
        np.random.default_rng(0).random((8, 384, 1280, 3), np.float32) - 0.45
    )
    fwd = lambda v, x: model.apply(v, x, 2.0, 300.0, ret_disp=True).disp
    t = timed(fwd, variables, xb)
    print(f"shipped disp-only fwd batch8 384x1280: {t:.2f} ms "
          f"({8 / t * 1000:.1f} imgs/s)")


if __name__ == "__main__":
    main()
