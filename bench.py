"""Benchmark: FAL_netB (N=49) disparity inference at 384x1280 on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec, "unit": "imgs/sec", "vs_baseline": ratio}

Baseline: the reference PyTorch implementation on CPU (the only hardware the
reference can run in this environment), disp-only forward, measured in this
container on 2026-08-16: 4753 ms/img = 0.210 imgs/sec (single CPU core,
torch 2.13 fp32).  BASELINE.json's north-star asks >= 5x this.

Timing method: K forward passes are chained ON DEVICE inside one jit (each
iteration's input depends on the previous output, so nothing can be elided
or overlapped away), then one device->host sync.  A bare per-call sync
through this environment's TPU relay costs ~28 ms and would otherwise
dominate; chaining measures sustained single-image throughput, i.e. how a
pipelined serving loop actually runs.
"""

import json
import time

import numpy as np

TORCH_CPU_BASELINE_IMGS_PER_SEC = 0.210


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fal_net_tpu.models import create_model

    model = create_model("B", 49)
    h, w = 384, 1280
    batch = 8  # sustained serving throughput; batch-1 latency is ~12 ms
    rng = np.random.default_rng(0)
    left = jnp.asarray(
        rng.standard_normal((batch, h, w, 3)).astype(np.float32) * 0.3
    )
    variables = model.init(jax.random.PRNGKey(0), left, 2.0, 300.0, ret_disp=True)

    iters = 10

    @jax.jit
    def chained(variables, left):
        def body(_, carry):
            x, acc = carry
            disp = model.apply(variables, x, 2.0, 300.0, ret_disp=True).disp
            acc = acc + jnp.sum(disp)
            # serialize iterations with a data dependency
            x = x + (1e-12 * acc) * jnp.ones_like(x)
            return x, acc

        _, acc = jax.lax.fori_loop(0, iters, body, (left, jnp.float32(0)))
        return acc

    float(chained(variables, left))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(chained(variables, left))
        best = min(best, time.time() - t0)
    value = iters * batch / best

    print(
        json.dumps(
            {
                "metric": (
                    "FAL_netB N=49 384x1280 disparity maps/sec, single chip "
                    f"(batch {batch}, fp32)"
                ),
                "value": round(value, 3),
                "unit": "imgs/sec",
                "vs_baseline": round(value / TORCH_CPU_BASELINE_IMGS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
