"""Benchmark: FAL_netB (N=49) disparity inference at 384x1280 on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec, "unit": "imgs/sec", "vs_baseline": ratio}

Baseline: the reference PyTorch implementation on CPU (the only hardware the
reference can run in this environment), disp-only forward, measured in this
container on 2026-08-16: 4753 ms/img = 0.210 imgs/sec (single CPU core,
torch 2.13 fp32).  BASELINE.json's north-star asks >= 5x this.

Timing note: on the axon TPU backend `block_until_ready` does not reliably
block (relay dispatch), so each timed iteration fetches a scalar reduction
of the output — the printed number therefore INCLUDES one device->host
scalar round-trip per image, i.e. it is a conservative lower bound.
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
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32) * 0.3)
    variables = model.init(jax.random.PRNGKey(0), left, 2.0, 300.0, ret_disp=True)

    @jax.jit
    def disp_sum(variables, left):
        out = model.apply(variables, left, 2.0, 300.0, ret_disp=True)
        return out.disp, jnp.sum(out.disp)

    # warmup / compile
    _, s = disp_sum(variables, left)
    float(s)

    iters = 20
    t0 = time.time()
    for _ in range(iters):
        _, s = disp_sum(variables, left)
        float(s)  # forced device->host sync (see module docstring)
    dt = (time.time() - t0) / iters

    value = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "FAL_netB N=49 384x1280 disparity inference, single chip",
                "value": round(value, 3),
                "unit": "imgs/sec",
                "vs_baseline": round(value / TORCH_CPU_BASELINE_IMGS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
