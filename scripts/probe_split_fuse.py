"""A/B the split-sum decoder fuse in the FULL forward on the real chip.

Standalone, split-sum iconv3/5 beat concat-then-conv by 1.46x/3.08x
(probe_concat_conv.py) because the concat materializes in HBM; but
standalone wins here have evaporated in-model before (probe_disp_head.py:
XLA's schedule fuses and overlaps what the trace blames).  This probe
times the complete 384x1280 b8 forward with ``split_fuse`` off vs on,
slope-timed, identical parameters.

    PYTHONPATH=/root/repo python scripts/probe_split_fuse.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fal_net_tpu.models import create_model

B, H, W = 8, 384, 1280


def time_fwd(model, variables, x, lo=4, hi=24, repeats=3):
    @jax.jit
    def chained(n, v, x):
        def body(_, carry):
            x, acc = carry
            disp = model.apply(v, x, 2.0, 300.0).disp
            acc = acc + jnp.sum(disp)
            x = x + (1e-12 * acc) * jnp.ones_like(x)
            return x, acc

        x, acc = jax.lax.fori_loop(0, n, body, (x, jnp.zeros((), jnp.float32)))
        return acc

    float(chained(lo, variables, x))
    float(chained(hi, variables, x))

    def best(n):
        b = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(chained(n, variables, x))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(hi) - best(lo)) / (hi - lo) * 1e3


def main() -> int:
    print("devices:", jax.devices())
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    m0 = create_model("B")
    m1 = create_model("B", split_fuse=True)
    variables = m0.init(jax.random.PRNGKey(0), x[:1], 2.0, 300.0)

    d0 = m0.apply(variables, x[:1], 2.0, 300.0).disp
    d1 = m1.apply(variables, x[:1], 2.0, 300.0).disp
    print(f"disp maxdiff concat vs split: "
          f"{float(jnp.abs(d0 - d1).max()):.2e} px")

    ms0 = time_fwd(m0, variables, x)
    ms1 = time_fwd(m1, variables, x)
    print(f"full fwd b8 concat-fuse: {ms0:7.2f} ms/batch "
          f"({B / ms0 * 1e3:6.1f} imgs/s)")
    print(f"full fwd b8 split-fuse:  {ms1:7.2f} ms/batch "
          f"({B / ms1 * 1e3:6.1f} imgs/s)  ({ms0 / ms1:4.2f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
