"""A/B the input-fused s2d stem in the FULL forward on the real chip.

``stem_input_fuse`` collapses conv0+space_to_depth into one stride-2 4x4
conv over the RAW image (2.25x fewer conv0 MACs, no s2d transpose copy)
and runs conv1 as a split-sum (phase-domain x0_s part + raw full-res flow
part), skipping the 132-lane concat.  Standalone wins have evaporated
in-model before (probe_disp_head.py, probe_split_fuse.py) — this times the
complete 384x1280 forward both ways, slope-timed, identical parameters:

  * fp32 b8  (the bench headline config)
  * bf16 b48 (the best-throughput serving config)
  * bf16 b56 / b64 with the fuse ON (the old stem OOMs there; the fuse
    removes some of the padded HBM — check whether the boundary moves)

    PYTHONPATH=/root/repo python scripts/probe_stem_fuse.py
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

H, W = 384, 1280


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
    base = rng.rand(8, H, W, 3).astype(np.float32) * 0.3

    m_old = create_model("B", stem_input_fuse=False)
    m_new = create_model("B", stem_input_fuse=True)
    x1 = jnp.asarray(base[:1])
    variables = m_old.init(jax.random.PRNGKey(0), x1, 2.0, 300.0)

    d0 = m_old.apply(variables, x1, 2.0, 300.0).disp
    d1 = m_new.apply(variables, x1, 2.0, 300.0).disp
    print(f"disp maxdiff old vs fused stem: "
          f"{float(jnp.abs(d0 - d1).max()):.2e} px")

    x8 = jnp.asarray(base)
    ms0 = time_fwd(m_old, variables, x8)
    ms1 = time_fwd(m_new, variables, x8)
    print(f"fp32 b8 old stem:   {ms0:7.2f} ms/batch ({8 / ms0 * 1e3:6.1f} imgs/s)")
    print(f"fp32 b8 fused stem: {ms1:7.2f} ms/batch ({8 / ms1 * 1e3:6.1f} imgs/s)"
          f"  ({ms0 / ms1:4.2f}x)")

    mb_old = create_model("B", dtype=jnp.bfloat16, stem_input_fuse=False)
    mb_new = create_model("B", dtype=jnp.bfloat16, stem_input_fuse=True)
    x48 = jnp.concatenate([x8] * 6)
    ms0 = time_fwd(mb_old, variables, x48, lo=2, hi=10)
    ms1 = time_fwd(mb_new, variables, x48, lo=2, hi=10)
    print(f"bf16 b48 old stem:   {ms0:7.2f} ms/batch ({48 / ms0 * 1e3:6.1f} imgs/s)")
    print(f"bf16 b48 fused stem: {ms1:7.2f} ms/batch ({48 / ms1 * 1e3:6.1f} imgs/s)"
          f"  ({ms0 / ms1:4.2f}x)")

    for b in (56, 64):
        xb = jnp.concatenate([x8] * ((b + 7) // 8))[:b]
        try:
            ms = time_fwd(mb_new, variables, xb, lo=2, hi=10)
            print(f"bf16 b{b} fused stem: {ms:7.2f} ms/batch "
                  f"({b / ms * 1e3:6.1f} imgs/s)")
        except Exception as e:
            print(f"bf16 b{b} fused stem: FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
