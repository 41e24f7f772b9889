"""A/B the trace-time fusion flags in the FULL forward on the real chip.

Three exact (reassociation-only) rewrites, each behind a default-off flag:

  * fuse_logits        — compose the linear iconv1 + logits_1x1 convs into
                         one 3x3 conv (deletes the 1x1's full-res MXU pass;
                         cycle model predicts ~ -1.3 ms of the 39.7 ms fwd)
  * stem_flow_analytic — conv1 as split-sum: x0_s part reads 1 exact input
                         register (the 132-ch concat pads to 2) + closed-
                         form constant-flow term (predicts ~2x on conv1's
                         4.7 ms)
  * stem_input_fuse    — conv0 reads the raw image via one stride-2 4x4
                         conv, no s2d(image) copy (cycle model predicts
                         16/9 slower, but conv0 measures transpose-bound
                         at 12% of its register ceiling — could go either
                         way)

Standalone wins have evaporated in-model before (probe_disp_head.py,
probe_split_fuse.py) — this times the complete 384x1280 forward per flag,
slope-timed, identical parameters, then the best combo at bf16 b48 and
the b56/b64 OOM boundary.

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


# flags default ON since round 5 — "baseline" pins the round-4 ship
# config (all off) explicitly so the A/B stays meaningful.
OFF = {"fuse_logits": False, "stem_flow_analytic": False,
       "stem_input_fuse": False}
CONFIGS = [
    ("baseline", dict(OFF)),
    ("fuse_logits", dict(OFF, fuse_logits=True)),
    ("flow_analytic", dict(OFF, stem_flow_analytic=True)),
    ("input_fuse", dict(OFF, stem_input_fuse=True)),
    ("all_on", {}),
]


def main() -> int:
    print("devices:", jax.devices())
    rng = np.random.RandomState(0)
    base = rng.rand(8, H, W, 3).astype(np.float32) * 0.3
    x1, x8 = jnp.asarray(base[:1]), jnp.asarray(base)

    ref = create_model("B", **OFF)
    variables = ref.init(jax.random.PRNGKey(0), x1, 2.0, 300.0)
    d_ref = ref.apply(variables, x1, 2.0, 300.0).disp

    results = {}
    for name, kw in CONFIGS:
        m = create_model("B", **kw)
        if name != "baseline":
            # px-scale maxdiff at random init is softmax near-tie
            # amplification of single-pass-bf16 conv noise, NOT rewrite
            # error — see scripts/probe_fuse_drift.py's CPU control.
            d = m.apply(variables, x1, 2.0, 300.0).disp
            print(f"{name:14s} disp maxdiff vs baseline: "
                  f"{float(jnp.abs(d - d_ref).max()):.2e} px")
        ms = time_fwd(m, variables, x8)
        results[name] = ms
        rel = results["baseline"] / ms
        print(f"fp32 b8 {name:14s} {ms:7.2f} ms/batch "
              f"({8 / ms * 1e3:6.1f} imgs/s)  ({rel:4.2f}x)")

    # bf16 serving config: baseline vs the all-on combo, then push the
    # OOM boundary with the memory-lean flags.
    x48 = jnp.concatenate([x8] * 6)
    for name, kw in [CONFIGS[0], CONFIGS[-1]]:
        mb = create_model("B", dtype=jnp.bfloat16, **kw)
        ms = time_fwd(mb, variables, x48, lo=2, hi=10)
        print(f"bf16 b48 {name:14s} {ms:7.2f} ms/batch "
              f"({48 / ms * 1e3:6.1f} imgs/s)")

    mb = create_model("B", dtype=jnp.bfloat16, **CONFIGS[-1][1])
    for b in (56, 64):
        xb = jnp.concatenate([x8] * ((b + 7) // 8))[:b]
        try:
            ms = time_fwd(mb, variables, xb, lo=2, hi=10)
            print(f"bf16 b{b} all_on: {ms:7.2f} ms/batch "
                  f"({b / ms * 1e3:6.1f} imgs/s)")
        except Exception as e:
            print(f"bf16 b{b} all_on: FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
