"""Verify the bf16 MED-head boundary fix + pin the fp32-conv-precision story.

Part 2 of the round-1 VERDICT #4 investigation (scripts/probe_bf16.py
localized the bf16 slowdown to the fp32 MED head boundary: backbone bf16
== fp32, full model bf16 +17 ms).

a) bf16 full model with the logits conv emitting fp32 via
   preferred_element_type (no convert/relayout) — expect ~47 ms.
b) fp32 full model under default_matmul_precision('highest') — if convs
   drop to ~half speed, it confirms fp32 convs already run the MXU in
   bf16-pass mode by default, i.e. bf16 can't beat fp32 on FLOPs here.

Usage: PYTHONPATH=/root/repo python scripts/probe_bf16_fix.py
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from probe_bf16 import probe_full, H, W


def main():
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

    rec("full bf16 s2d (fp32-accum logits)", 8, probe_full(jnp.bfloat16, 8))
    rec("full fp32 s2d (after fix, control)", 8, probe_full(jnp.float32, 8))
    with jax.default_matmul_precision("highest"):
        rec("full fp32 s2d precision=highest", 8, probe_full(jnp.float32, 8))

    print(json.dumps({"all": rows}))


if __name__ == "__main__":
    main()
