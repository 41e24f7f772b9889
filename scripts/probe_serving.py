"""Serving-side probes: bf16 batch sweep + real pipeline sustained rate.

a) bf16 inference at batch 16/32 (fp32 numbers: 178 / 184 imgs/s) — is
   bf16+big-batch the throughput config?
b) DisparityPipeline.run end-to-end on the real chip with in-memory
   images: includes host batching, H2D staging, and D2H disparity
   fetches — the number a serving user actually sees (bench.py measures
   pure on-device compute).

Usage: PYTHONPATH=/root/repo python scripts/probe_serving.py
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/scripts")
from probe_bf16 import probe_full  # noqa: E402

from fal_net_tpu.eval.pipeline import DisparityPipeline  # noqa: E402
from fal_net_tpu.models import create_model  # noqa: E402

H, W = 384, 1280


def pipeline_rate(batch=8, n_images=64):
    model = create_model("B", 49)
    rng = np.random.default_rng(0)
    left1 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), left1, 2.0, 300.0, ret_disp=True)
    imgs = [
        (f"i{i}", (rng.standard_normal((H, W, 3)) * 0.3).astype(np.float32))
        for i in range(n_images)
    ]
    pipe = DisparityPipeline(model, variables, batch_size=batch)
    # warm (compile)
    list(pipe.run(iter(imgs[: 2 * batch])))
    t0 = time.time()
    out = list(pipe.run(iter(imgs)))
    dt = time.time() - t0
    assert len(out) == n_images
    return n_images / dt


def main():
    rows = []

    def rec(name, value, unit="imgs/s"):
        rows.append({"probe": name, "value": round(value, 1), "unit": unit})
        print(json.dumps(rows[-1]), flush=True)

    for b in (16, 32):
        t = probe_full(jnp.bfloat16, b)
        rec(f"infer bf16 384x1280 b{b}", b / t)
    rec("pipeline sustained b8 (host+device)", pipeline_rate(8))

    print(json.dumps({"all": rows}))


if __name__ == "__main__":
    main()
