"""Round-2 perf follow-ups after the logits fp32-accum fix.

a) stage-1 train step at 192x640 b8, fp32 vs bf16 — the old numbers
   (65 / 49 ms) predate the MED-head boundary fix; the bf16 loss path
   consumes the fp32 head outputs (pan + disp), so the convert/relayout
   also sat inside the training step.
b) inference throughput at batch 16 and 32 (fp32) — is batch 8 the right
   headline batch?

Usage: PYTHONPATH=/root/repo python scripts/probe_round2_perf.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from fal_net_tpu.models import create_model
from fal_net_tpu.train.stages import stage1_loss


def bench_train_step(dtype, batch=8, h=192, w=640, iters=10, repeats=3):
    import optax

    model = create_model("B", 49, dtype=dtype)
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((batch, h, w, 3)).astype(np.float32) * 0.3)
    right = jnp.asarray(rng.standard_normal((batch, h, w, 3)).astype(np.float32) * 0.3)
    params = model.init(jax.random.PRNGKey(0), left, 2.0, 300.0, ret_disp=True)
    tx = optax.adam(1e-4, b1=0.5)
    opt_state = tx.init(params)

    def one_step(params, opt_state, left, right):
        def loss_fn(p):
            return stage1_loss(
                p,
                {"left": left, "right": right},
                model.apply,
                min_disp=2.0,
                max_disp=300.0,
                a_p=0.0,
                a_sm=0.2 * 2 / 512,
                vgg_fn=None,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def chained(params, opt_state, left, right):
        def body(_, carry):
            params, opt_state, acc = carry
            params, opt_state, loss = one_step(params, opt_state, left, right)
            return params, opt_state, acc + loss

        params, opt_state, acc = jax.lax.fori_loop(
            0, iters, body, (params, opt_state, jnp.float32(0))
        )
        return acc

    float(chained(params, opt_state, left, right))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(chained(params, opt_state, left, right))
        best = min(best, time.time() - t0)
    return best / iters


def bench_infer(batch, h=384, w=1280, iters=10, repeats=3):
    model = create_model("B", 49)
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((batch, h, w, 3)).astype(np.float32) * 0.3)
    # init at batch 1: eager init keeps every intermediate alive and OOMs
    # at 384x1280 b16+, while the jitted forward itself fits fine
    variables = model.init(jax.random.PRNGKey(0), left[:1], 2.0, 300.0, ret_disp=True)

    @jax.jit
    def chained(variables, left):
        def body(_, carry):
            x, acc = carry
            disp = model.apply(variables, x, 2.0, 300.0, ret_disp=True).disp
            acc = acc + jnp.sum(disp)
            x = x + (1e-12 * acc) * jnp.ones_like(x)
            return x, acc

        _, acc = jax.lax.fori_loop(0, iters, body, (left, jnp.float32(0)))
        return acc

    float(chained(variables, left))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(chained(variables, left))
        best = min(best, time.time() - t0)
    return best / iters


def main():
    rows = []

    def rec(name, seconds, batch=None):
        row = {"probe": name, "ms": round(seconds * 1e3, 2)}
        if batch:
            row["imgs_per_s"] = round(batch / seconds, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    rec("stage1 step fp32 192x640 b8", bench_train_step(jnp.float32))
    rec("stage1 step bf16 192x640 b8", bench_train_step(jnp.bfloat16))
    rec("infer fp32 384x1280 b16", bench_infer(16), batch=16)
    rec("infer fp32 384x1280 b32", bench_infer(32), batch=32)

    print(json.dumps({"all": rows}))


if __name__ == "__main__":
    main()
