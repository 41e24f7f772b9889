"""Where does the stage-1 train step's time go?  (192x640 b8, one chip)

Inference runs at ~56% of the fp32 MXU rate but the train step only ~34%
(fwd+bwd ~ 1.8 TF in 50-60 ms).  Split it: loss forward only, grad only,
full step (grad + Adam), full step with remat, and the fused-vs-jnp MED
head inside the training path.

Usage: PYTHONPATH=/root/repo python scripts/probe_train_breakdown.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fal_net_tpu.models import create_model
from fal_net_tpu.train.stages import stage1_loss

B, H, W = 8, 192, 640
ITERS = 10


def chain_time(make_body, carry, repeats=3):
    """Times ITERS chained bodies; the jit returns ONLY the scalar
    accumulator (carry slot -1) — fetching anything bigger through the
    relay (28 ms/transfer + bandwidth) would swamp the measurement."""

    @jax.jit
    def chained(carry):
        def body(_, c):
            return make_body(c)

        out = jax.lax.fori_loop(0, ITERS, body, carry)
        return out[-1]

    float(chained(carry))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(chained(carry))
        best = min(best, time.time() - t0)
    return best / ITERS


def main(dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32) * 0.3)
    right = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32) * 0.3)

    def build(med_impl="auto", remat=False):
        model = create_model("B", 49, dtype=dtype, med_impl=med_impl)
        params = model.init(jax.random.PRNGKey(0), left, 2.0, 300.0, ret_disp=True)

        apply = model.apply
        if remat:
            def apply(p, x, mn, mx, **flags):
                fn = lambda p_, x_: model.apply(p_, x_, mn, mx, **flags)
                return jax.checkpoint(fn)(p, x)

        def loss_fn(p, l, r):
            return stage1_loss(
                p, {"left": l, "right": r}, apply,
                min_disp=2.0, max_disp=300.0, a_p=0.0, a_sm=0.2 * 2 / 512,
                vgg_fn=None,
            )

        return model, params, loss_fn

    rows = []

    def rec(name, sec):
        rows.append({"probe": name, "ms": round(sec * 1e3, 2)})
        print(json.dumps(rows[-1]), flush=True)

    # 1. loss forward only
    model, params, loss_fn = build()

    def fwd_body(c):
        l, acc = c
        loss, aux = loss_fn(params, l, right)
        return l + (1e-12 * loss).astype(l.dtype) * jnp.ones_like(l), acc + loss

    rec("loss fwd only", chain_time(fwd_body, (left, jnp.float32(0))))

    # 2. value_and_grad, no optimizer
    def grad_body(c):
        l, acc = c
        (loss, aux), g = jax.value_and_grad(
            lambda p: loss_fn(p, l, right), has_aux=True
        )(params)
        gsum = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g))
        return l + (1e-20 * gsum).astype(l.dtype) * jnp.ones_like(l), acc + loss

    rec("fwd+bwd", chain_time(grad_body, (left, jnp.float32(0))))

    # 3. full step (grad + Adam)
    tx = optax.adam(1e-4, b1=0.5)

    def full_step(params, opt_state, l):
        (loss, aux), g = jax.value_and_grad(
            lambda p: loss_fn(p, l, right), has_aux=True
        )(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    def step_body(c):
        p, s, l, acc = c
        p, s, loss = full_step(p, s, l)
        return p, s, l + (1e-12 * loss).astype(l.dtype) * jnp.ones_like(l), acc + loss

    opt_state = tx.init(params)
    rec("full step", chain_time(step_body, (params, opt_state, left, jnp.float32(0))))

    # 4. full step with remat
    model_r, params_r, loss_r = build(remat=True)

    def full_step_r(params, opt_state, l):
        (loss, aux), g = jax.value_and_grad(
            lambda p: loss_r(p, l, right), has_aux=True
        )(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    def step_body_r(c):
        p, s, l, acc = c
        p, s, loss = full_step_r(p, s, l)
        return p, s, l + (1e-12 * loss).astype(l.dtype) * jnp.ones_like(l), acc + loss

    rec("full step remat", chain_time(step_body_r, (params_r, tx.init(params_r), left, jnp.float32(0))))

    # 5. full step with the jnp MED head (how much does the fused kernel buy
    # inside training now?)
    model_j, params_j, loss_j = build(med_impl="reference")

    def full_step_j(params, opt_state, l):
        (loss, aux), g = jax.value_and_grad(
            lambda p: loss_j(p, l, right), has_aux=True
        )(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    def step_body_j(c):
        p, s, l, acc = c
        p, s, loss = full_step_j(p, s, l)
        return p, s, l + (1e-12 * loss).astype(l.dtype) * jnp.ones_like(l), acc + loss

    rec("full step jnp-med", chain_time(step_body_j, (params_j, tx.init(params_j), left, jnp.float32(0))))

    print(json.dumps({"all": rows, "dtype": str(dtype.__name__ if hasattr(dtype, '__name__') else dtype)}))


if __name__ == "__main__":
    main()
