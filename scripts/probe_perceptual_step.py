"""On-chip timing of the PERCEPTUAL (a_p>0) train steps (VERDICT r4 #4).

The reference's heaviest shipped config runs the VGG19 perceptual term in
every stage (Train_Stage1_K.py:43 a_p=0.01 default; Train_Stage2_K.py the
same through rec_loss).  The last on-chip number for it predates the
round-3 dilated-deconv rewrite (87 ms/step stage-1 fp32, round 2).  This
re-times, post-rewrite:

  * stage-1 full step (grad + Adam) 192x640 b8, a_p=0.01, random-weight
    VGG (weights don't change the cost), fp32 and bf16;
  * stage-2 full step (teacher fwd + student fwd+bwd + masks + mirror +
    VGG) 192x640 b4, fp32 and bf16;
  * the matching a_p=0 steps in the same process for a same-run delta
    (absolute numbers through this relay swing run-to-run; deltas within
    a run are stable).

Wired into `onchip_ritual.sh full`.  ~5 min on a healthy relay.

    python scripts/probe_perceptual_step.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fal_net_tpu.losses.vgg import Vgg19Features
from fal_net_tpu.models import create_model
from fal_net_tpu.train.stages import stage1_loss, stage2_loss

H, W = 192, 640
ITERS = 10


def chain_time(step_fn, params, opt_state, left, repeats=3):
    @jax.jit
    def chained(params, opt_state, left):
        def body(_, c):
            p, s, l, acc = c
            p, s, loss = step_fn(p, s, l)
            return p, s, l + (1e-12 * loss).astype(l.dtype) * jnp.ones_like(l), acc + loss

        out = jax.lax.fori_loop(
            0, ITERS, body, (params, opt_state, left, jnp.float32(0))
        )
        return out[-1]

    float(chained(params, opt_state, left))  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(chained(params, opt_state, left))
        best = min(best, time.time() - t0)
    return best / ITERS * 1e3


def main() -> int:
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    rows = []

    for dtype_name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        vgg = Vgg19Features(dtype=dtype)
        vgg_params = jax.lax.stop_gradient(
            vgg.init(jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 3)))
        )
        vgg_fn = lambda im: vgg.apply(vgg_params, im)

        # ---- stage 1, b8 ----
        b = 8
        left = jnp.asarray(rng.standard_normal((b, H, W, 3)).astype(np.float32) * 0.3)
        right = jnp.asarray(rng.standard_normal((b, H, W, 3)).astype(np.float32) * 0.3)
        model = create_model("B", 49, dtype=dtype)
        params = model.init(jax.random.PRNGKey(0), left, 2.0, 300.0, ret_disp=True)
        tx = optax.adam(1e-4, b1=0.5)

        def make_step(a_p, fn):
            def loss_fn(p, l):
                return stage1_loss(
                    p, {"left": l, "right": right}, model.apply,
                    min_disp=2.0, max_disp=300.0, a_p=a_p,
                    a_sm=0.2 * 2 / 512, vgg_fn=fn,
                )

            def step(p, s, l):
                (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p, l)
                upd, s = tx.update(g, s, p)
                return optax.apply_updates(p, upd), s, loss

            return step

        for label, a_p, fn in (
            ("a_p=0", 0.0, None),
            ("a_p=0.01+vgg", 0.01, vgg_fn),
        ):
            ms = chain_time(make_step(a_p, fn), params, tx.init(params), left)
            rows.append({"probe": f"stage1 b8 {dtype_name} {label}", "ms": round(ms, 1)})
            print(json.dumps(rows[-1]), flush=True)

        # ---- stage 2, b4 (teacher = same arch, frozen copy) ----
        b2 = 4
        left2 = jnp.asarray(rng.standard_normal((b2, H, W, 3)).astype(np.float32) * 0.3)
        right2 = jnp.asarray(rng.standard_normal((b2, H, W, 3)).astype(np.float32) * 0.3)
        t_params = jax.tree.map(lambda x: x + 0.0, params)

        def make_step2(a_p, fn):
            def loss_fn(p, l):
                return stage2_loss(
                    p, {"left": l, "right": right2}, model.apply,
                    model.apply, t_params,
                    min_disp=2.0, max_disp=300.0, a_p=a_p,
                    a_sm=0.4 * 2 / 512, a_mr=1.0, vgg_fn=fn,
                )

            def step(p, s, l):
                (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p, l)
                upd, s = tx.update(g, s, p)
                return optax.apply_updates(p, upd), s, loss

            return step

        for label, a_p, fn in (
            ("a_p=0", 0.0, None),
            ("a_p=0.01+vgg", 0.01, vgg_fn),
        ):
            ms = chain_time(make_step2(a_p, fn), params, tx.init(params), left2)
            rows.append({"probe": f"stage2 b4 {dtype_name} {label}", "ms": round(ms, 1)})
            print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"all": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
