"""On-TPU end-to-end training convergence check (fused kernel fwd+bwd).

Stage-1 self-supervised training on synthetic constant-disparity stereo:
right = left shifted by DISP px, so the loss is minimized when the model
predicts DISP everywhere.  With coarse exponential levels the best
representable disparity is the nearest plane level; training must
converge there THROUGH the fused Pallas MED kernel's forward and custom
backward on the real chip.

Run whenever the training path changes (ConvOp/custom VJPs, stages,
state):

    PYTHONPATH=/root/repo python scripts/verify_train_tpu.py [--dtype bf16]

~30 s on a v5e chip (too slow for CPU CI — interpret-mode equivalents
live in tests/test_train.py).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fal_net_tpu.models import create_model
from fal_net_tpu.ops.med import disparity_levels
from fal_net_tpu.train.stages import stage1_loss

DISP = 6
H, W, B = 64, 128, 4
N_LEVELS = 9
MIN_D, MAX_D = 2.0, 24.0
STEPS = 400


def main():
    dtype = jnp.bfloat16 if "--dtype" in sys.argv and "bf16" in sys.argv else jnp.float32
    model = create_model("tiny", N_LEVELS, dtype=dtype)
    rng = np.random.default_rng(0)
    wide = rng.random((B, H, W + DISP, 3)).astype(np.float32)
    left = jnp.asarray(wide[:, :, :W] - 0.5)
    right = jnp.asarray(wide[:, :, DISP:] - 0.5)

    params = model.init(jax.random.PRNGKey(0), left, MIN_D, MAX_D, ret_disp=True)
    tx = optax.adam(2e-4, b1=0.5)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, left, right):
        def loss_fn(p):
            return stage1_loss(
                p, {"left": left, "right": right}, model.apply,
                min_disp=MIN_D, max_disp=MAX_D, a_p=0.0, a_sm=0.2 * 2 / 512,
                vgg_fn=None,
            )

        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    t0 = time.time()
    for i in range(STEPS):
        params, opt_state, loss = step(params, opt_state, left, right)
        if i % 100 == 0:
            print(f"step {i}: loss {float(loss):.4f}", flush=True)

    disp = model.apply(params, left, MIN_D, MAX_D, ret_disp=True).disp
    med = float(jnp.median(disp))
    levels = np.asarray(disparity_levels(MIN_D, MAX_D, N_LEVELS))
    nearest = float(levels[np.argmin(np.abs(levels - DISP))])
    print(
        f"median disp {med:.2f}, nearest representable level {nearest:.2f}, "
        f"target {DISP}px, {time.time() - t0:.0f}s, dtype={dtype.__name__}"
    )
    # converged to within half a level spacing of the nearest plane
    spacing = nearest * (levels[1] / levels[0] - 1.0)
    assert abs(med - nearest) < max(spacing, 1.0), (med, nearest, spacing)
    print("TRAIN VERIFY: PASS")


if __name__ == "__main__":
    main()
