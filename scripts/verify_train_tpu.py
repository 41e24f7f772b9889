"""On-TPU end-to-end training convergence check (fused kernel fwd+bwd).

Stage-1 self-supervised training on synthetic constant-disparity stereo:
right = left shifted by DISP px, so the loss is minimized when the model
predicts DISP everywhere.  The level table is chosen so DISP is EXACTLY
representable (min 2, max 18, N=9 -> level_4 = 2*9^0.5 = 6.0), and the
images are smooth (low-frequency) so fractional interpolated shifts can
actually reconstruct them — white noise under lerp-shifts has a flat,
misleading loss landscape.

Training must converge there THROUGH the fused Pallas MED kernel's
forward and custom backward on the real chip.  Steps are chained
on-device (lax.scan inside one jit) so the relay's per-call overhead
doesn't dominate.

Run whenever the training path changes (ConvOp/custom VJPs, stages,
state):

    PYTHONPATH=/root/repo python scripts/verify_train_tpu.py [--dtype bf16]

~1 min on a v5e chip (too slow for CPU CI — interpret-mode equivalents
live in tests/test_train.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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
MIN_D, MAX_D = 2.0, 18.0  # level 4 = 2*9^(4/8) = exactly 6.0
CHUNK, CHUNKS = 50, 8  # 400 steps


def smooth_stereo(rng):
    """Low-frequency random stereo pair: right = left shifted DISP px."""
    coarse = rng.random((B, H // 8 + 2, (W + DISP) // 8 + 2, 3)).astype(np.float32)
    import scipy.ndimage as ndi

    wide = np.stack(
        [
            ndi.zoom(c, (8, 8, 1), order=3)[: H, : W + DISP]
            for c in coarse
        ]
    )
    return wide[:, :, :W] - 0.5, wide[:, :, DISP:] - 0.5


def main():
    dtype = jnp.bfloat16 if "bf16" in sys.argv else jnp.float32
    model = create_model("tiny", N_LEVELS, dtype=dtype)
    rng = np.random.default_rng(0)
    left_np, right_np = smooth_stereo(rng)
    left, right = jnp.asarray(left_np), jnp.asarray(right_np)

    params = model.init(jax.random.PRNGKey(0), left, MIN_D, MAX_D, ret_disp=True)
    tx = optax.adam(5e-4, b1=0.5)
    opt_state = tx.init(params)

    def one_step(carry, _):
        params, opt_state = carry

        def loss_fn(p):
            return stage1_loss(
                p, {"left": left, "right": right}, model.apply,
                min_disp=MIN_D, max_disp=MAX_D, a_p=0.0, a_sm=0.2 * 2 / 512,
                vgg_fn=None,
            )

        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return (optax.apply_updates(params, upd), opt_state), loss

    @jax.jit
    def run_chunk(params, opt_state):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), None, length=CHUNK
        )
        return params, opt_state, losses[-1]

    t0 = time.time()
    for k in range(CHUNKS):
        params, opt_state, loss = run_chunk(params, opt_state)
        print(f"step {(k + 1) * CHUNK}: loss {float(loss):.4f}", flush=True)

    disp = model.apply(params, left, MIN_D, MAX_D, ret_disp=True).disp
    med = float(jnp.median(disp))
    levels = np.asarray(disparity_levels(MIN_D, MAX_D, N_LEVELS))
    print(
        f"median disp {med:.2f}, target {DISP}px (exact level), "
        f"levels {np.round(levels, 2)}, {time.time() - t0:.0f}s, "
        f"dtype={jnp.dtype(dtype).name}"
    )
    # converged to the target level within half the local level spacing
    spacing = levels[5] - levels[4]
    assert abs(med - DISP) < spacing / 2, (med, DISP, spacing)
    print("TRAIN VERIFY: PASS")


if __name__ == "__main__":
    main()
