"""On-TPU stage-2 (MOM) end-to-end training convergence check.

Extends scripts/verify_train_tpu.py to the full reference chain
(Train_Stage2_K.py:246-331 semantics) on the real chip:

  1. stage-1 self-supervised training on synthetic constant-disparity
     smooth stereo (right = left shifted DISP px) until the model predicts
     DISP everywhere — this becomes the FROZEN TEACHER;
  2. a FRESH student trained with the stage-2 MOM loss: teacher
     disparities for the mirrored pair (stop-gradded), student double
     batch with sub-occlusion masks through the fused Pallas MED kernel's
     forward AND custom backward, occlusion-masked reconstruction +
     smoothness + mirror loss (a_mr=1);
  3. asserts: the stage-2 loss is finite and decreasing, the student's
     occluded-region disparity moves toward the teacher (the mirror-loss
     aux — exactly the normalized occluded-region |student - teacher| gap
     — shrinks by >2x), and the student's median disparity converges to
     the teacher's level.

Steps are chained on-device (lax.scan inside one jit) so the relay's
per-call overhead doesn't dominate.  Run whenever the training path
changes (ConvOp/custom VJPs, stages, state):

    PYTHONPATH=/root/repo python scripts/verify_train_stage2_tpu.py [--dtype bf16]

~2-3 min on a v5e chip (too slow for CPU CI — interpret-mode stage-2
equivalents live in tests/test_stages.py / tests/test_train.py).
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
from fal_net_tpu.train.stages import stage1_loss, stage2_loss

DISP = 6
H, W, B = 64, 128, 4
N_LEVELS = 9
MIN_D, MAX_D = 2.0, 18.0  # level 4 = 2*9^(4/8) = exactly 6.0
CHUNK = 50
S1_CHUNKS = 8  # 400 stage-1 steps (teacher)
S2_CHUNKS = 8  # 400 stage-2 steps (student)
A_SM = 0.2 * 2 / 512


def smooth_stereo(rng):
    """Low-frequency random stereo pair: right = left shifted DISP px
    (same fixture as scripts/verify_train_tpu.py — white noise can't be
    reconstructed by lerp-shifts and has a flat loss landscape)."""
    import scipy.ndimage as ndi

    coarse = rng.random((B, H // 8 + 2, (W + DISP) // 8 + 2, 3)).astype(np.float32)
    wide = np.stack(
        [ndi.zoom(c, (8, 8, 1), order=3)[:H, : W + DISP] for c in coarse]
    )
    return wide[:, :, :W] - 0.5, wide[:, :, DISP:] - 0.5


def train_loop(loss_fn, params, lr, chunks, tag):
    tx = optax.adam(lr, b1=0.5)
    opt_state = tx.init(params)

    def one_step(carry, _):
        params, opt_state = carry
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return (optax.apply_updates(params, upd), opt_state), (
            loss,
            aux.get("mirror_loss", jnp.float32(0.0)),
        )

    @jax.jit
    def run_chunk(params, opt_state):
        (params, opt_state), (losses, mirrors) = jax.lax.scan(
            one_step, (params, opt_state), None, length=CHUNK
        )
        return params, opt_state, losses[-1], mirrors[0], mirrors[-1]

    first_loss = first_mirror = None
    loss = mirror = None
    for k in range(chunks):
        params, opt_state, loss, m0, mirror = run_chunk(params, opt_state)
        if first_loss is None:
            first_loss, first_mirror = float(loss), float(m0)
        print(
            f"{tag} step {(k + 1) * CHUNK}: loss {float(loss):.4f}"
            + (f" mirror {float(mirror):.4f}" if tag == "stage2" else ""),
            flush=True,
        )
    return params, first_loss, float(loss), first_mirror, float(mirror)


def main():
    dtype = jnp.bfloat16 if "bf16" in sys.argv else jnp.float32
    model = create_model("tiny", N_LEVELS, dtype=dtype)
    rng = np.random.default_rng(0)
    left_np, right_np = smooth_stereo(rng)
    left, right = jnp.asarray(left_np), jnp.asarray(right_np)
    batch = {"left": left, "right": right}
    t0 = time.time()

    # ---- stage 1: train the teacher ----
    teacher = model.init(jax.random.PRNGKey(0), left, MIN_D, MAX_D, ret_disp=True)

    def s1_loss(p):
        return stage1_loss(
            p, batch, model.apply,
            min_disp=MIN_D, max_disp=MAX_D, a_p=0.0, a_sm=A_SM, vgg_fn=None,
        )

    teacher, _, _, _, _ = train_loop(s1_loss, teacher, 5e-4, S1_CHUNKS, "stage1")
    t_disp = model.apply(teacher, left, MIN_D, MAX_D, ret_disp=True).disp
    t_med = float(jnp.median(t_disp))
    levels = np.asarray(disparity_levels(MIN_D, MAX_D, N_LEVELS))
    spacing = levels[5] - levels[4]
    print(f"teacher median disp {t_med:.2f} (target {DISP})")
    assert abs(t_med - DISP) < spacing / 2, (t_med, DISP, spacing)

    # ---- stage 2: fresh student, MOM distillation from the frozen teacher ----
    student = model.init(jax.random.PRNGKey(7), left, MIN_D, MAX_D, ret_disp=True)

    def s2_loss(p):
        return stage2_loss(
            p, batch, model.apply, model.apply, teacher,
            min_disp=MIN_D, max_disp=MAX_D,
            a_p=0.0, a_sm=2 * A_SM, a_mr=1.0, vgg_fn=None,
        )

    student, l0, l1, m0, m1 = train_loop(s2_loss, student, 5e-4, S2_CHUNKS, "stage2")

    s_disp = model.apply(student, left, MIN_D, MAX_D, ret_disp=True).disp
    s_med = float(jnp.median(s_disp))
    print(
        f"stage2: loss {l0:.4f} -> {l1:.4f}, mirror (occluded-region gap to "
        f"teacher) {m0:.4f} -> {m1:.4f}, student median disp {s_med:.2f}, "
        f"{time.time() - t0:.0f}s, dtype={jnp.dtype(dtype).name}"
    )
    assert np.isfinite(l1) and l1 < l0, (l0, l1)
    # the student's occluded-region disparity moved toward the teacher
    assert np.isfinite(m1) and m1 < m0 / 2, (m0, m1)
    # and the student converged to the teacher's (exactly representable) level
    assert abs(s_med - DISP) < spacing / 2, (s_med, DISP, spacing)
    print("STAGE2 TRAIN VERIFY: PASS")


if __name__ == "__main__":
    main()
