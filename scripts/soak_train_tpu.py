"""On-TPU training soak: the PRODUCTION Trainer path, with mid-run
checkpoint + full-state resume, at the real stage-1 shape.

Unlike scripts/verify_train_tpu.py (which chains raw train steps in one
jit to prove kernel-level convergence), this drives the actual Trainer —
threaded DataLoader, device prefetch, donated jitted step, MultiStepLR,
msgpack checkpoints — at 192x640 batch 8 bf16 on the real chip:

  phase 1: 2 epochs x 25 steps on synthetic smooth stereo (checkpoint
           every 10 steps + per-epoch);
  phase 2: a FRESH Trainer resumes from the last full-state checkpoint
           (params + Adam moments + step) and trains 1 more epoch;
  asserts: resumed step counter continues (75 after phase 2), every
           epoch loss is finite, and the resumed epoch does not diverge
           (stays within 20% of phase 1's level — Adam moments survived
           the round-trip).  Convergence itself is proven by the
           dedicated scripts (verify_train_tpu.py /
           verify_train_stage2_tpu.py); 25-step epoch averages are too
           noisy to assert descent on.

    PYTHONPATH=/root/repo python scripts/soak_train_tpu.py [--fp32]

~3-4 min on a v5e chip.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np


class SmoothStereo:
    """Synthetic smooth stereo at the stage-1 crop (192x640), right =
    left shifted DISP px (same fixture family as verify_train_tpu.py)."""

    DISP = 8

    def __init__(self, unique=8, length=400, h=192, w=640, seed=0):
        import scipy.ndimage as ndi

        rng = np.random.default_rng(seed)
        self.length = length
        self.samples = []
        for i in range(unique):
            coarse = rng.random(
                (h // 16 + 2, (w + self.DISP) // 16 + 2, 3)
            ).astype(np.float32)
            wide = ndi.zoom(coarse, (16, 16, 1), order=3)[: h, : w + self.DISP]
            self.samples.append(
                {
                    "left": wide[:, : w] - 0.5,
                    "right": wide[:, self.DISP :] - 0.5,
                }
            )

    def __len__(self):
        # cycled: the soak needs epoch_size batches per epoch, not epoch_size
        # unique images
        return self.length

    def get(self, i, rng=None):
        return self.samples[i % len(self.samples)]


def main():
    from fal_net_tpu.train import Stage1Config, Trainer
    from fal_net_tpu.parallel.mesh import make_mesh

    dtype = "float32" if "--fp32" in sys.argv else "bfloat16"
    tmp = tempfile.mkdtemp(prefix="soak_")
    run_dir = os.path.join(tmp, "run")
    ds = SmoothStereo()

    steps = 25  # per epoch; per-step wall here is ~1.7 s (relay round trips
    #             dominate the 50 ms on-chip step at this shape)
    common = dict(
        model="B",
        num_levels=49,
        batch_size=8,
        crop_size=(192, 640),
        epoch_size=steps,
        lr=1e-4,
        max_disp=300.0,
        min_disp=2.0,
        a_p=0.0,
        workers=2,
        compute_dtype=dtype,
        print_freq=10,
        save_every_steps=10,
    )

    t0 = time.time()
    cfg1 = Stage1Config(**common, epochs=2)
    tr1 = Trainer(cfg1, stage="stage1", mesh=make_mesh(1), train_dataset=ds)
    res1 = tr1.fit(save_path=run_dir)
    losses1 = [h["loss"] for h in res1["history"]]
    step1 = int(tr1.state.step)
    print(f"phase1: epochs {losses1}, step {step1}, {time.time() - t0:.0f}s")
    assert step1 == 2 * steps, step1
    assert all(np.isfinite(l) for l in losses1), losses1

    ckpt = os.path.join(run_dir, "checkpoint.msgpack")
    assert os.path.isfile(ckpt), os.listdir(run_dir)

    # fresh process-equivalent: new Trainer, full-state resume
    cfg2 = Stage1Config(**common, epochs=3, resume=ckpt)
    tr2 = Trainer(cfg2, stage="stage1", mesh=make_mesh(1), train_dataset=ds)
    res2 = tr2.fit(save_path=run_dir)
    losses2 = [h["loss"] for h in res2["history"]]
    step2 = int(tr2.state.step)
    print(f"phase2 (resumed): epochs {losses2}, step {step2}, {time.time() - t0:.0f}s")
    assert step2 == 3 * steps, step2  # step counter continued, epoch restored
    assert len(losses2) == 1, losses2  # only epoch 2 ran
    assert np.isfinite(losses2[0])
    # resumed training does not diverge (Adam moments + LR schedule
    # survived the checkpoint round-trip)
    assert losses2[0] < 1.2 * max(losses1), (losses2, losses1)
    print(f"SOAK TRAIN VERIFY: PASS ({dtype}, {time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
