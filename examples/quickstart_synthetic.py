"""Quickstart: train + evaluate FAL-net on synthetic stereo, no dataset
needed.

    python examples/quickstart_synthetic.py

Builds a shifted-pattern stereo dataset (right view = left shifted by a
constant disparity), trains a tiny FAL-net for a few stage-1 steps, then
runs inference with multi-scale post-processing.  Swap ``tiny`` for ``B``
and point the data layer at KITTI for the real thing (see README).
"""

import os
import sys

# runnable straight from a source checkout (python examples/...) without
# installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fal_net_tpu.eval.postprocess import ms_post_process
from fal_net_tpu.models import create_model
from fal_net_tpu.parallel.mesh import make_mesh_for_batch
from fal_net_tpu.train import Stage1Config, Trainer


class SyntheticStereo:
    """Right view = left shifted by DISP pixels -> the network can learn
    to predict DISP everywhere."""

    DISP = 6

    def __init__(self, n=64, h=64, w=128):
        self.n, self.h, self.w = n, h, w

    def __len__(self):
        return self.n

    def get(self, index, rng):
        r = np.random.default_rng(index)
        wide = r.random((self.h, self.w + self.DISP, 3)).astype(np.float32)
        return {
            "left": wide[:, : self.w] - 0.5,
            "right": wide[:, self.DISP :] - 0.5,
            "max_disp": np.float32(24.0),
            "name": f"synth_{index}",
        }


def main():
    cfg = Stage1Config(
        model="tiny",
        num_levels=9,
        crop_size=(64, 128),
        batch_size=8,
        epochs=2,
        lr=4e-4,
        max_disp=24.0,
        min_disp=2.0,
        a_p=0.0,  # no perceptual net in the quickstart
        print_freq=4,
        workers=2,
    )
    trainer = Trainer(
        cfg,
        stage="stage1",
        mesh=make_mesh_for_batch(cfg.batch_size),
        train_dataset=SyntheticStereo(),
    )
    result = trainer.fit(save_path="runs/quickstart")
    print("training history:", [round(h["loss"], 4) for h in result["history"]])

    # inference + ms post-processing on a fresh sample
    sample = SyntheticStereo().get(999, None)
    left = jnp.asarray(sample["left"])[None]
    model = trainer.model

    def disp_fn(im):
        return model.apply(
            trainer.state.params, im, cfg.min_disp, cfg.max_disp, ret_disp=True
        ).disp

    disp = disp_fn(left)
    disp_pp = ms_post_process(left, jax.jit(disp_fn), disp)
    d = np.asarray(disp_pp)[0, ..., 0]
    print(
        f"predicted disparity: median {np.median(d):.2f} px, "
        f"range [{d.min():.2f}, {d.max():.2f}] "
        f"(ground truth {SyntheticStereo.DISP}; a couple of quickstart epochs "
        f"only starts pulling the prior toward it — train longer to converge)"
    )


if __name__ == "__main__":
    main()
