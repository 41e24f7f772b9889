"""Inference + evaluation driver (reference Test_KITTI.py).

Runs a FAL-net over an evaluation dataset: forward disp (optionally pan and
sub-occlusion masks for artifact export), flip or multi-scale
post-processing, per-protocol depth metrics, and artifact export.

TPU notes vs the reference:
  * KITTI raw mixes image widths {1242,1241,1224,1238,1226} — XLA compiles
    per shape.  The handful of shapes is compiled once each and cached
    (the reference instead forces batch 1 and relies on cuDNN autotune).
  * The reference's --save_pan path crashes on the shipped FAL_netB (it
    unpacks 5 outputs incl. a never-returned right disparity,
    Test_KITTI.py:190 — SURVEY §2.1 item 11); here pan/mask export works.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from fal_net_tpu.eval.export import (
    disparity_to_point_cloud,
    save_disparity_png,
    save_feature_pngs,
    save_image_png,
    save_point_cloud_ply,
)
from fal_net_tpu.eval.metrics import (
    KITTI_ERROR_NAMES,
    compute_kitti_errors,
    compute_make_errors,
    disps_to_depths_kitti,
    disps_to_depths_kitti2015,
    disps_to_depths_make,
)
from fal_net_tpu.eval.postprocess import flip_post_process, ms_post_process
from fal_net_tpu.losses.epe import real_epe
from fal_net_tpu.utils.meters import AverageMeter, MultiAverageMeter


@dataclasses.dataclass
class EvalConfig:
    dataset: str = "Kitti_eigen_test_improved"
    max_disp: float = 300.0
    min_disp: float = 2.0
    rel_baseline: float = 1.0  # scales max_disp (Test_KITTI.py:161)
    f_post_process: bool = False
    ms_post_process: bool = True
    use_median: bool = False
    save: bool = False
    save_pan: bool = False
    save_input: bool = False
    save_point_cloud: bool = False
    save_path: str = "eval_out"
    print_freq: int = 10
    crop_top_95: bool = False  # 'Owndata' mode: keep top 95% of rows
    #                            (Test_KITTI.py:169-172)


class Evaluator:
    def __init__(self, model, variables, cfg: EvalConfig):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self._disp_fns: Dict[Any, Any] = {}

    @functools.cached_property
    def _jit_forward(self):
        def fwd(variables, left, *, pan: bool, subocc: bool):
            out = self.model.apply(
                variables,
                left,
                self.cfg.min_disp * self.cfg.rel_baseline,
                self.cfg.max_disp * self.cfg.rel_baseline,
                ret_disp=True,
                ret_pan=pan,
                ret_subocc=subocc,
            )
            return out

        return jax.jit(fwd, static_argnames=("pan", "subocc"))

    def _disp_only(self, left):
        return self._jit_forward(self.variables, left, pan=False, subocc=False).disp

    @functools.cached_property
    def _jit_flip_pp(self):
        return jax.jit(lambda v, left, disp: flip_post_process(
            left, lambda im: self._jit_forward(v, im, pan=False, subocc=False).disp, disp
        ))

    @functools.cached_property
    def _jit_ms_pp(self):
        return jax.jit(lambda v, left, disp: ms_post_process(
            left, lambda im: self._jit_forward(v, im, pan=False, subocc=False).disp, disp
        ))

    def run(self, dataset, evaluate: bool = True) -> Dict[str, float]:
        cfg = self.cfg
        epes = AverageMeter()
        batch_time = AverageMeter()
        kitti_errors = MultiAverageMeter(KITTI_ERROR_NAMES)
        make_errors = MultiAverageMeter(KITTI_ERROR_NAMES)

        out_dirs = {}
        if cfg.save:
            for sub in ("disp", "pan", "input", "pc", "feats"):
                d = os.path.join(cfg.save_path, sub)
                os.makedirs(d, exist_ok=True)
                out_dirs[sub] = d

        n = len(dataset)
        for i in range(n):
            sample = dataset.get(i)
            left = jnp.asarray(sample["left"])[None]
            if cfg.crop_top_95:
                left = left[:, : int(0.95 * left.shape[1])]
            want_artifacts = cfg.save and cfg.save_pan

            start = time.time()
            out = self._jit_forward(
                self.variables, left, pan=want_artifacts, subocc=want_artifacts
            )
            disp = out.disp
            if cfg.f_post_process:
                disp = self._jit_flip_pp(self.variables, left, disp)
            elif cfg.ms_post_process:
                disp = self._jit_ms_pp(self.variables, left, disp)
            # np.asarray forces the device->host transfer; on the axon
            # backend block_until_ready alone does not actually block.
            disp_np = np.asarray(disp)[0, ..., 0]
            batch_time.update(time.time() - start)

            if cfg.save:
                save_disparity_png(
                    os.path.join(out_dirs["disp"], f"{i:010d}.png"), disp_np
                )
                if cfg.save_input:
                    save_image_png(
                        os.path.join(out_dirs["input"], f"{i:010d}.png"),
                        np.asarray(left)[0],
                    )
                if cfg.save_pan and out.pan is not None:
                    save_image_png(
                        os.path.join(out_dirs["pan"], f"{i:010d}.png"),
                        np.asarray(out.pan)[0],
                    )
                    save_feature_pngs(
                        out_dirs["feats"], f"{i:010d}_maskL", np.asarray(out.maskL)[0]
                    )
                    save_feature_pngs(
                        out_dirs["feats"], f"{i:010d}_maskR", np.asarray(out.maskR)[0]
                    )
                if cfg.save_point_cloud:
                    img255 = (np.asarray(sample["left"]) + np.asarray(
                        [0.411, 0.432, 0.45])) * 255
                    pc = disparity_to_point_cloud(img255, disp_np)
                    save_point_cloud_ply(
                        os.path.join(out_dirs["pc"], f"{i:010d}.ply"), pc
                    )

            if evaluate and "targets" in sample:
                target = np.asarray(sample["targets"][0])[..., 0]
                if cfg.dataset in (
                    "Kitti_eigen_test_improved",
                    "Kitti_eigen_test_original",
                ):
                    gt_d, pred_d = disps_to_depths_kitti(
                        target[None], disp_np[None]
                    )
                    kitti_errors.update(
                        compute_kitti_errors(gt_d[0], pred_d[0], use_median=cfg.use_median)
                    )
                elif cfg.dataset == "Kitti2015":
                    t = jnp.asarray(sample["targets"][0])[None]
                    epes.update(float(real_epe(disp, t, sparse=True)))
                    gt_d, pred_d = disps_to_depths_kitti2015(
                        target[None], disp_np[None]
                    )
                    kitti_errors.update(
                        compute_kitti_errors(gt_d[0], pred_d[0], use_median=cfg.use_median)
                    )
                elif cfg.dataset == "Make3D":
                    gt_d, pred_d = disps_to_depths_make(target[None], disp_np[None])
                    make_errors.update(compute_make_errors(gt_d[0], pred_d[0]))

            if i % cfg.print_freq == 0:
                a1 = kitti_errors.avg[4] if kitti_errors.count else 0.0
                print(f"Test: [{i}/{n}] Time {batch_time} a1 {a1:.4f}")

        metrics: Dict[str, float] = {"epe": epes.avg, "sec_per_image": batch_time.avg}
        source = make_errors if cfg.dataset == "Make3D" else kitti_errors
        metrics.update({k: v for k, v in zip(KITTI_ERROR_NAMES, source.avg)})

        # errors.txt is always written, like the reference (Test_KITTI.py:276-280
        # writes it unconditionally, independent of --save).
        os.makedirs(cfg.save_path, exist_ok=True)
        with open(os.path.join(cfg.save_path, "errors.txt"), "w") as f:
            f.write(f"EPE {epes.avg}\n")
            f.write("Kitti metrics:\n")
            f.write(repr(source) + "\n")
        print(repr(source))
        return metrics
