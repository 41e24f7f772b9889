"""Evaluation: KITTI/Make3D metric suites, post-processing, exporters."""

from fal_net_tpu.eval.metrics import (
    KITTI_ERROR_NAMES,
    WIDTH_TO_FOCAL,
    WIDTH_TO_BASELINE,
    compute_kitti_errors,
    compute_make_errors,
    disps_to_depths_kitti,
    disps_to_depths_kitti2015,
    disps_to_depths_make,
    image_rmse,
    image_mae,
    image_psnr,
)
from fal_net_tpu.eval.postprocess import flip_post_process, ms_post_process

__all__ = [
    "KITTI_ERROR_NAMES",
    "WIDTH_TO_FOCAL",
    "WIDTH_TO_BASELINE",
    "compute_kitti_errors",
    "compute_make_errors",
    "disps_to_depths_kitti",
    "disps_to_depths_kitti2015",
    "disps_to_depths_make",
    "image_rmse",
    "image_mae",
    "image_psnr",
    "flip_post_process",
    "ms_post_process",
]
