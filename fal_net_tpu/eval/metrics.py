"""KITTI / Make3D depth metric suites and image metrics.

Host-side numpy implementations with exact reference semantics
(myUtils.py:123-334): the published evaluation protocol constants (focal
length / baseline per image width, Garg crop bounds, depth caps) must not
drift, so they are transcribed as data with citations.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

KITTI_ERROR_NAMES = ["abs_rel", "sq_rel", "rms", "log_rms", "a1", "a2", "a3"]

# KITTI camera intrinsics keyed by image width (myUtils.py:177-191).
WIDTH_TO_FOCAL = {
    1242: 721.5377,
    1241: 718.856,
    1224: 707.0493,
    1238: 718.3351,
    1226: 707.0912,
    1280: 738.2355,  # focal length upscaled
}
WIDTH_TO_BASELINE = {
    1242: 0.9982 * 0.54,
    1241: 0.9848 * 0.54,
    1224: 1.0144 * 0.54,
    1238: 0.9847 * 0.54,
    1226: 0.9765 * 0.54,
    1280: 0.54,
}

# Garg crop (rows [H-219, H-4), cols [44, 1180)) — myUtils.py:265.
GARG_CROP = (219, 4, 44, 1180)


def compute_kitti_errors(
    gt: np.ndarray,
    pred: np.ndarray,
    use_median: bool = False,
    min_d: float = 1.0,
    max_d: float = 80.0,
    scale_out: list | None = None,
) -> List[float]:
    """The 7 KITTI depth metrics on valid (gt>0) pixels (myUtils.py:196-231).

    Under ``use_median`` the reference also tracks a running mean of the
    per-image scale factor in module globals and prints it every image
    (myUtils.py:193-207).  Here the factor is instead appended to the
    caller-owned ``scale_out`` list — the Evaluator averages it into
    errors.txt / metrics.json, replacing the reference's global-state
    side effect with explicit plumbing.
    """
    mask = gt > 0
    gt = gt[mask]
    pred = pred[mask]

    if use_median:
        factor = np.median(gt) / np.median(pred)
        pred = factor * pred
        if scale_out is not None:
            scale_out.append(float(factor))

    pred = np.clip(pred, min_d, max_d)
    gt = np.clip(gt, min_d, max_d)

    thresh = np.maximum(gt / pred, pred / gt)
    a1 = float((thresh < 1.25).mean())
    a2 = float((thresh < 1.25**2).mean())
    a3 = float((thresh < 1.25**3).mean())
    rmse = float(np.sqrt(np.mean((gt - pred) ** 2)))
    rmse_log = float(np.sqrt(np.mean((np.log(gt) - np.log(pred)) ** 2)))
    abs_rel = float(np.mean(np.abs(gt - pred) / gt))
    sq_rel = float(np.mean(((gt - pred) ** 2) / gt))
    return [abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3]


def disps_to_depths_kitti2015(
    gt_disps: np.ndarray, pred_disps: np.ndarray
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """KITTI-2015 protocol: both GT and pred are disparities (myUtils.py:234-253)."""
    gt_depths, pred_depths = [], []
    for gt_disp, pred_disp in zip(gt_disps, pred_disps):
        width = gt_disp.shape[1]
        gt_mask = gt_disp > 0
        pred_mask = pred_disp > 0
        gt_depth = WIDTH_TO_FOCAL[width] * 0.54 / (gt_disp + (1.0 - gt_mask))
        pred_depth = WIDTH_TO_FOCAL[width] * 0.54 / (pred_disp + (1.0 - pred_mask))
        gt_depths.append(gt_mask * gt_depth)
        pred_depths.append(pred_depth)
    return gt_depths, pred_depths


def disps_to_depths_kitti(
    gt_depths_in: np.ndarray, pred_disps: np.ndarray
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Eigen protocol: GT already depth; Garg crop; pred disp->depth via
    per-width focal*baseline (myUtils.py:256-277)."""
    top, bottom, left, right = GARG_CROP
    gt_depths, pred_depths = [], []
    for gt, pred_disp in zip(gt_depths_in, pred_disps):
        height, width = gt.shape
        gt = gt[height - top : height - bottom, left:right]
        pred_disp = pred_disp[height - top : height - bottom, left:right]
        gt_mask = gt > 0
        pred_mask = pred_disp > 0
        pred_depth = (
            WIDTH_TO_FOCAL[width]
            * WIDTH_TO_BASELINE[width]
            / (pred_disp + (1.0 - pred_mask))
        )
        gt_depths.append(gt_mask * gt)
        pred_depths.append(pred_depth)
    return gt_depths, pred_depths


def disps_to_depths_make(
    gt_depths_in: np.ndarray,
    pred_disps: np.ndarray,
    min_d: float = 1.0,
    max_d: float = 70.0,
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Make3D protocol: median scaling, 70 m cap, approx f=721 b=0.22
    (myUtils.py:280-309)."""
    gt_out, pred_out = [], []
    for gt, pred_disp in zip(gt_depths_in, pred_disps):
        gt_mask = (gt > 0) * (gt < max_d)
        pred_mask = pred_disp > 0
        pred_depth = 721 * 0.22 / (pred_disp + (1.0 - pred_mask))
        gt_v = gt[gt_mask]
        pred_v = pred_depth[gt_mask]
        factor = np.median(gt_v) / np.median(pred_v)
        pred_v = np.clip(factor * pred_v, min_d, max_d)
        gt_v = np.clip(gt_v, min_d, max_d)
        gt_out.append(gt_v)
        pred_out.append(pred_v)
    return gt_out, pred_out


def compute_make_errors(gt: np.ndarray, pred: np.ndarray) -> List[float]:
    """Make3D metric suite: abs_rel, sq_rel, rms, log10, a1-a3 (myUtils.py:312-334)."""
    mask = gt > 0
    gt = gt[mask]
    pred = pred[mask]
    thresh = np.maximum(gt / pred, pred / gt)
    a1 = float((thresh < 1.25).mean())
    a2 = float((thresh < 1.25**2).mean())
    a3 = float((thresh < 1.25**3).mean())
    rmse = float(np.sqrt(np.mean((gt - pred) ** 2)))
    log10 = float(np.mean(np.abs(np.log10(gt) - np.log10(pred))))
    abs_rel = float(np.mean(np.abs(gt - pred) / gt))
    sq_rel = float(np.mean(((gt - pred) ** 2) / gt))
    return [abs_rel, sq_rel, rmse, log10, a1, a2, a3]


# --- image-space metrics in the 0-255 domain (myUtils.py:123-172) ---

_MEAN = jnp.asarray([0.411, 0.432, 0.45])


def _denorm255(x, mean):
    return jnp.clip((x + mean) * 255.0, 0.0, 255.0)


def image_rmse(output, label, mean=_MEAN):
    """NHWC; output clipped to [0,255], label only de-normalized (myUtils.py:138-150)."""
    out = _denorm255(output, mean)
    lab = (label + mean) * 255.0
    return jnp.sqrt(jnp.mean(jnp.square(out - lab)))


def image_mae(output, label, mean=_MEAN):
    out = _denorm255(output, mean)
    lab = (label + mean) * 255.0
    return jnp.mean(jnp.abs(out - lab))


def image_rmse_np(output, label) -> float:
    """Host-side numpy twin of :func:`image_rmse` for per-image metric
    accumulation over already-fetched arrays — a per-image jnp reduction
    would re-upload the image and block on a device sync each frame
    (~30 ms/call through a slow host link)."""
    mean = np.asarray([0.411, 0.432, 0.45], output.dtype)
    out = np.clip((output + mean) * 255.0, 0.0, 255.0)
    lab = (label + mean) * 255.0
    return float(np.sqrt(np.mean(np.square(out - lab))))


def image_psnr(output, label, mean=_MEAN):
    out = jnp.round(_denorm255(output, mean))
    lab = (label + mean) * 255.0
    rmse = jnp.sqrt(jnp.mean(jnp.square(out - lab)))
    return 20.0 * jnp.log10(255.0 / rmse)
