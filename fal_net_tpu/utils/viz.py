"""Visualization helpers for logging (reference myUtils.py:16-56), HWC layout."""

from __future__ import annotations

import numpy as np


def disp2rgb(disp_hw1: np.ndarray, max_value=None) -> np.ndarray:
    """Disparity (H,W,1) -> grayscale RGB (H,W,3) normalized by max."""
    disp = np.asarray(disp_hw1, np.float32)[..., 0]
    denom = max_value if max_value is not None else np.abs(disp).max() or 1.0
    g = np.clip(disp / denom, 0, 1)
    return np.stack([g, g, g], axis=-1)


def grid2rgb(grid_hw2: np.ndarray, max_value=None) -> np.ndarray:
    """Sampling-grid visualization (reference grid2rgb, myUtils.py:45-56) —
    same recipe as flow2rgb with HWC-grid input."""
    return flow2rgb(grid_hw2, max_value)


def local_normalization(img: np.ndarray, win: int = 3) -> np.ndarray:
    """Window-local contrast normalization used for feature-map export
    (Test_KITTI.py:303-317): de-normalize, then (x - m)/(s + 1e-7) where m
    is a stride-1 zero-padded win x win box mean (avg_pool2d semantics,
    count_include_pad) and s = sqrt(box_mean((x - m)^2))."""
    from scipy.ndimage import uniform_filter

    mean = np.asarray([0.411, 0.432, 0.45], np.float32)
    x = np.asarray(img, np.float32) + mean

    def box_mean(a):
        # zero-padded box mean dividing by win^2 always (count_include_pad)
        return np.stack(
            [
                uniform_filter(a[..., c], size=win, mode="constant", cval=0.0)
                for c in range(a.shape[-1])
            ],
            axis=-1,
        )

    m = box_mean(x)
    s = np.sqrt(box_mean((x - m) ** 2))
    return (x - m) / (s + 1e-7)


def flow2rgb(flow_hw2: np.ndarray, max_value=None) -> np.ndarray:
    """Flow (H,W,2) -> RGB via the reference's two-channel color recipe."""
    flow = np.asarray(flow_hw2, np.float32).copy()
    invalid = (flow[..., 0] == 0) & (flow[..., 1] == 0)
    flow[invalid] = np.nan
    denom = max_value if max_value is not None else np.nanmax(np.abs(flow)) or 1.0
    nf = flow / denom
    rgb = np.ones(flow.shape[:2] + (3,), np.float32)
    rgb[..., 0] += nf[..., 0]
    rgb[..., 1] -= 0.5 * (nf[..., 0] + nf[..., 1])
    rgb[..., 2] += nf[..., 1]
    return np.clip(np.nan_to_num(rgb, nan=1.0), 0, 1)
