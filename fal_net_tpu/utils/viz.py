"""Visualization helpers for logging (reference myUtils.py:16-56), HWC layout."""

from __future__ import annotations

import numpy as np


def disp2rgb(disp_hw1: np.ndarray, max_value=None) -> np.ndarray:
    """Disparity (H,W,1) -> grayscale RGB (H,W,3) normalized by max."""
    disp = np.asarray(disp_hw1, np.float32)[..., 0]
    denom = max_value if max_value is not None else np.abs(disp).max() or 1.0
    g = np.clip(disp / denom, 0, 1)
    return np.stack([g, g, g], axis=-1)


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
