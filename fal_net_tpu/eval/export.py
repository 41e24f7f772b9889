"""Artifact exporters (Test_KITTI.py:211-253, myUtils.py:339-394).

  * disparity PNG, plasma colormap, normalized by the 95th percentile
  * point cloud .ply via the pinhole model (vectorized writer — the
    reference loops python over every vertex)
  * de-normalized input/pan PNG dumps and per-channel feature maps
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from fal_net_tpu.data.transforms import RGB_MEAN
from fal_net_tpu.eval.metrics import WIDTH_TO_BASELINE, WIDTH_TO_FOCAL


def save_disparity_png(path: str, disp_hw: np.ndarray) -> None:
    """Plasma-colormapped disparity normalized by its 95th percentile
    (Test_KITTI.py:213-216)."""
    import matplotlib.pyplot as plt

    disp = np.asarray(disp_hw, np.float64)
    disparity = 256 * np.clip(disp / (np.percentile(disp, 95) + 1e-6), 0, 1)
    plt.imsave(path, np.rint(disparity).astype(np.int32), cmap="plasma", vmin=0, vmax=256)


def save_image_png(path: str, image_hwc: np.ndarray, denormalize: bool = True) -> None:
    from PIL import Image

    img = np.asarray(image_hwc, np.float32)
    if denormalize:
        img = img + RGB_MEAN
    Image.fromarray(np.rint(255 * np.clip(img, 0, 1)).astype(np.uint8)).save(path)


def save_feature_pngs(dir_path: str, tag: str, feat_hwc: np.ndarray) -> None:
    """Per-channel grayscale dumps of |feature| clipped to 255
    (Test_KITTI.py:245-253)."""
    from PIL import Image

    os.makedirs(dir_path, exist_ok=True)
    feat = np.abs(np.asarray(feat_hwc, np.float32)) * 255
    feat = np.clip(feat, 0, 255)
    for c in range(feat.shape[-1]):
        Image.fromarray(np.rint(feat[..., c]).astype(np.uint8)).save(
            os.path.join(dir_path, f"{tag}_c{c}.png")
        )


def disparity_to_point_cloud(
    image_hwc: np.ndarray,
    disp_hw: np.ndarray,
    focal: Optional[float] = None,
    baseline: Optional[float] = None,
) -> np.ndarray:
    """Disparity -> (N, 6) XYZRGB point cloud (myUtils.py:339-373).

    image in 0..255; returns [x, z, -y, r, g, b] rows (the reference's axis
    convention for Blender viewing); z capped to [0, 200] m.
    """
    h, w = disp_hw.shape
    focal = focal if focal is not None else WIDTH_TO_FOCAL[w]
    baseline = baseline if baseline is not None else WIDTH_TO_BASELINE[w]
    z = focal * baseline / (np.asarray(disp_hw, np.float64) + 1e-4)

    # pixel centers: affine_grid (align_corners=False) unnormalized by
    # (u+1)/2*size lands on x+0.5 (myUtils.py:352-360)
    u = np.arange(w, dtype=np.float64)[None, :] + 0.5
    v = np.arange(h, dtype=np.float64)[:, None] + 0.5
    x = ((u - w / 2) / focal) * z
    y = ((v - h / 2) / focal) * z
    z = np.clip(z, 0, 200)

    rgb = np.asarray(image_hwc, np.float64).reshape(h * w, 3)
    pts = np.stack([x.ravel(), z.ravel(), -y.ravel()], axis=1)
    return np.concatenate([pts, rgb], axis=1)


def save_point_cloud_ply(path: str, xyzrgb: np.ndarray) -> None:
    """ASCII .ply writer, vectorized via np.savetxt (myUtils.py:376-394)."""
    n = xyzrgb.shape[0]
    header = "\n".join(
        [
            "ply",
            "format ascii 1.0",
            f"element vertex {n}",
            "property float x",
            "property float y",
            "property float z",
            "property uchar diffuse_red",
            "property uchar diffuse_green",
            "property uchar diffuse_blue",
            "end_header",
        ]
    )
    with open(path, "w") as f:
        f.write(header + "\n")
        np.savetxt(f, xyzrgb, fmt="%f %f %f %d %d %d")
