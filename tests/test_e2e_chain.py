"""End-to-end chain: reference torch checkpoint -> importer -> AOT export
-> serving CLI output == the torch reference model's own disparity.

This is the full user migration path in one test: somebody with a trained
reference .pth.tar (DataParallel 'module.' prefixes, class name in the
dict — Train_Stage1_K.py:202-207) exports a compiled artifact and serves
a directory of images with no torch, no model code, no checkpoint on the
serving host.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
H, W, N = 64, 128, 9


def _reference_model():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import importlib

    mod = importlib.import_module("models.FAL_netB")
    model = mod.FAL_netB(None, no_levels=N)
    model.eval()
    return model


@pytest.mark.slow
def test_torch_ckpt_to_artifact_to_infer(tmp_path):
    ref = _reference_model()

    # 1. a checkpoint exactly as the reference trainers write it
    ckpt = tmp_path / "checkpoint.pth.tar"
    torch.save(
        {
            "epoch": 49,
            "m_model": "FAL_netB",
            "state_dict": {f"module.{k}": v for k, v in ref.state_dict().items()},
            "best_rmse": 0.0,
        },
        str(ckpt),
    )

    # 2. export a compiled serving artifact straight from the torch ckpt
    from fal_net_tpu.cli.export import main as export_main

    art = str(tmp_path / "falnetB.jaxexp")
    export_main([
        "--pretrained", str(ckpt),
        "--batch", "2", "--height", str(H), "--width", str(W),
        "--max_disp", "30.0", "--min_disp", "2.0",
        "--platforms", "cpu", "--out", art,
    ])

    # 3. serve a directory of images through the artifact
    rng = np.random.default_rng(0)
    frames = tmp_path / "frames"
    frames.mkdir()
    imgs = {}
    for i in range(3):
        arr = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        imgs[f"f{i}"] = arr
        Image.fromarray(arr).save(frames / f"f{i}.png")

    from fal_net_tpu.cli.infer import main as infer_main

    out = tmp_path / "out"
    infer_main(["--images", str(frames), "--out_dir", str(out), "--artifact", art])

    # 4. the served disparity must match the torch reference model's own
    # (disp-only forward runs on CPU; the reference's warp paths are
    # cuda-only, but disparity never touches them)
    from fal_net_tpu.data.datasets import load_kitti_disp_png
    from fal_net_tpu.data.transforms import RGB_MEAN

    for name, arr in imgs.items():
        x = arr.astype(np.float32) / 255.0 - RGB_MEAN
        with torch.no_grad():
            want = ref(
                torch.from_numpy(x.transpose(2, 0, 1)[None].astype(np.float32)),
                torch.tensor([[[2.0]]]),
                torch.tensor([[[30.0]]]),
                ret_disp=True, ret_pan=False, ret_subocc=False,
            )
        want = want.numpy()[0, 0]
        got = load_kitti_disp_png(str(out / f"{name}_disp.png"))[..., 0]
        # PNG stores disp*256 quantized to uint16 -> 1/256 absolute step
        np.testing.assert_allclose(got, want, atol=1 / 256 + 5e-3, rtol=1e-3)
