"""Coverage for the remaining dataset paths: Make3D .mat protocol,
Cityscapes tree walking, VGG full=True slices."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from fal_net_tpu.data.datasets import (
    cityscapes_jpg,
    load_make3d_depth,
    make3d,
)
from fal_net_tpu.losses.vgg import Vgg19Features


def test_make3d_mat_loader_and_factory(tmp_path):
    import scipy.io as sio

    rng = np.random.default_rng(0)
    # Make3D layout: img-*.jpg + depth_sph_corr-*.mat with Position3DGrid
    for i in range(2):
        img = rng.integers(0, 255, (120, 90, 3), dtype=np.uint8)
        Image.fromarray(img).save(tmp_path / f"img-{i}.jpg")
        grid = rng.random((55, 305, 4)).astype(np.float64) * 60
        sio.savemat(tmp_path / f"depth_sph_corr-{i}.mat", {"Position3DGrid": grid})

    depth = load_make3d_depth(str(tmp_path / "depth_sph_corr-0.mat"))
    # NEAREST-resized to 1704x2272 (listdataset_test.py:29-35)
    assert depth.shape == (2272, 1704, 1)

    train, test = make3d(str(tmp_path), split=1)
    assert len(train) == 2
    s = train.get(0)
    assert s["left"].shape == (120, 90, 3)
    assert s["targets"][0].shape == (2272, 1704, 1)


def test_cityscapes_tree(tmp_path):
    rng = np.random.default_rng(1)
    for ttv, city in [("train", "aachen"), ("val", "lindau")]:
        for side in ("leftImg8bit", "rightImg8bit"):
            d = tmp_path / side / ttv / city
            d.mkdir(parents=True)
        for i in range(2):
            base = f"{city}_{i:06d}_000019_"
            for side in ("leftImg8bit", "rightImg8bit"):
                img = rng.integers(0, 255, (64, 128, 3), dtype=np.uint8)
                Image.fromarray(img).save(
                    tmp_path / side / ttv / city / f"{base}{side}.jpg"
                )
    train, val = cityscapes_jpg(str(tmp_path))
    assert len(train) == 2 and len(val) == 2
    s = train.get(0, np.random.default_rng(0))
    assert s["left"].shape == (64, 128, 3)
    assert s["max_disp"] == 300.0


def test_vgg_full_four_slices(rng):
    model = Vgg19Features(full=True)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert len(feats) == 4
    # pool1/2/3/4 halve spatial dims each time; widths 64/128/256/512
    for i, (hw, c) in enumerate([(32, 64), (16, 128), (8, 256), (4, 512)]):
        assert feats[i].shape == (1, hw, hw, c)
