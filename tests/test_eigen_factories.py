"""Improved/original Eigen test-split factories on a synthetic KITTI-raw
tree (GT-path string surgery, dual targets, .npy depths) and the trainer's
perceptual-loss path."""

import numpy as np
import pytest
from PIL import Image

from fal_net_tpu.data.datasets import (
    kitti_eigen_test_improved,
    kitti_eigen_test_original,
)


@pytest.fixture(scope="module")
def raw_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_raw")
    rng = np.random.default_rng(0)
    drive = "2011_09_26/2011_09_26_drive_0002_sync"
    lines = []
    for i in (42, 69):
        frame = f"{i:010d}.png"
        for cam in ("image_02", "image_03"):
            d = root / drive / cam / "data"
            d.mkdir(parents=True, exist_ok=True)
            Image.fromarray(
                rng.integers(0, 255, (48, 160, 3), dtype=np.uint8)
            ).save(d / frame)
        # improved split GTs: proj_depth/{groundtruth,velodyne_raw}
        for kind in ("groundtruth", "velodyne_raw"):
            d = root / drive / "proj_depth" / kind / "image_02"
            d.mkdir(parents=True, exist_ok=True)
            depth = (rng.random((48, 160)) * 80 * 256).astype(np.uint16)
            Image.fromarray(depth).save(d / frame)
        # original split GTs: .npy depth alongside the image
        np.save(
            root / drive / "image_02" / "data" / f"{i:010d}.npy",
            (rng.random((48, 160)) * 80).astype(np.float32),
        )
        lines.append(
            f"{drive}/image_02/data/{frame} {drive}/image_03/data/{frame}"
        )
    lists = root / "lists"
    lists.mkdir()
    (lists / "kitti_eigen_test_improved.txt").write_text("\n".join(lines))
    (lists / "kitti_eigen_test_original.txt").write_text("\n".join(lines))
    return root


def test_improved_split_dual_targets(raw_tree):
    train, _ = kitti_eigen_test_improved(
        str(raw_tree), split=1, lists_dir=str(raw_tree / "lists")
    )
    assert len(train) == 2
    s = train.get(0)
    assert s["left"].shape == (48, 160, 3)
    # groundtruth AND raw-velodyne targets (LR_DATASETS, listdataset_test.py:27)
    assert len(s["targets"]) == 2
    for t in s["targets"]:
        assert t.shape == (48, 160, 1)
        assert 0 <= t.max() <= 80.01  # /256 applied


def test_original_split_npy_targets(raw_tree):
    train, _ = kitti_eigen_test_original(
        str(raw_tree), split=1, lists_dir=str(raw_tree / "lists")
    )
    assert len(train) == 2
    s = train.get(0)
    assert s["targets"][0].shape == (48, 160, 1)
    assert s["targets"][0].dtype == np.float32


def test_trainer_with_perceptual_loss(tmp_path):
    """a_p > 0 exercises init_vgg19 + the composited perceptual term."""
    from fal_net_tpu.parallel.mesh import make_mesh
    from fal_net_tpu.train import Stage1Config, Trainer
    from tests.test_train import SyntheticStereo, _tiny_cfg

    cfg = Stage1Config(
        **{**_tiny_cfg(epoch_size=1), "a_p": 0.01, "allow_random_vgg": True}
    )
    tr = Trainer(cfg, stage="stage1", mesh=make_mesh(1), train_dataset=SyntheticStereo(n=2))
    res = tr.fit(save_path=str(tmp_path / "p"))
    assert np.isfinite(res["history"][0]["loss"])
