"""Data pipeline tests on a synthetic on-disk KITTI-like tree."""

import os

import numpy as np
import pytest
from PIL import Image

from fal_net_tpu.data import (
    DataLoader,
    StereoTrainDataset,
    default_train_transform,
    kitti2015,
    kitti_train,
    normalize,
    prefetch_to_device,
)
from fal_net_tpu.data.transforms import (
    RandomHorizontalFlip,
    RandomGamma,
    denormalize,
)


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    """Fake KITTI: 6 stereo pairs + a split list + a KITTI2015 corner."""
    root = tmp_path_factory.mktemp("kitti")
    rng = np.random.default_rng(7)
    pairs = []
    for drive in ["2011_09_26/2011_09_26_drive_0001_sync"]:
        for i in range(6):
            for cam in ("image_02", "image_03"):
                d = root / drive / cam / "data"
                d.mkdir(parents=True, exist_ok=True)
                img = rng.integers(0, 255, (96, 320, 3), dtype=np.uint8)
                Image.fromarray(img).save(d / f"{i:010d}.png")
            pairs.append(
                f"{drive}/image_02/data/{i:010d}.png {drive}/image_03/data/{i:010d}.png"
            )
    lists = root / "lists"
    lists.mkdir()
    (lists / "kitti_eigen_train.txt").write_text("\n".join(pairs))

    # KITTI2015 corner: 3 pairs with uint16 disparity PNGs
    for sub in ("image_2", "image_3", "disp_occ_0"):
        (root / "training" / sub).mkdir(parents=True, exist_ok=True)
    for i in range(3):
        for sub in ("image_2", "image_3"):
            img = rng.integers(0, 255, (96, 320, 3), dtype=np.uint8)
            Image.fromarray(img).save(root / "training" / sub / f"{i:06d}_10.png")
        disp = (rng.random((96, 320)) * 100 * 256).astype(np.uint16)
        Image.fromarray(disp).save(root / "training" / "disp_occ_0" / f"{i:06d}_10.png")
    return root


def test_kitti_train_factory(kitti_tree):
    train, test = kitti_train(
        str(kitti_tree),
        split=1,
        co_transform=default_train_transform((64, 128)),
        lists_dir=str(kitti_tree / "lists"),
    )
    assert len(train) == 6 and len(test) == 0
    s = train.get(0, np.random.default_rng(0))
    assert s["left"].shape == (64, 128, 3)
    assert s["right"].shape == (64, 128, 3)
    assert s["max_disp"] == 300.0
    assert s["left"].dtype == np.float32
    # normalized domain
    assert -1.0 <= s["left"].min() and s["left"].max() <= 1.0


def test_kitti2015_eval(kitti_tree):
    _, test = kitti2015(str(kitti_tree), split=0, disp=True)
    assert len(test) == 3
    s = test.get(0)
    assert s["left"].shape == (96, 320, 3)
    assert s["targets"][0].shape == (96, 320, 1)
    assert 0 <= s["targets"][0].max() <= 100.01  # /256 scaling applied


def test_loader_batches_and_prefetch(kitti_tree):
    train, _ = kitti_train(
        str(kitti_tree),
        split=1,
        co_transform=default_train_transform((64, 128)),
        lists_dir=str(kitti_tree / "lists"),
    )
    loader = DataLoader(train, batch_size=2, shuffle=True, num_workers=2, seed=1)
    batches = list(prefetch_to_device(iter(loader)))
    assert len(batches) == 3
    assert batches[0]["left"].shape == (2, 64, 128, 3)
    assert batches[0]["max_disp"].shape == (2,)


def test_loader_reproducible(kitti_tree):
    train, _ = kitti_train(
        str(kitti_tree),
        split=1,
        co_transform=default_train_transform((64, 128)),
        lists_dir=str(kitti_tree / "lists"),
    )
    l1 = DataLoader(train, batch_size=2, seed=3)
    l2 = DataLoader(train, batch_size=2, seed=3)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(b1["left"], b2["left"])
    # different epoch -> different augmentation
    l2.set_epoch(1)
    b3 = next(iter(l2))
    assert not np.array_equal(b1["left"], b3["left"])


def test_stereo_flip_consistency(rng):
    """When the flip fires it must swap L<->R and mirror both."""
    left = rng.integers(0, 255, (8, 16, 3)).astype(np.float32)
    right = rng.integers(0, 255, (8, 16, 3)).astype(np.float32)
    t = RandomHorizontalFlip()
    # find one seed that flips and one that doesn't
    flipping = next(s for s in range(20) if np.random.default_rng(s).random() < 0.5)
    keeping = next(s for s in range(20) if np.random.default_rng(s).random() >= 0.5)
    out, _ = t([left, right], None, np.random.default_rng(flipping))
    np.testing.assert_array_equal(out[0], right[:, ::-1])
    np.testing.assert_array_equal(out[1], left[:, ::-1])
    out, _ = t([left, right], None, np.random.default_rng(keeping))
    np.testing.assert_array_equal(out[0], left)


def test_gamma_and_normalize_roundtrip(rng):
    img = rng.integers(0, 255, (8, 16, 3)).astype(np.uint8)
    out, _ = RandomGamma(1.0, 1.0)([img.astype(np.float32)], None, np.random.default_rng(0))
    # gamma in [1,1] is identity (up to fp)
    np.testing.assert_allclose(out[0], img, atol=1e-3)
    n = normalize(img)
    d = denormalize(n)
    np.testing.assert_allclose(d, img, atol=1e-3)


def test_random_swap_when_not_fixed(kitti_tree):
    train, _ = kitti_train(
        str(kitti_tree), split=1, lists_dir=str(kitti_tree / "lists"), fix=False
    )
    signs = set()
    for i in range(6):
        for seed in range(8):
            s = train.get(i, np.random.default_rng(seed))
            signs.add(float(s["max_disp"]))
    assert signs == {300.0, -300.0}
