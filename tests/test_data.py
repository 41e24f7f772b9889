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

    # KITTI2015 corner: 3 scene-flow items (stereo at _10 AND _11) with
    # uint16 disparity + flow PNGs
    for sub in ("image_2", "image_3", "disp_occ_0", "flow_occ"):
        (root / "training" / sub).mkdir(parents=True, exist_ok=True)
    for i in range(3):
        for sub in ("image_2", "image_3"):
            for fr in ("10", "11"):
                img = rng.integers(0, 255, (96, 320, 3), dtype=np.uint8)
                Image.fromarray(img).save(root / "training" / sub / f"{i:06d}_{fr}.png")
        disp = (rng.random((96, 320)) * 100 * 256).astype(np.uint16)
        Image.fromarray(disp).save(root / "training" / "disp_occ_0" / f"{i:06d}_10.png")
        import cv2

        # 16-bit BGR (cv2 write order): [valid, v, u] like the KITTI devkit
        flow = np.zeros((96, 320, 3), np.uint16)
        flow[..., 2] = (rng.random((96, 320)) * 20 * 64 + 2**15).astype(np.uint16)
        flow[..., 1] = (rng.random((96, 320)) * 4 * 64 + 2**15).astype(np.uint16)
        flow[..., 0] = (rng.random((96, 320)) > 0.3).astype(np.uint16)
        cv2.imwrite(str(root / "training" / "flow_occ" / f"{i:06d}_10.png"), flow)
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
    # scene-flow items carry the t+1 stereo pair (Kitti2015.py:36-52)
    assert s["left_t1"].shape == (96, 320, 3)
    assert s["right_t1"].shape == (96, 320, 3)
    assert len(s["targets"]) == 1  # of=False: flow target not loaded


def test_kitti2015_scene_flow_semantics(kitti_tree):
    """make_dataset parity (Kitti2015.py:26-68): 4-image items requiring
    all four frames; flow target decoded when of=True; GT-free mode lists
    both frames as separate pairs."""
    # knock out one item's _11 frame: the whole item must be skipped
    victim = kitti_tree / "training" / "image_2" / "000002_11.png"
    victim.rename(victim.with_suffix(".png.bak"))
    try:
        train, test = kitti2015(str(kitti_tree), split=0, disp=True, of=True)
        assert len(test) == 2 and len(train) == 0
        s = test.get(0)
        assert len(s["targets"]) == 2
        disp_t, flow_t = s["targets"]
        assert disp_t.shape == (96, 320, 1)
        assert flow_t.shape == (96, 320, 3)  # u, v, valid
        valid = flow_t[..., 2]
        assert set(np.unique(valid)) <= {0.0, 1.0}
        # u decoded to pixels: fixture wrote U[0,20)*64 + 2^15
        assert -0.02 <= flow_t[..., 0].min() and flow_t[..., 0].max() <= 20.02
        assert (flow_t[..., 0][valid == 0] == 0).all()

        # of-only mode: single flow target
        _, test_of = kitti2015(str(kitti_tree), split=0, disp=False, of=True)
        s2 = test_of.get(0)
        assert len(s2["targets"]) == 1 and s2["targets"][0].shape == (96, 320, 3)

        # GT-free mode: both frames as separate 2-image pairs, no targets
        train_free, test_free = kitti2015(str(kitti_tree), split=0, disp=False)
        assert len(train_free) == 5  # 3 items x 2 frames - the renamed one
        s3 = train_free.get(0)
        assert "targets" not in s3 and "left_t1" not in s3
        assert len(test_free) == 0  # no testing/ dir in the fixture
    finally:
        victim.with_suffix(".png.bak").rename(victim)


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


def test_random_resize_crop_parity_vs_reference(rng):
    """Pixel parity of RandomResizeCrop vs the reference implementation
    (data_transforms.py:46-83) with the random draws pinned to the same
    values: same PIL-bicubic resize, same int truncation of the scaled
    size, same crop indexing."""
    import importlib
    import random as pyrandom
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        ref_mod = importlib.import_module("data_transforms")
    except ImportError:
        pytest.skip("reference checkout not importable")
    finally:
        sys.path.remove("/root/reference")

    from fal_net_tpu.data.transforms import RandomResizeCrop

    h, w, th, tw = 96, 320, 64, 160
    left = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    right = (rng.random((h, w, 3)) * 255).astype(np.uint8)

    factor, x1, y1 = 1.2345, 17, 5

    # reference: global np.random / random draws -> pin them
    ref_t = ref_mod.RandomResizeCrop((th, tw), down=0.75, up=1.5)
    orig_uniform, orig_randint = np.random.uniform, pyrandom.randint
    np.random.uniform = lambda low, high: factor
    draws = iter([x1, y1])
    pyrandom.randint = lambda a, b: next(draws)
    try:
        ref_out, _ = ref_t([left.copy(), right.copy()], None)
    finally:
        np.random.uniform, pyrandom.randint = orig_uniform, orig_randint

    # ours: explicit rng -> a stub producing the same draws
    class StubRng:
        def __init__(self):
            self._ints = iter([x1, y1])

        def uniform(self, low, high):
            return factor

        def integers(self, low, high):
            return next(self._ints)

    ours, _ = RandomResizeCrop((th, tw))([left.copy(), right.copy()], None, StubRng())
    for a, b in zip(ours, ref_out):
        np.testing.assert_array_equal(a, b)


def test_photometric_transforms_parity_vs_reference(rng):
    """Pinned-draw parity of RandomGamma / RandomBrightness /
    RandomCBrightness / RandomHorizontalFlip vs the reference
    (data_transforms.py:86-155): same gamma domain (/255 power), same
    255 clamp placement, per-view-per-channel gain redraw order, and the
    stereo swap+mirror flip."""
    import importlib
    import random as pyrandom
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        ref_mod = importlib.import_module("data_transforms")
    except ImportError:
        pytest.skip("reference checkout not importable")
    finally:
        sys.path.remove("/root/reference")

    from fal_net_tpu.data.transforms import (
        RandomBrightness,
        RandomChannelBrightness,
        RandomGamma,
        RandomHorizontalFlip,
    )

    left = (rng.random((24, 32, 3)) * 255).astype(np.float32)
    right = (rng.random((24, 32, 3)) * 255).astype(np.float32)
    # gamma, brightness, then 6 per-view-per-channel gains
    uniform_draws = [1.13, 1.7, 0.85, 1.1, 0.95, 1.15, 0.9, 1.05]

    orig_random, orig_uniform = pyrandom.random, pyrandom.uniform
    pyrandom.random = lambda: 0.0  # always apply (and always flip)
    it = iter(uniform_draws)
    pyrandom.uniform = lambda a, b: next(it)
    try:
        ref_in = [left.copy(), right.copy()]
        ref_in, _ = ref_mod.RandomHorizontalFlip()(ref_in, None)
        ref_in, _ = ref_mod.RandomGamma(min=0.8, max=1.2)(ref_in, None)
        ref_in, _ = ref_mod.RandomBrightness(min=0.5, max=2.0)(ref_in, None)
        ref_in, _ = ref_mod.RandomCBrightness(min=0.8, max=1.2)(ref_in, None)
    finally:
        pyrandom.random, pyrandom.uniform = orig_random, orig_uniform

    class StubRng:
        def __init__(self, draws):
            self._it = iter(draws)

        def random(self):
            return 0.0

        def uniform(self, a, b):
            return next(self._it)

    srng = StubRng(uniform_draws)
    ours = [left.copy(), right.copy()]
    ours, _ = RandomHorizontalFlip()(ours, None, srng)
    ours, _ = RandomGamma()(ours, None, srng)
    ours, _ = RandomBrightness()(ours, None, srng)
    ours, _ = RandomChannelBrightness()(ours, None, srng)

    for a, b in zip(ours, ref_in):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-3)
