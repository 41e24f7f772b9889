"""Bundled KITTI Eigen split lists (fal_net_tpu/data/lists.py).

The reference ships these splits as text files (Datasets/
kitti_eigen_train.txt etc., SURVEY §2.3); we bundle the same data in a
compact binary form and regenerate the exact lines.  Pins: byte parity
against the reference files (when that checkout exists), factory
fallback when no lists_dir is given, and the error for non-bundled
lists.
"""

import os

import pytest

from fal_net_tpu.data.lists import LIST_SPECS, bundled_list_lines, bundled_names

_REF = "/root/reference/Datasets"


def test_bundled_names():
    assert set(bundled_names()) == {
        "kitti_eigen_train.txt",
        "kitti_eigen_test_improved.txt",
        "kitti_eigen_test_original.txt",
    }


def test_bundled_sizes_and_grammar():
    train = bundled_list_lines("kitti_eigen_train.txt")
    impr = bundled_list_lines("kitti_eigen_test_improved.txt")
    orig = bundled_list_lines("kitti_eigen_test_original.txt")
    assert len(train) == 22600 and len(impr) == 697 and len(orig) == 697
    l, r = train[0].split(" ")
    assert l.endswith(".png") and "/image_02/data/" in l
    assert r == l.replace("image_02", "image_03")
    l, r = orig[0].split(" ")
    assert l.endswith(".jpg") and "_sync_02/" in l
    assert r == l.replace("_sync_02/", "_sync_03/")


@pytest.mark.skipif(not os.path.isdir(_REF), reason="reference checkout absent")
@pytest.mark.parametrize("fname", sorted(LIST_SPECS))
def test_byte_parity_vs_reference(fname):
    with open(os.path.join(_REF, fname)) as f:
        ref = [ln for ln in f.read().splitlines() if ln.strip()]
    assert bundled_list_lines(fname) == ref


def test_eigen_factories_use_bundle_without_lists_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("FAL_NET_LISTS_DIR", raising=False)
    from fal_net_tpu.data.datasets import kitti_eigen_test_improved, kitti_train

    # improved-Eigen: no GT files on disk -> empty datasets, but the list
    # resolves from the bundle (previously this raised ValueError).
    train, test = kitti_eigen_test_improved(str(tmp_path), split=1)
    assert len(train) == 0 and len(test) == 0

    # train factory: materialize the first bundled pair and expect one item.
    line = bundled_list_lines("kitti_eigen_train.txt")[0]
    for rel in line.split(" "):
        p = tmp_path / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.touch()
    train, _ = kitti_train(str(tmp_path), split=1)
    assert len(train) == 1


def test_non_bundled_list_still_requires_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("FAL_NET_LISTS_DIR", raising=False)
    from fal_net_tpu.data.datasets import kitti_train

    with pytest.raises(ValueError, match="not bundled"):
        kitti_train(str(tmp_path), split=1, train_split="kitti_train_split")
