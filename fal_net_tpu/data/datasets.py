"""Dataset catalog: KITTI (Eigen), KITTI 2015, Cityscapes, Make3D.

Re-implements the reference ``Datasets/`` factories with the same split
conventions and target-loading protocols (see each class's citations), as
plain-python samplers yielding numpy dicts.  No torch DataLoader: batching,
shuffling and device prefetch live in :mod:`fal_net_tpu.data.loader`.

Split-list files: the reference ships ``kitti_eigen_train.txt`` (22,599
pairs) / ``kitti_eigen_test_{improved,original}.txt`` (696 lines each)
inside its repo (Datasets/).  Pass their location via ``lists_dir`` or the
``FAL_NET_LISTS_DIR`` env var; files are plain "left.png right.png" lines.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from fal_net_tpu.data.transforms import Compose, normalize


# --------------------------------------------------------------------------
# IO helpers
# --------------------------------------------------------------------------

def _imread(path: str) -> np.ndarray:
    try:
        from imageio.v2 import imread  # type: ignore

        return np.asarray(imread(path))
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path))


def load_kitti_disp_png(path: str) -> np.ndarray:
    """uint16 disparity/depth PNG scaled by 256 (listdataset_test.py:43-46)."""
    return (_imread(path).astype(np.float32) / 256.0)[..., None]


def load_depth_npy(path: str) -> np.ndarray:
    return np.load(path).astype(np.float32)[..., None]


def load_make3d_depth(path: str) -> np.ndarray:
    """Make3D .mat Position3DGrid depth, NEAREST-resized to 1704x2272
    (listdataset_test.py:29-35)."""
    import scipy.io as sio
    from PIL import Image

    mat = sio.loadmat(path, verify_compressed_data_integrity=False)
    depth = mat["Position3DGrid"][:, :, 3]
    depth = Image.fromarray(depth).resize((1704, 2272), resample=Image.NEAREST)
    return np.asarray(depth)[..., None].astype(np.float32)


def split2list(items: List, split) -> Tuple[List, List]:
    """0 -> all test; 1 -> all train; float -> Bernoulli split (util.py:4-13)."""
    if split == 0:
        return [], list(items)
    if split == 1:
        return list(items), []
    rng = np.random.default_rng(0)
    mask = rng.random(len(items)) < float(split)
    train = [x for x, m in zip(items, mask) if m]
    test = [x for x, m in zip(items, mask) if not m]
    return train, test


def _lists_dir(lists_dir: Optional[str]) -> str:
    d = lists_dir or os.environ.get("FAL_NET_LISTS_DIR", "")
    if not d:
        raise ValueError(
            "split-list directory not given: pass lists_dir= or set "
            "FAL_NET_LISTS_DIR to the directory holding kitti_eigen_*.txt"
        )
    return d


# --------------------------------------------------------------------------
# Datasets
# --------------------------------------------------------------------------

@dataclass
class StereoTrainDataset:
    """Self-supervised training sampler (reference listdataset_train.py).

    Per item: optional random L/R swap with sign-flipped ``max_disp`` unless
    ``fix`` (the trainers always set fix=True -> x_pix=+max_pix,
    listdataset_train.py:74-81); co-transforms; normalization.  Yields
    ``{'left','right'}`` HWC float32 + ``'max_disp'`` scalar.
    """

    root: str
    pairs: List[Tuple[str, str]]
    co_transform: Optional[Compose] = None
    max_pix: float = 300.0
    fix: bool = True

    def __len__(self) -> int:
        return len(self.pairs)

    def get(self, index: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        lp, rp = self.pairs[index]
        if self.fix or rng.random() < 0.5:
            x_pix = self.max_pix
        else:
            lp, rp = rp, lp
            x_pix = -self.max_pix
        left = _imread(os.path.join(self.root, lp))
        right = _imread(os.path.join(self.root, rp))
        inputs = [left, right]
        if self.co_transform is not None:
            inputs, _ = self.co_transform(inputs, None, rng)
        return {
            "left": normalize(inputs[0]),
            "right": normalize(inputs[1]),
            "max_disp": np.float32(x_pix),
            "name": os.path.basename(lp)[:-4],
        }


@dataclass
class StereoEvalDataset:
    """Evaluation sampler: stereo pair + ground-truth target(s)."""

    root: str
    items: List[Tuple[Tuple[str, str], Optional[List[str]]]]
    target_loader: Optional[Callable[[str], np.ndarray]] = None

    def __len__(self) -> int:
        return len(self.items)

    def get(self, index: int, rng: Optional[np.random.Generator] = None):
        (lp, rp), targets = self.items[index]
        sample = {
            "left": normalize(_imread(os.path.join(self.root, lp))),
            "right": normalize(_imread(os.path.join(self.root, rp))),
            "name": os.path.basename(lp)[:-4],
        }
        if targets and self.target_loader is not None:
            sample["targets"] = [
                self.target_loader(os.path.join(self.root, t)) for t in targets
            ]
        return sample


# --------------------------------------------------------------------------
# Factories (reference-name compatible via the registry at the bottom)
# --------------------------------------------------------------------------

def _read_pair_list(path: str, root: str, check_exists: bool = True) -> List[Tuple[str, str]]:
    with open(path) as f:
        lines = [ln.split(" ") for ln in f.read().splitlines() if ln.strip()]
    pairs = [(a, b) for a, b, *_ in lines]
    if check_exists:
        pairs = [p for p in pairs if os.path.isfile(os.path.join(root, p[0]))]
    return pairs


def kitti_train(
    root: str,
    split=1,
    co_transform: Optional[Compose] = None,
    max_pix: float = 300.0,
    fix: bool = True,
    lists_dir: Optional[str] = None,
    train_split: str = "eigen_train_split",
):
    """Eigen train split (Kitti.py:26-60): 22,599 L/R pairs filtered to disk."""
    fname = {
        "eigen_train_split": "kitti_eigen_train.txt",
        "kitti_train_split": "kitti_train_files.txt",
    }[train_split]
    pairs = _read_pair_list(os.path.join(_lists_dir(lists_dir), fname), root)
    train, test = split2list(pairs, split)
    mk = lambda lst: StereoTrainDataset(root, lst, co_transform, max_pix, fix)
    return mk(train), StereoTrainDataset(root, test, None, max_pix, fix)


def kitti2015(root: str, split=0.0, disp: bool = True):
    """KITTI 2015 scene-flow (Kitti2015.py:26-96).

    disp=True: 200 ``training`` pairs at frame _10 with disp_occ_0 GT,
    split by ``split``.  disp=False: GT-free mode — train list = both _10
    and _11 frames of ``training``, test list = both frames of ``testing``.
    """
    def scan(mode: str, frames) -> list:
        out = []
        for i in range(200):
            for fr in frames:
                l = os.path.join(mode, "image_2", f"{i:06d}_{fr}.png")
                r = os.path.join(mode, "image_3", f"{i:06d}_{fr}.png")
                d = os.path.join(mode, "disp_occ_0", f"{i:06d}_10.png")
                if os.path.isfile(os.path.join(root, l)) and os.path.isfile(
                    os.path.join(root, r)
                ):
                    out.append(((l, r), [d] if (disp and fr == "10") else None))
        return out

    mk = lambda lst: StereoEvalDataset(root, lst, load_kitti_disp_png if disp else None)
    if disp:
        train, test = split2list(scan("training", ("10",)), split)
        return mk(train), mk(test)
    return mk(scan("training", ("10", "11"))), mk(scan("testing", ("10", "11")))


def kitti_eigen_test_improved(root: str, split=1, lists_dir: Optional[str] = None):
    """Improved Eigen split: GT + raw-velodyne depth PNGs derived from the
    image path (Kitti_eigen_test_improved.py:26-58)."""
    path = os.path.join(_lists_dir(lists_dir), "kitti_eigen_test_improved.txt")
    items = []
    for lp, rp in _read_pair_list(path, root, check_exists=False):
        drive = lp[:-29]
        frame = lp[-14:]
        gt = os.path.join(drive, "proj_depth", "groundtruth", "image_02", frame)
        velo = os.path.join(drive, "proj_depth", "velodyne_raw", "image_02", frame)
        if os.path.isfile(os.path.join(root, gt)) and os.path.isfile(os.path.join(root, lp)):
            items.append(((lp, rp), [gt, velo]))
    train, test = split2list(items, split)
    mk = lambda lst: StereoEvalDataset(root, lst, load_kitti_disp_png)
    return mk(train), mk(test)


def kitti_eigen_test_original(root: str, split=1, lists_dir: Optional[str] = None):
    """Original Eigen split: GT = .npy depths alongside the images
    (Kitti_eigen_test_original.py:25-49)."""
    path = os.path.join(_lists_dir(lists_dir), "kitti_eigen_test_original.txt")
    items = []
    for lp, rp in _read_pair_list(path, root, check_exists=False):
        gt = lp[:-3] + "npy"
        if os.path.isfile(os.path.join(root, gt)) and os.path.isfile(os.path.join(root, lp)):
            items.append(((lp, rp), [gt]))
    train, test = split2list(items, split)
    mk = lambda lst: StereoEvalDataset(root, lst, load_depth_npy)
    return mk(train), mk(test)


def cityscapes_jpg(
    root: str,
    split=1,
    co_transform: Optional[Compose] = None,
    max_pix: float = 300.0,
    fix: bool = True,
):
    """Cityscapes leftImg8bit/rightImg8bit JPG trees; 'val' subdir -> val
    split (Cityscapes_jpg.py:25-53)."""
    train_pairs, val_pairs = [], []
    left_root = os.path.join(root, "leftImg8bit")
    for ttv in sorted(os.listdir(left_root)):
        sub = os.path.join(left_root, ttv)
        if not os.path.isdir(sub):
            continue
        bucket = val_pairs if ttv == "val" else train_pairs
        for city in sorted(os.listdir(sub)):
            cdir = os.path.join(sub, city)
            if not os.path.isdir(cdir):
                continue
            for lpath in sorted(glob.iglob(os.path.join(cdir, "*.jpg"))):
                base = os.path.basename(lpath)[: -len("leftImg8bit.jpg")]
                l = os.path.join("leftImg8bit", ttv, city, base + "leftImg8bit.jpg")
                r = os.path.join("rightImg8bit", ttv, city, base + "rightImg8bit.jpg")
                if os.path.isfile(os.path.join(root, r)):
                    bucket.append((l, r))
    mk = lambda lst, ct: StereoTrainDataset(root, lst, ct, max_pix, fix)
    return mk(train_pairs, co_transform), mk(val_pairs, None)


def make3d(root: str, split=1):
    """Make3D zero-shot eval: *.jpg + depth_sph_corr*.mat (Make3D.py:26-44)."""
    images = sorted(glob.glob(os.path.join(root, "*.jpg")))
    items = []
    for p in images:
        base = os.path.basename(p)
        target = "depth_sph_corr" + base[3:-3] + "mat"
        items.append(((base, base), [target]))
    train, test = split2list(items, split)
    mk = lambda lst: StereoEvalDataset(root, lst, load_make3d_depth)
    return mk(train), mk(test)


@dataclass
class ConcatDataset:
    """Mixed-dataset training (the BASELINE 'KITTI + CityScapes mixed'
    config; the reference ships only the Cityscapes dataset class and
    defers the mixed trainer — README.md:30)."""

    parts: List

    def __len__(self) -> int:
        return sum(len(p) for p in self.parts)

    def get(self, index: int, rng: np.random.Generator):
        for p in self.parts:
            if index < len(p):
                return p.get(index, rng)
            index -= len(p)
        raise IndexError(index)


def mixed_train(datasets) -> ConcatDataset:
    return ConcatDataset(list(datasets))


# Reference-compatible name lookup (Datasets.__dict__[name] pattern).
REGISTRY: Dict[str, Callable] = {
    "Kitti": kitti_train,
    "kitti": kitti_train,
    "Kitti2015": kitti2015,
    "kitti2015": kitti2015,
    "Kitti_eigen_test_improved": kitti_eigen_test_improved,
    "Kitti_eigen_test_original": kitti_eigen_test_original,
    "Cityscapes_jpg": cityscapes_jpg,
    "cityscapes": cityscapes_jpg,
    "Make3D": make3d,
    "make3d": make3d,
}
