"""Dataset catalog: KITTI (Eigen), KITTI 2015, Cityscapes, Make3D.

Re-implements the reference ``Datasets/`` factories with the same split
conventions and target-loading protocols (see each class's citations), as
plain-python samplers yielding numpy dicts.  No torch DataLoader: batching,
shuffling and device prefetch live in :mod:`fal_net_tpu.data.loader`.

Split-list files: the reference ships ``kitti_eigen_train.txt`` (22,600
pairs) / ``kitti_eigen_test_{improved,original}.txt`` (697 lines each)
inside its repo (Datasets/).  The same three Eigen splits are BUNDLED
here (:mod:`fal_net_tpu.data.lists`, compact binary form, byte-parity
tested) and used when no directory is given; pass ``lists_dir`` or set
the ``FAL_NET_LISTS_DIR`` env var to override with external files
(plain "left.png right.png" lines — required for non-bundled lists such
as ``kitti_train_files.txt``).
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
    """Decode one image file.  Prefers the native C++ core (GIL-free libpng/
    libjpeg, bit-identical to PIL — see fal_net_tpu/native/io_native.cpp);
    falls back to imageio/PIL when the library can't build, and per image
    when the native decoder rejects a file PIL can handle (e.g. CMYK/YCCK
    JPEGs, where libjpeg has no RGB conversion)."""
    from fal_net_tpu.native import io as native_io

    if native_io.available():
        try:
            return native_io.imread(path)
        except (ValueError, RuntimeError):
            pass  # fall through to the PIL/imageio decoders below
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


def load_kitti_flow_png(path: str) -> np.ndarray:
    """KITTI optical-flow PNG: uint16 RGB where u=(R-2^15)/64, v=(G-2^15)/64
    and B is the validity mask.  Returns (H, W, 3) float32 [u, v, valid].

    The reference lists flow_occ targets in its scene-flow items
    (Datasets/Kitti2015.py:36-52) but its test ListDataset never actually
    loads them (listdataset_test.py:86-92 only loads targets[0] with the
    disparity loader) — this loader closes that gap.

    PIL/imageio silently downcast 16-bit RGB PNGs to uint8 (corrupting the
    fixed-point encoding); the native decoder preserves full bit depth
    (cv2 IMREAD_UNCHANGED is the fallback when the native lib can't build).
    """
    from fal_net_tpu.native import io as native_io

    if native_io.available():
        raw = native_io.imread(path)  # RGB channel order
        if raw.ndim != 3 or raw.shape[-1] < 3 or raw.dtype != np.uint16:
            raise ValueError(
                f"not a KITTI flow PNG (need 3 uint16 channels): {path}"
            )
        rgb = raw.astype(np.float32)
        u = (rgb[..., 0] - 2.0**15) / 64.0
        v = (rgb[..., 1] - 2.0**15) / 64.0
        valid = (rgb[..., 2] > 0).astype(np.float32)
        return np.stack([u * valid, v * valid, valid], axis=-1)

    try:
        import cv2
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "KITTI flow PNGs are 16-bit RGB, which PIL/imageio downcast to "
            "uint8; reading them requires the native IO lib or opencv (cv2)"
        ) from e

    raw = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if raw is None or raw.ndim != 3 or raw.shape[-1] < 3 or raw.dtype != np.uint16:
        raise ValueError(f"not a KITTI flow PNG (need 3 uint16 channels): {path}")
    bgr = raw.astype(np.float32)  # cv2 loads BGR
    u = (bgr[..., 2] - 2.0**15) / 64.0
    v = (bgr[..., 1] - 2.0**15) / 64.0
    valid = (bgr[..., 0] > 0).astype(np.float32)
    return np.stack([u * valid, v * valid, valid], axis=-1)


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


def _list_lines(lists_dir: Optional[str], fname: str) -> List[str]:
    """Lines of split list ``fname``: from ``lists_dir`` / the
    ``FAL_NET_LISTS_DIR`` env var when given, else from the bundled Eigen
    splits (:mod:`fal_net_tpu.data.lists`)."""
    d = lists_dir or os.environ.get("FAL_NET_LISTS_DIR", "")
    if d:
        with open(os.path.join(d, fname)) as f:
            return [ln for ln in f.read().splitlines() if ln.strip()]
    from fal_net_tpu.data.lists import bundled_list_lines

    try:
        return bundled_list_lines(fname)
    except KeyError:
        raise ValueError(
            f"split list {fname!r} is not bundled: pass lists_dir= or set "
            "FAL_NET_LISTS_DIR to the directory holding it"
        ) from None


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
    """Evaluation sampler: stereo pair + ground-truth target(s).

    Items are ``((paths...), targets)`` where paths is the (L, R) pair or —
    for KITTI-2015 scene-flow items (Kitti2015.py:36-52) — the 4-tuple
    (L_t, R_t, L_t+1, R_t+1), surfaced as ``left_t1``/``right_t1``.
    ``target_loaders`` optionally assigns one loader per target slot (e.g.
    [disparity, flow]); a ``None`` slot is skipped.
    """

    root: str
    items: List[Tuple[Tuple[str, ...], Optional[List[str]]]]
    target_loader: Optional[Callable[[str], np.ndarray]] = None
    target_loaders: Optional[List[Optional[Callable[[str], np.ndarray]]]] = None
    # Decode the t+1 stereo pair of scene-flow items.  Disparity-only
    # consumers (Trainer.validate, the KITTI-2015 Evaluator) never read it;
    # skipping halves their per-item image IO.
    load_t1: bool = True
    # Yield 'left' as the source uint8 RGB instead of normalized float32
    # (the /255 − mean normalization then runs on device, equal to 1 ulp —
    # data/transforms.py::normalize_device).  4x fewer host->device bytes;
    # the Evaluator adapts by dtype.  Settable post-construction:
    #     ds.raw_uint8 = True
    raw_uint8: bool = False

    def __len__(self) -> int:
        return len(self.items)

    def get(self, index: int, rng: Optional[np.random.Generator] = None):
        paths, targets = self.items[index]
        lp, rp = paths[0], paths[1]
        left = _imread(os.path.join(self.root, lp))
        sample = {
            "left": np.ascontiguousarray(left) if self.raw_uint8 else normalize(left),
            "right": normalize(_imread(os.path.join(self.root, rp))),
            "name": os.path.basename(lp)[:-4],
        }
        if len(paths) >= 4 and self.load_t1:
            sample["left_t1"] = normalize(_imread(os.path.join(self.root, paths[2])))
            sample["right_t1"] = normalize(_imread(os.path.join(self.root, paths[3])))
        if targets:
            loaders = self.target_loaders or [self.target_loader] * len(targets)
            loaded = [
                ld(os.path.join(self.root, t))
                for t, ld in zip(targets, loaders)
                if ld is not None
            ]
            if loaded:
                sample["targets"] = loaded
        return sample


# --------------------------------------------------------------------------
# Factories (reference-name compatible via the registry at the bottom)
# --------------------------------------------------------------------------

def _pairs_from_lines(
    lines: List[str], root: str, check_exists: bool = True
) -> List[Tuple[str, str]]:
    pairs = [(a, b) for a, b, *_ in (ln.split(" ") for ln in lines)]
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
    """Eigen train split (Kitti.py:26-60): 22,600 L/R pairs filtered to disk."""
    fname = {
        "eigen_train_split": "kitti_eigen_train.txt",
        "kitti_train_split": "kitti_train_files.txt",
    }[train_split]
    pairs = _pairs_from_lines(_list_lines(lists_dir, fname), root)
    train, test = split2list(pairs, split)
    mk = lambda lst: StereoTrainDataset(root, lst, co_transform, max_pix, fix)
    return mk(train), StereoTrainDataset(root, test, None, max_pix, fix)


def kitti2015(
    root: str, split=0.0, disp: bool = True, of: bool = False, load_t1: bool = True
):
    """KITTI 2015 scene-flow (Kitti2015.py:26-96).

    disp or of (scene-flow mode, Kitti2015.py:36-52): 200 ``training``
    items of FOUR images — the stereo pair at frames _10 and _11 — with
    ``[disp_occ_0, flow_occ]`` targets, kept only when all four images
    exist, split by ``split``.  Samples expose the t+1 pair as
    ``left_t1``/``right_t1``; the disparity target loads when ``disp`` and
    the flow target (u, v, valid — a loader the reference lists but never
    wires up) when ``of``.

    Neither (GT-free mode, Kitti2015.py:53-68): train list = both _10 and
    _11 frames of ``training`` as separate pairs, test list = both frames
    of ``testing``.
    """
    if disp or of:
        items = []
        for i in range(200):
            paths = tuple(
                os.path.join("training", cam, f"{i:06d}_{fr}.png")
                for fr in ("10", "11")
                for cam in ("image_2", "image_3")
            )  # (L_10, R_10, L_11, R_11)
            if not all(os.path.isfile(os.path.join(root, p)) for p in paths):
                continue  # reference requires all 4 frames (Kitti2015.py:44-49)
            d = os.path.join("training", "disp_occ_0", f"{i:06d}_10.png")
            f = os.path.join("training", "flow_occ", f"{i:06d}_10.png")
            items.append((paths, [d, f]))
        if not items:
            # Reference semantics skip items missing ANY of the 4 frames
            # (Kitti2015.py:44-49); a pruned directory holding only the _10
            # pairs + disp GT would otherwise silently evaluate 0 samples.
            probe = os.path.join(root, "training", "image_2", "000000_10.png")
            if os.path.isfile(probe):
                import warnings

                warnings.warn(
                    f"kitti2015: scene-flow mode found _10 frames under "
                    f"{root} but no complete (_10, _11) quadruples - the "
                    "reference requires all 4 images per item "
                    "(Kitti2015.py:44-49). The validation set is EMPTY; "
                    "restore the _11 frames or use disp=False of=False "
                    "(GT-free mode)."
                )
        loaders = [
            load_kitti_disp_png if disp else None,
            load_kitti_flow_png if of else None,
        ]
        mk = lambda lst: StereoEvalDataset(
            root, lst, target_loaders=loaders, load_t1=load_t1
        )
        train, test = split2list(items, split)
        return mk(train), mk(test)

    def scan(mode: str) -> list:
        out = []
        for i in range(200):
            for fr in ("10", "11"):
                l = os.path.join(mode, "image_2", f"{i:06d}_{fr}.png")
                r = os.path.join(mode, "image_3", f"{i:06d}_{fr}.png")
                if os.path.isfile(os.path.join(root, l)) and os.path.isfile(
                    os.path.join(root, r)
                ):
                    out.append(((l, r), None))
        return out

    mk = lambda lst: StereoEvalDataset(root, lst)
    return mk(scan("training")), mk(scan("testing"))


def kitti_eigen_test_improved(root: str, split=1, lists_dir: Optional[str] = None):
    """Improved Eigen split: GT + raw-velodyne depth PNGs derived from the
    image path (Kitti_eigen_test_improved.py:26-58)."""
    lines = _list_lines(lists_dir, "kitti_eigen_test_improved.txt")
    items = []
    for lp, rp in _pairs_from_lines(lines, root, check_exists=False):
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
    lines = _list_lines(lists_dir, "kitti_eigen_test_original.txt")
    items = []
    for lp, rp in _pairs_from_lines(lines, root, check_exists=False):
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


def kitti_cs_train(
    root: str,
    split=1,
    co_transform: Optional[Compose] = None,
    max_pix: float = 300.0,
    fix: bool = True,
    lists_dir: Optional[str] = None,
):
    """KITTI + CityScapes mixed training (BASELINE config 5; the reference
    ships the Cityscapes dataset but defers the mixed trainer —
    README.md:30).  ``root`` is one directory containing both trees, or
    ``'KITTI_ROOT,CITYSCAPES_ROOT'``.  Validation stays KITTI-side."""
    parts = [p for p in root.split(",") if p]
    k_root = parts[0]
    c_root = parts[1] if len(parts) > 1 else parts[0]
    k_train, k_val = kitti_train(
        k_root, split, co_transform, max_pix, fix, lists_dir
    )
    c_train, _ = cityscapes_jpg(c_root, split, co_transform, max_pix, fix)
    return mixed_train([k_train, c_train]), k_val


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
    "Kitti_CS": kitti_cs_train,  # BASELINE config 5: mixed training
    "kitti_cs": kitti_cs_train,
    "Make3D": make3d,
    "make3d": make3d,
}
