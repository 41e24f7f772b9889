"""Native C++ image-IO core: bit-exactness vs PIL/imageio + format coverage.

The native library (fal_net_tpu/native/io_native.cpp) replaces the host-side
decode half of the reference's data pipeline (torch DataLoader workers
calling PIL — /root/reference/Train_Stage1_K.py:156-160) with a GIL-free
libpng/libjpeg core.  Every test here pins the contract that switching the
decoder changes NO pixel anywhere in the framework.
"""

import io as _io
import os

import numpy as np
import pytest

from fal_net_tpu.native import io as nio

pytestmark = pytest.mark.skipif(
    not nio.available(), reason="native IO library did not build"
)


def _png_bytes(arr, mode=None):
    from PIL import Image

    im = Image.fromarray(arr) if mode is None else Image.fromarray(arr, mode=mode)
    buf = _io.BytesIO()
    im.save(buf, "PNG")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# decode parity
# ---------------------------------------------------------------------------

def test_png8_rgb_exact():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    out = nio.decode(_png_bytes(a))
    assert out.dtype == np.uint8 and out.shape == a.shape
    np.testing.assert_array_equal(out, a)


def test_png8_gray_returns_2d():
    rng = np.random.default_rng(1)
    g = rng.integers(0, 256, (41, 29), dtype=np.uint8)
    out = nio.decode(_png_bytes(g))
    assert out.shape == (41, 29) and out.dtype == np.uint8  # imageio convention
    np.testing.assert_array_equal(out, g)


def test_png8_rgba_keeps_alpha():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (11, 13, 4), dtype=np.uint8)
    out = nio.decode(_png_bytes(a))
    assert out.shape == (11, 13, 4)
    np.testing.assert_array_equal(out, a)


def test_png16_gray_exact():
    # KITTI disparity ground truth: 16-bit grayscale PNG, value = disp*256.
    rng = np.random.default_rng(3)
    u = rng.integers(0, 65536, (23, 31), dtype=np.uint16)
    out = nio.decode(_png_bytes(u.astype(np.int32), mode="I"))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, u)


def test_palette_png_expands_to_rgb():
    from PIL import Image

    rng = np.random.default_rng(4)
    a = rng.integers(0, 256, (16, 17, 3), dtype=np.uint8)
    pal = Image.fromarray(a).quantize(colors=64)
    buf = _io.BytesIO()
    pal.save(buf, "PNG")
    out = nio.decode(buf.getvalue())
    ref = np.asarray(pal.convert("RGB"))
    assert out.shape == ref.shape
    np.testing.assert_array_equal(out, ref)


def test_jpeg_matches_pil():
    # PIL links the same libjpeg — outputs must be bit-identical.
    from PIL import Image

    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    buf = _io.BytesIO()
    Image.fromarray(a).save(buf, "JPEG", quality=90)
    data = buf.getvalue()
    np.testing.assert_array_equal(
        nio.decode(data), np.asarray(Image.open(_io.BytesIO(data)))
    )


def test_jpeg_grayscale():
    from PIL import Image

    rng = np.random.default_rng(6)
    g = rng.integers(0, 256, (32, 40), dtype=np.uint8)
    buf = _io.BytesIO()
    Image.fromarray(g).save(buf, "JPEG", quality=95)
    out = nio.decode(buf.getvalue())
    assert out.shape == (32, 40)
    np.testing.assert_array_equal(out, np.asarray(Image.open(_io.BytesIO(buf.getvalue()))))


def test_corrupt_data_raises():
    with pytest.raises(ValueError):
        nio.decode(b"\x89PNG\r\n\x1a\n" + b"garbage" * 10)
    with pytest.raises(ValueError):
        nio.decode(b"not an image at all")


# ---------------------------------------------------------------------------
# batch decode (thread pool)
# ---------------------------------------------------------------------------

def test_decode_batch_mixed_formats():
    from PIL import Image

    rng = np.random.default_rng(7)
    arrays, bufs = [], []
    for i in range(9):
        a = rng.integers(0, 256, (24 + i, 36, 3), dtype=np.uint8)
        buf = _io.BytesIO()
        Image.fromarray(a).save(buf, "JPEG" if i % 3 == 0 else "PNG", quality=92)
        arrays.append(np.asarray(Image.open(_io.BytesIO(buf.getvalue()))))
        bufs.append(buf.getvalue())
    outs = nio.decode_batch(bufs, nthreads=4)
    assert len(outs) == 9
    for ref, out in zip(arrays, outs):
        np.testing.assert_array_equal(out, ref)


def test_decode_batch_empty():
    assert nio.decode_batch([]) == []


def test_decode_batch_reports_bad_index():
    good = _png_bytes(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        nio.decode_batch([good, b"broken bytes"])


# ---------------------------------------------------------------------------
# 16-bit PNG encode (KITTI GT container format)
# ---------------------------------------------------------------------------

def test_encode_png16_roundtrip_gray_and_rgb():
    rng = np.random.default_rng(8)
    g = rng.integers(0, 65536, (21, 33), dtype=np.uint16)
    np.testing.assert_array_equal(nio.decode(nio.encode_png16(g)), g)
    f = rng.integers(0, 65536, (19, 27, 3), dtype=np.uint16)
    np.testing.assert_array_equal(nio.decode(nio.encode_png16(f)), f)


def test_encode_png16_pil_cross_reads_gray(tmp_path):
    # PIL reads 16-bit *grayscale* correctly (the downcast bug is RGB-only).
    from PIL import Image

    rng = np.random.default_rng(9)
    g = rng.integers(0, 65536, (15, 18), dtype=np.uint16)
    p = tmp_path / "d.png"
    nio.imwrite_png16(p, g)
    np.testing.assert_array_equal(
        np.asarray(Image.open(p), dtype=np.uint16), g
    )


def test_encode_png16_rejects_bad_input():
    with pytest.raises(ValueError):
        nio.encode_png16(np.zeros((4, 4), np.uint8))  # wrong dtype
    with pytest.raises(ValueError):
        nio.encode_png16(np.zeros((4, 4, 2), np.uint16))  # bad channel count


def test_imread_imwrite_file_roundtrip(tmp_path):
    rng = np.random.default_rng(10)
    a = rng.integers(0, 65536, (12, 14, 3), dtype=np.uint16)
    p = tmp_path / "flow.png"
    nio.imwrite_png16(p, a)
    np.testing.assert_array_equal(nio.imread(p), a)
    np.testing.assert_array_equal(nio.imread_batch([p, p])[1], a)


# ---------------------------------------------------------------------------
# integration with the dataset loaders
# ---------------------------------------------------------------------------

def test_datasets_imread_uses_native(tmp_path, monkeypatch):
    from fal_net_tpu.data import datasets

    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    p = tmp_path / "img.png"
    p.write_bytes(_png_bytes(a))
    np.testing.assert_array_equal(datasets._imread(str(p)), a)

    # PIL/imageio fallback decodes the same bytes to the same pixels.
    monkeypatch.setattr(nio, "_lib", None)
    monkeypatch.setattr(nio, "_load_failed", True)
    np.testing.assert_array_equal(datasets._imread(str(p)), a)


def test_kitti_disp_png_loader_native(tmp_path):
    from fal_net_tpu.data.datasets import load_kitti_disp_png

    disp = np.array([[1.0, 2.5], [0.0, 100.25]], np.float32)
    p = tmp_path / "disp.png"
    nio.imwrite_png16(p, (disp * 256.0).astype(np.uint16))
    out = load_kitti_disp_png(str(p))
    assert out.shape == (2, 2, 1)
    np.testing.assert_allclose(out[..., 0], disp)


def test_kitti_flow_png_loader_native(tmp_path):
    # KITTI flow GT encoding (devkit): R = u*64 + 2^15, G = v*64 + 2^15,
    # B = valid.  The loader must invert it and zero invalid pixels.
    from fal_net_tpu.data.datasets import load_kitti_flow_png

    u = np.array([[1.0, -2.5], [0.25, 300.0]], np.float32)
    v = np.array([[-1.0, 0.5], [10.0, -300.0]], np.float32)
    valid = np.array([[1, 1], [0, 1]], np.float32)
    raw = np.stack(
        [u * 64 + 2.0**15, v * 64 + 2.0**15, valid], axis=-1
    ).astype(np.uint16)
    p = tmp_path / "flow.png"
    nio.imwrite_png16(p, raw)

    out = load_kitti_flow_png(str(p))
    assert out.shape == (2, 2, 3)
    np.testing.assert_allclose(out[..., 0], u * valid)
    np.testing.assert_allclose(out[..., 1], v * valid)
    np.testing.assert_allclose(out[..., 2], valid)


def test_flow_png_loader_rejects_8bit(tmp_path):
    from fal_net_tpu.data.datasets import load_kitti_flow_png

    p = tmp_path / "not_flow.png"
    p.write_bytes(_png_bytes(np.zeros((4, 4, 3), np.uint8)))
    with pytest.raises(ValueError):
        load_kitti_flow_png(str(p))


def test_stale_source_triggers_rebuild_logic():
    # build.is_stale is the lazy-rebuild hook; with a fresh .so it is False.
    from fal_net_tpu.native import build

    assert os.path.exists(build.lib_path())
    assert not build.is_stale()


def test_imread_falls_back_per_image_on_native_reject(tmp_path):
    """Files the native decoder rejects (e.g. CMYK JPEGs — libjpeg has no
    RGB conversion for them) must fall through to the PIL/imageio decoders
    per image instead of crashing the run (datasets.py::_imread)."""
    from PIL import Image

    from fal_net_tpu.data.datasets import _imread

    p = tmp_path / "cmyk.jpg"
    Image.new("CMYK", (20, 10), (10, 20, 30, 40)).save(p, "JPEG")
    arr = _imread(str(p))
    assert arr.ndim == 3 and arr.shape[:2] == (10, 20)
