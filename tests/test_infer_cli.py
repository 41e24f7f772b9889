"""Batch-inference CLI tests (cli/infer.py): directory of PNGs in, 16-bit
disparity PNGs out, via both a live checkpoint and an AOT artifact."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from fal_net_tpu.models import create_model


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from flax import serialization

    tmp = tmp_path_factory.mktemp("infer")
    model = create_model("tiny", 5)
    x = jnp.zeros((1, 16, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, 2.0, 30.0, ret_disp=True)
    ckpt = tmp / "tiny.msgpack"
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(variables)))
    return str(ckpt), model, variables


@pytest.fixture()
def image_dir(tmp_path):
    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(0)
    # mixed sizes: native model size and one needing resize+rescale
    for name, (h, w) in [("a", (16, 32)), ("b", (24, 48)), ("c", (16, 32))]:
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{name}.png")
    return str(d)


def test_infer_cli_checkpoint(tmp_path, tiny_ckpt, image_dir):
    from fal_net_tpu.cli.infer import main as infer_main
    from fal_net_tpu.data.datasets import load_kitti_disp_png

    ckpt, _, _ = tiny_ckpt
    out = str(tmp_path / "out")
    infer_main([
        "--images", image_dir, "--out_dir", out,
        "--pretrained", ckpt, "--model", "tiny", "--no_levels", "5",
        "--height", "16", "--width", "32",
        "--max_disp", "30.0", "--batch_size", "2", "--colormap",
    ])
    for name, (h, w) in [("a", (16, 32)), ("b", (24, 48)), ("c", (16, 32))]:
        disp = load_kitti_disp_png(os.path.join(out, f"{name}_disp.png"))[..., 0]
        assert disp.shape == (h, w)
        assert (disp >= 0).all() and np.isfinite(disp).all()
        assert os.path.isfile(os.path.join(out, f"{name}_cmap.png"))
    # image b ran at width 32 but is written at width 48: disparity values
    # must be rescaled by 48/32
    a = load_kitti_disp_png(os.path.join(out, "a_disp.png"))
    b = load_kitti_disp_png(os.path.join(out, "b_disp.png"))
    assert b.mean() == pytest.approx(a.mean() * 48 / 32, rel=0.5)


def test_infer_cli_artifact(tmp_path, tiny_ckpt, image_dir):
    from fal_net_tpu.cli.export import main as export_main
    from fal_net_tpu.cli.infer import main as infer_main
    from fal_net_tpu.data.datasets import load_kitti_disp_png

    ckpt, model, variables = tiny_ckpt
    art = str(tmp_path / "tiny.jaxexp")
    export_main([
        "--pretrained", ckpt, "--model", "tiny", "--no_levels", "5",
        "--batch", "2", "--height", "16", "--width", "32",
        "--max_disp", "30.0", "--platforms", "cpu", "--out", art,
    ])
    out = str(tmp_path / "out_art")
    infer_main([
        "--images", image_dir, "--out_dir", out, "--artifact", art,
        "--save_pc",
    ])
    assert os.path.isfile(os.path.join(out, "a_disp.png"))
    assert os.path.isfile(os.path.join(out, "b.ply"))
    # artifact-mode output matches the live model on the native-size image
    img = np.asarray(Image.open(os.path.join(image_dir, "a.png")), np.float32)
    from fal_net_tpu.data.transforms import RGB_MEAN

    x = jnp.asarray(img / 255.0 - RGB_MEAN, jnp.float32)[None]
    ref = np.asarray(
        model.apply(variables, x, 2.0, 30.0, ret_disp=True).disp
    )[0, ..., 0]
    got = load_kitti_disp_png(os.path.join(out, "a_disp.png"))[..., 0]
    np.testing.assert_allclose(got, ref, atol=1 / 256 + 1e-4)


def test_infer_cli_artifact_rejects_checkpoint_flags(tmp_path, tiny_ckpt, image_dir):
    """Checkpoint-mode flags with --artifact would be silently ignored
    (baked into the export); the CLI must refuse instead (ADVICE r2)."""
    from fal_net_tpu.cli.export import main as export_main
    from fal_net_tpu.cli.infer import main as infer_main

    ckpt, _, _ = tiny_ckpt
    art = str(tmp_path / "tiny2.jaxexp")
    export_main([
        "--pretrained", ckpt, "--model", "tiny", "--no_levels", "5",
        "--batch", "2", "--height", "16", "--width", "32",
        "--max_disp", "30.0", "--platforms", "cpu", "--out", art,
    ])
    with pytest.raises(SystemExit, match="ms_post_process"):
        infer_main([
            "--images", image_dir, "--out_dir", str(tmp_path / "o"),
            "--artifact", art, "--ms_post_process",
        ])
    with pytest.raises(SystemExit, match="height"):
        infer_main([
            "--images", image_dir, "--out_dir", str(tmp_path / "o"),
            "--artifact", art, "--height", "64",
        ])


def test_infer_cli_name_collisions(tmp_path, tiny_ckpt):
    """img.1.png, img.jpg, img.png must produce three distinct outputs
    with the right geometry each (suffixed names are checked against the
    used set, so 'img.1' can't collide with the real file img.1.png)."""
    from fal_net_tpu.cli.infer import main as infer_main

    ckpt, _, _ = tiny_ckpt
    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(0)
    for fname in ("img.1.png", "img.jpg", "img.png"):
        arr = (rng.random((16, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / fname)
    out = str(tmp_path / "out")
    infer_main([
        "--images", str(d), "--out_dir", out,
        "--pretrained", ckpt, "--model", "tiny", "--no_levels", "5",
        "--height", "16", "--width", "32",
        "--max_disp", "30.0", "--batch_size", "2",
    ])
    written = sorted(f for f in os.listdir(out) if f.endswith("_disp.png"))
    assert len(written) == 3, written
