"""End-to-end CLI smoke: train on a synthetic KITTI tree, then evaluate the
resulting checkpoint with the test CLI — the full user-facing flow."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from fal_net_tpu.cli import test as cli_test
from fal_net_tpu.cli import train as cli_train


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    rng = np.random.default_rng(3)

    # CityScapes corner (Kitti_CS mixed training)
    for side in ("leftImg8bit", "rightImg8bit"):
        d = root / side / "train" / "city0"
        d.mkdir(parents=True, exist_ok=True)
    for i in range(2):
        for side in ("leftImg8bit", "rightImg8bit"):
            img = rng.integers(0, 255, (72, 240, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                root / side / "train" / "city0" / f"f{i}_{side}.jpg"
            )

    pairs = []
    drive = "2011_09_26/2011_09_26_drive_0001_sync"
    for i in range(4):
        for cam in ("image_02", "image_03"):
            d = root / drive / cam / "data"
            d.mkdir(parents=True, exist_ok=True)
            img = rng.integers(0, 255, (72, 240, 3), dtype=np.uint8)
            Image.fromarray(img).save(d / f"{i:010d}.png")
        pairs.append(f"{drive}/image_02/data/{i:010d}.png {drive}/image_03/data/{i:010d}.png")
    lists = root / "lists"
    lists.mkdir()
    (lists / "kitti_eigen_train.txt").write_text("\n".join(pairs))

    # KITTI2015 corner for the test CLI (scene-flow items need both frames)
    for sub in ("image_2", "image_3", "disp_occ_0"):
        (root / "training" / sub).mkdir(parents=True, exist_ok=True)
    for i in range(2):
        for sub in ("image_2", "image_3"):
            for fr in ("10", "11"):
                img = rng.integers(0, 255, (64, 1242, 3), dtype=np.uint8)
                Image.fromarray(img).save(root / "training" / sub / f"{i:06d}_{fr}.png")
        disp = (rng.random((64, 1242)) * 80 * 256).astype(np.uint16)
        Image.fromarray(disp).save(root / "training" / "disp_occ_0" / f"{i:06d}_10.png")
    return root


@pytest.mark.slow
def test_train_then_eval_cli(tree, tmp_path):
    run_dir = tmp_path / "run"
    cli_train.main([
        "--stage", "1",
        "--model", "tiny",
        "--no_levels", "5",
        "--data_root", str(tree),
        "--lists_dir", str(tree / "lists"),
        "--batch_size", "2",
        "--epochs", "1",
        "--epoch_size", "2",
        "--crop_height", "48",
        "--crop_width", "96",
        "--a_p", "0",
        "--max_disp", "30",
        "--workers", "2",
        "--save_path", str(run_dir),
    ])
    ckpts = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(run_dir)
        for f in fs
        if f == "checkpoint.msgpack"
    ]
    assert len(ckpts) == 1

    out_dir = tmp_path / "eval"
    cli_test.main([
        "--tdataName", "Kitti2015",
        "--data_root", str(tree),
        "--pretrained", ckpts[0],
        "--max_disp", "30",
        "--no_ms_post_process",
        "--save_path", str(out_dir),
    ])
    assert (out_dir / "errors.txt").exists()


def test_convert_reference_checkpoint(tmp_path, tree):
    """Reference .pth.tar -> native conversion -> eval CLI round trip."""
    import sys

    import torch

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models.FAL_netB import FAL_netB

    ref = FAL_netB(None, no_levels=5)
    ckpt = tmp_path / "ref.pth.tar"
    torch.save(
        {"epoch": 3, "m_model": "FAL_netB", "state_dict": ref.state_dict(),
         "best_rmse": 1.0},
        ckpt,
    )

    from fal_net_tpu.cli import convert as cli_convert

    out = tmp_path / "converted"
    cli_convert.main(["--input", str(ckpt), "--output", str(out)])
    assert (out / "checkpoint.msgpack").exists()

    from fal_net_tpu.train.checkpoint import load_params_any

    variables, name, levels = load_params_any(str(out / "checkpoint.msgpack"))
    assert name == "FAL_netB" and levels == 5
    assert "backbone" in variables["params"]

    # and the converted checkpoint drives the eval CLI
    cli_test.main([
        "--tdataName", "Kitti2015",
        "--data_root", str(tree),
        "--pretrained", str(out / "checkpoint.msgpack"),
        "--max_disp", "30",
        "--no_ms_post_process",
        "--save_path", str(tmp_path / "eval2"),
    ])
    assert (tmp_path / "eval2" / "errors.txt").exists()


@pytest.mark.slow
def test_north_star_runbook_smoke(tmp_path):
    """The README's north-star runbook command path, end-to-end on a
    synthetic KITTI-raw tree: checkpoint -> cli.test on
    Kitti_eigen_test_improved (bucketed batched forward, ms-pp, Garg crop,
    camera tables) -> abs_rel in errors.txt (VERDICT r2 item 8).  Garg
    crop needs H>223 and a table width, so frames are 256x1242."""
    import re

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from fal_net_tpu.models import create_model

    root = tmp_path / "kitti_raw"
    rng = np.random.default_rng(0)
    drive = "2011_09_26/2011_09_26_drive_0002_sync"
    lines = []
    for i in (3, 7):
        frame = f"{i:010d}.png"
        for cam in ("image_02", "image_03"):
            d = root / drive / cam / "data"
            d.mkdir(parents=True, exist_ok=True)
            Image.fromarray(
                rng.integers(0, 255, (256, 1242, 3), dtype=np.uint8)
            ).save(d / frame)
        for kind in ("groundtruth", "velodyne_raw"):
            d = root / drive / "proj_depth" / kind / "image_02"
            d.mkdir(parents=True, exist_ok=True)
            depth = (rng.random((256, 1242)) * 80 * 256).astype(np.uint16)
            depth[rng.random((256, 1242)) < 0.7] = 0  # sparse GT
            Image.fromarray(depth).save(d / frame)
        lines.append(f"{drive}/image_02/data/{frame} {drive}/image_03/data/{frame}")
    lists = root / "lists"
    lists.mkdir()
    (lists / "kitti_eigen_test_improved.txt").write_text("\n".join(lines))

    model = create_model("tiny", 5)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)), 2.0, 30.0, ret_disp=True
    )
    ckpt = tmp_path / "tiny.msgpack"
    ckpt.write_bytes(serialization.to_bytes(jax.device_get(variables)))

    out = tmp_path / "eigen_eval"
    cli_test.main([
        "--tdataName", "Kitti_eigen_test_improved",
        "--data_root", str(root),
        "--lists_dir", str(lists),
        "--pretrained", str(ckpt),
        "--model", "tiny", "--no_levels", "5",
        "--max_disp", "30",
        "--save_path", str(out),
    ])
    txt = (out / "errors.txt").read_text()
    m = re.search(r"abs_rel\s+([0-9.]+)", txt)
    assert m, txt
    assert np.isfinite(float(m.group(1)))


def test_random_vgg_guard(tree, tmp_path):
    """a_p>0 without --vgg_weights fails fast; --allow_random_vgg is the
    explicit escape hatch (the reference always trains against pretrained
    ImageNet VGG features, loss_functions.py:10,48)."""
    base = [
        "--stage", "1", "--model", "tiny", "--no_levels", "5",
        "--data_root", str(tree), "--lists_dir", str(tree / "lists"),
        "--batch_size", "2", "--epochs", "1", "--epoch_size", "1",
        "--crop_height", "48", "--crop_width", "96",
        "--a_p", "0.01", "--max_disp", "30", "--workers", "2",
        "--save_path", str(tmp_path / "run"),
    ]
    with pytest.raises(ValueError, match="allow_random_vgg"):
        cli_train.main(base)
    # explicit opt-in trains one step against random VGG features
    cli_train.main(base + ["--allow_random_vgg"])
    assert any(
        f == "checkpoint.msgpack"
        for _, _, fs in os.walk(tmp_path / "run")
        for f in fs
    )


def test_eval_cli_from_artifact(tree, tmp_path):
    """cli.test --artifact: the eval CLI drives a deployed bundle (no
    checkpoint/model code) over KITTI-2015 and writes errors.txt."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from fal_net_tpu.cli import export as cli_export
    from fal_net_tpu.models import create_model

    model = create_model("tiny", 5)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 1242, 3)), 2.0, 30.0, ret_disp=True
    )
    ckpt = tmp_path / "tiny.msgpack"
    ckpt.write_bytes(serialization.to_bytes(jax.device_get(variables)))
    art = str(tmp_path / "eval.jaxexp")
    cli_export.main([
        "--pretrained", str(ckpt), "--model", "tiny", "--no_levels", "5",
        "--batch", "2", "--height", "64", "--width", "1242",
        "--max_disp", "30.0", "--platforms", "cpu", "--out", art,
    ])
    out = tmp_path / "eval_art"
    cli_test.main([
        "--tdataName", "Kitti2015",
        "--data_root", str(tree),
        "--artifact", art,
        "--no_ms_post_process",
        "--save_path", str(out),
    ])
    assert (out / "errors.txt").exists()
    assert (out / "metrics.json").exists()


def test_kitti_cs_mixed_training_cli(tree, tmp_path):
    """--dataset Kitti_CS (BASELINE config 5): one registry factory mixes
    the KITTI Eigen pairs with the CityScapes tree; one CLI train step
    runs end-to-end over the concatenated dataset."""
    from fal_net_tpu.data.datasets import kitti_cs_train

    train, _ = kitti_cs_train(str(tree), split=1, lists_dir=str(tree / "lists"))
    assert len(train) == 4 + 2  # 4 KITTI pairs + 2 CityScapes pairs
    rng = np.random.default_rng(0)
    assert train.get(0, rng)["left"].dtype == np.float32
    assert train.get(5, rng)["left"].dtype == np.float32  # CS item reachable

    cli_train.main([
        "--stage", "1", "--model", "tiny", "--no_levels", "5",
        "--dataset", "Kitti_CS",
        "--data_root", str(tree), "--lists_dir", str(tree / "lists"),
        "--batch_size", "2", "--epochs", "1", "--epoch_size", "1",
        "--crop_height", "48", "--crop_width", "96",
        "--a_p", "0", "--max_disp", "30", "--workers", "2",
        "--save_path", str(tmp_path / "run_cs"),
    ])
    assert any(
        f == "checkpoint.msgpack"
        for _, _, fs in os.walk(tmp_path / "run_cs")
        for f in fs
    )


def test_mixed_dataset():
    from fal_net_tpu.data.datasets import mixed_train

    class Fake:
        def __init__(self, n, tag):
            self.n, self.tag = n, tag

        def __len__(self):
            return self.n

        def get(self, i, rng):
            return {"tag": self.tag, "i": i}

    ds = mixed_train([Fake(3, "a"), Fake(2, "b")])
    assert len(ds) == 5
    assert ds.get(0, None)["tag"] == "a"
    assert ds.get(3, None) == {"tag": "b", "i": 0}
    assert ds.get(4, None) == {"tag": "b", "i": 1}


def test_train_cli_resume(tree, tmp_path, monkeypatch):
    """--resume continues from a full-state checkpoint (params + Adam
    moments + step) written by a previous CLI run; --save_every_steps
    actually fires mid-epoch (counted — the mid-epoch checkpoint shares
    the epoch-end file name, so file existence alone can't prove it)."""
    import fal_net_tpu.train.trainer as trainer_mod

    saves = []
    real_save = trainer_mod.save_checkpoint
    monkeypatch.setattr(
        trainer_mod, "save_checkpoint",
        lambda *a, **k: (saves.append(k.get("meta", {})), real_save(*a, **k))[1],
    )
    run_dir = tmp_path / "run"
    base = [
        "--stage", "1", "--model", "tiny", "--no_levels", "5",
        "--data_root", str(tree), "--lists_dir", str(tree / "lists"),
        "--batch_size", "2", "--epoch_size", "2",
        "--crop_height", "48", "--crop_width", "96",
        "--a_p", "0", "--max_disp", "30", "--workers", "2",
        "--save_path", str(run_dir),
    ]
    cli_train.main(base + ["--epochs", "1", "--save_every_steps", "1"])
    ckpts = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(run_dir)
        for f in fs
        if f == "checkpoint.msgpack"
    ]
    assert len(ckpts) == 1
    # epoch_size=2 with save_every_steps=1 -> 2 mid-epoch saves (meta
    # epoch == current-1 for resume-re-runs-this-epoch semantics) plus
    # the epoch-end save
    mid = [m for m in saves if m.get("epoch") == -1]
    assert len(mid) == 2, [m.get("epoch") for m in saves]
    # resume for one more epoch from the full-state checkpoint (the
    # epochs=2 run auto-names a new save dir, e2es vs e1es)
    cli_train.main(base + ["--epochs", "2", "--resume", ckpts[0]])
    metas = [
        json.load(open(os.path.join(dp, f)))
        for dp, _, fs in os.walk(run_dir)
        for f in fs
        if f == "checkpoint.json"
    ]
    assert max(m["epoch"] for m in metas) == 1  # epoch 1 ran after resume
    assert all(m["epoch"] < 2 for m in metas)  # and only epoch 1


@pytest.mark.slow
def test_selfcheck_cli_passes():
    """falnet-selfcheck validates an install end-to-end (backend, forward
    bounds, fused-kernel numerics vs the jnp oracle, one train step);
    exits 0 on this healthy CPU backend."""
    from fal_net_tpu.cli import selfcheck

    with pytest.raises(SystemExit) as e:
        selfcheck.main([])
    assert e.value.code == 0


def test_train_cli_optimizer_flags_reach_config(monkeypatch):
    """Every reference optimizer/schedule flag maps through build_parser
    into the TrainConfig the Trainer receives (MIGRATION.md training
    table; reference flags at Train_Stage1_K.py:51-58)."""
    captured = {}

    class _StubTrainer:
        def __init__(self, cfg, stage=None, mesh=None, **kw):
            captured["cfg"] = cfg
            captured["stage"] = stage

        def fit(self, **kw):
            return {"history": [], "best_metric": "train_loss", "best_value": 0.0}

    monkeypatch.setattr(cli_train, "Trainer", _StubTrainer)
    cli_train.main([
        "--data_root", "/nonexistent", "--stage", "1",
        "--momentum", "0.6", "--beta", "0.99",
        "--milestones", "20", "30",
        "--wd", "4e-4", "--bias_decay", "1e-4",
        "--print-freq", "7", "--tbatch_size", "2", "--rel_baset", "1.2",
    ])
    cfg = captured["cfg"]
    assert cfg.beta1 == 0.6 and cfg.beta2 == 0.99
    assert cfg.milestones == (20, 30)
    assert cfg.weight_decay == 4e-4 and cfg.bias_decay == 1e-4
    assert cfg.print_freq == 7
    assert cfg.val_batch_size == 2
    assert cfg.rel_baseline_val == 1.2
