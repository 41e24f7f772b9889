"""End-to-end Evaluator test: tiny model, synthetic KITTI2015-style data."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from fal_net_tpu.eval.evaluate import EvalConfig, Evaluator
from fal_net_tpu.models import create_model


class SyntheticEval:
    """KITTI2015-protocol-compatible synthetic samples (width in the
    intrinsics table)."""

    def __init__(self, n=2, h=64, w=1242):
        self.n, self.h, self.w = n, h, w

    def __len__(self):
        return self.n

    def get(self, index, rng=None):
        r = np.random.default_rng(index)
        left = r.random((self.h, self.w, 3)).astype(np.float32) - 0.5
        right = r.random((self.h, self.w, 3)).astype(np.float32) - 0.5
        disp = (r.random((self.h, self.w, 1)) * 80).astype(np.float32)
        disp[disp < 20] = 0  # sparse
        return {"left": left, "right": right, "targets": [disp], "name": f"s{index}"}


def _make_model():
    model = create_model("tiny", 5)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 1242, 3)), 2.0, 300.0, ret_disp=True
    )
    return model, variables


def test_evaluator_kitti2015_metrics(tmp_path):
    model, variables = _make_model()
    cfg = EvalConfig(
        dataset="Kitti2015",
        ms_post_process=True,
        save_path=str(tmp_path),
        print_freq=1,
    )
    metrics = Evaluator(model, variables, cfg).run(SyntheticEval())
    for k in ("abs_rel", "rms", "a1", "epe", "sec_per_image"):
        assert k in metrics
        assert np.isfinite(metrics[k])
    assert os.path.isfile(tmp_path / "errors.txt")


def test_evaluator_artifact_export(tmp_path):
    model, variables = _make_model()
    cfg = EvalConfig(
        dataset="Kitti2015",
        ms_post_process=False,
        save=True,
        save_pan=True,
        save_input=True,
        save_point_cloud=True,
        save_path=str(tmp_path),
        print_freq=1,
    )
    Evaluator(model, variables, cfg).run(SyntheticEval(n=1), evaluate=False)
    assert os.path.isfile(tmp_path / "disp" / "0000000000.png")
    assert os.path.isfile(tmp_path / "pan" / "0000000000.png")
    assert os.path.isfile(tmp_path / "input" / "0000000000.png")
    assert os.path.isfile(tmp_path / "pc" / "0000000000.ply")
    # ply header sane
    head = open(tmp_path / "pc" / "0000000000.ply").read(200)
    assert head.startswith("ply") and "element vertex" in head


def test_flip_pp_path(tmp_path):
    model, variables = _make_model()
    cfg = EvalConfig(
        dataset="Kitti2015",
        f_post_process=True,
        ms_post_process=False,
        save_path=str(tmp_path),
    )
    metrics = Evaluator(model, variables, cfg).run(SyntheticEval(n=1))
    assert np.isfinite(metrics["abs_rel"])


class SyntheticMake3D:
    """Make3D-protocol samples: dense depth GT (the .mat Position3DGrid
    depth channel), 1704x2272-ish geometry scaled down for the test."""

    def __init__(self, n=2, h=64, w=256):
        self.n, self.h, self.w = n, h, w

    def __len__(self):
        return self.n

    def get(self, index, rng=None):
        r = np.random.default_rng(index)
        left = r.random((self.h, self.w, 3)).astype(np.float32) - 0.5
        depth = (r.random((self.h, self.w, 1)) * 60 + 2).astype(np.float32)
        return {"left": left, "right": left, "targets": [depth], "name": f"m{index}"}


def test_evaluator_make3d_branch(tmp_path):
    """The Make3D Evaluator branch (median scaling, 70 m cap, log10 —
    evaluate.py Make3D arm) runs end-to-end and emits the metric suite."""
    model, variables = _make_model()
    cfg = EvalConfig(
        dataset="Make3D",
        ms_post_process=False,
        save_path=str(tmp_path),
        print_freq=1,
    )
    metrics = Evaluator(model, variables, cfg).run(SyntheticMake3D())
    for k in ("abs_rel", "rms", "sec_per_image"):
        assert k in metrics, k
        assert np.isfinite(metrics[k]), k
    assert os.path.isfile(tmp_path / "errors.txt")
