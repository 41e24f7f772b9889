"""Fused-MED runtime gate (ops/med_selfcheck.py).

Round-5 motivation: at (w=128, N=33, bounds 2..18) the Mosaic-COMPILED
fused kernel returned all-zero pan/maskR on-chip while interpret mode and
every previously-compiled shape were exact — stage-1 training then ran
against a black synthesized view with no error raised anywhere.  The gate
compares the kernel against the jnp oracle at a run's exact shape before
the first step and falls back to the jnp MED path on disagreement.
"""

import warnings

import numpy as np
import pytest

from fal_net_tpu.ops.med_selfcheck import fused_med_selfcheck
from fal_net_tpu.parallel.mesh import make_mesh
from fal_net_tpu.train import Stage1Config, Trainer
from tests.test_train import SyntheticStereo, _tiny_cfg


def test_selfcheck_passes_in_interpret_mode_at_regression_shape():
    """The exact on-chip failure shape is exact in interpret mode."""
    ok, maxdiff = fused_med_selfcheck(
        128, 33, 2.0, 18.0, height=16, interpret=True
    )
    assert ok, f"maxdiff {maxdiff}"
    assert maxdiff < 1e-4


def test_selfcheck_vacuous_off_tpu():
    """No Mosaic compiler -> the fused path is never selected -> (True, 0)
    without dispatching anything."""
    ok, maxdiff = fused_med_selfcheck(128, 33, 2.0, 18.0)
    assert ok and maxdiff == 0.0


def test_selfcheck_detects_injected_mismatch(monkeypatch):
    """A kernel that returns garbage pan is flagged."""
    from fal_net_tpu.ops import med_pallas

    def broken(logits, image, min_disp, max_disp, **kw):
        out = med_pallas.med_outputs(
            logits, image, min_disp, max_disp,
            ret_disp=kw.get("ret_disp", True),
            ret_pan=kw.get("ret_pan", False),
            ret_subocc=kw.get("ret_subocc", False),
        )
        # the observed on-chip signature: pan/maskR zeroed
        return out._replace(
            pan=out.pan * 0.0 if out.pan is not None else None,
            maskR=out.maskR * 0.0 if out.maskR is not None else None,
        )

    monkeypatch.setattr(
        "fal_net_tpu.ops.med_pallas.med_outputs_fused", broken
    )
    ok, maxdiff = fused_med_selfcheck(64, 9, 2.0, 18.0, height=8, interpret=True)
    assert not ok
    assert maxdiff > 0.1


def test_trainer_falls_back_to_reference_med_on_failed_check(monkeypatch):
    """A failed gate flips student (and teacher) to med_impl='reference'
    and warns; training still runs."""
    monkeypatch.setattr(
        "fal_net_tpu.ops.med_selfcheck.fused_med_selfcheck",
        lambda *a, **kw: (False, 0.7),
    )
    cfg = Stage1Config(**_tiny_cfg(epochs=1, epoch_size=2))
    tr = Trainer(cfg, stage="stage1", mesh=make_mesh(1),
                 train_dataset=SyntheticStereo())
    assert tr.model.med_impl == "auto"
    with pytest.warns(RuntimeWarning, match="fused MED kernel disagrees"):
        tr.setup()
    assert tr.model.med_impl == "reference"
    assert tr.med_selfcheck_result == (False, 0.7)
    res = tr.fit()
    assert np.isfinite(res["history"][-1]["loss"])


def test_trainer_gate_passes_and_keeps_auto(monkeypatch):
    called = {}

    def fake(*a, **kw):
        called["args"] = (a, kw)
        return True, 3e-4

    monkeypatch.setattr(
        "fal_net_tpu.ops.med_selfcheck.fused_med_selfcheck", fake
    )
    cfg = Stage1Config(**_tiny_cfg())
    tr = Trainer(cfg, stage="stage1", mesh=make_mesh(1),
                 train_dataset=SyntheticStereo())
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        tr.setup()
    assert tr.model.med_impl == "auto"
    assert tr.med_selfcheck_result == (True, 3e-4)
    # checked at the run's exact crop + levels + bounds
    (a, kw) = called["args"]
    assert a[:2] == (cfg.crop_size[1], cfg.num_levels)
    assert kw["height"] == cfg.crop_size[0]


class _ValDS:
    """Validation frames at a DIFFERENT shape (32x1242, a KITTI-table
    width) than the training crop (32x64) — each validation bucket
    compiles its own kernel binary, so it gets its own gate."""

    def __len__(self):
        return 2

    def get(self, i, rng_=None):
        r = np.random.default_rng(100 + i)
        disp = (r.random((32, 1242, 1)) * 10).astype(np.float32)
        disp[disp < 3] = 0
        return {
            "left": r.random((32, 1242, 3)).astype(np.float32) - 0.4,
            "right": r.random((32, 1242, 3)).astype(np.float32) - 0.4,
            "targets": [disp],
        }


def test_validate_gates_each_shape_and_falls_back(monkeypatch):
    """A kernel that passes at the training crop but fails at the
    validation shape: setup keeps med_impl='auto', validate warns once,
    runs through the jnp path, and caches the verdict per shape."""
    calls = []

    def fake(width, n, mn, mx, **kw):
        calls.append((width, kw.get("height")))
        return width == 64, 0.9  # crop w=64 OK, val w=1242 broken

    monkeypatch.setattr(
        "fal_net_tpu.ops.med_selfcheck.fused_med_selfcheck", fake
    )
    cfg = Stage1Config(**_tiny_cfg())
    tr = Trainer(cfg, stage="stage1", mesh=make_mesh(1),
                 train_dataset=SyntheticStereo())
    tr.setup()
    assert tr.model.med_impl == "auto"

    with pytest.warns(RuntimeWarning, match="validation shape 32x1242"):
        m = tr.validate(_ValDS())
    assert np.isfinite(m["rmse"])
    assert tr._val_med_ok == {(32, 1242): False}
    # the TRAINING model is untouched — only validation fell back
    assert tr.model.med_impl == "auto"
    assert (1242, 32) in [(w, h) for w, h in calls]

    # second validate: verdict cached, no re-check, no second warning
    n_calls = len(calls)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        m2 = tr.validate(_ValDS())
    assert len(calls) == n_calls
    np.testing.assert_allclose(m2["rmse"], m["rmse"], rtol=1e-6)


def test_validate_gate_respects_config_flag(monkeypatch):
    def boom(*a, **kw):
        raise AssertionError("gate ran despite med_selfcheck=False")

    monkeypatch.setattr(
        "fal_net_tpu.ops.med_selfcheck.fused_med_selfcheck", boom
    )
    cfg = Stage1Config(**_tiny_cfg(med_selfcheck=False))
    tr = Trainer(cfg, stage="stage1", mesh=make_mesh(1),
                 train_dataset=SyntheticStereo())
    tr.setup()
    assert np.isfinite(tr.validate(_ValDS())["rmse"])


def test_evaluator_save_pan_gate_falls_back(monkeypatch, tmp_path):
    """The Evaluator's save_pan path (the only eval path selecting the
    fused kernel) flips to the jnp MED path on a failed gate and still
    exports correct artifacts."""
    import os

    from fal_net_tpu.eval.evaluate import EvalConfig, Evaluator
    from tests.test_evaluate import SyntheticEval, _make_model

    monkeypatch.setattr(
        "fal_net_tpu.ops.med_selfcheck.fused_med_selfcheck",
        lambda *a, **kw: (False, 0.8),
    )
    model, variables = _make_model()
    cfg = EvalConfig(
        dataset="Kitti2015", ms_post_process=False,
        save=True, save_pan=True, save_path=str(tmp_path), print_freq=1,
    )
    ev = Evaluator(model, variables, cfg)
    with pytest.warns(RuntimeWarning, match="eval shape 64x1242"):
        ev.run(SyntheticEval(n=1), evaluate=False)
    assert ev.model.med_impl == "reference"
    assert os.path.isfile(tmp_path / "pan" / "0000000000.png")


def test_evaluator_gate_skipped_without_save_pan(monkeypatch, tmp_path):
    """Plain disparity eval never selects the fused kernel — no gate."""
    from fal_net_tpu.eval.evaluate import EvalConfig, Evaluator
    from tests.test_evaluate import SyntheticEval, _make_model

    def boom(*a, **kw):
        raise AssertionError("gate ran on a disp-only eval")

    monkeypatch.setattr(
        "fal_net_tpu.ops.med_selfcheck.fused_med_selfcheck", boom
    )
    model, variables = _make_model()
    cfg = EvalConfig(
        dataset="Kitti2015", ms_post_process=False,
        save_path=str(tmp_path), print_freq=1,
    )
    metrics = Evaluator(model, variables, cfg).run(SyntheticEval(n=1))
    assert np.isfinite(metrics["abs_rel"])


def test_trainer_gate_can_be_disabled(monkeypatch):
    def boom(*a, **kw):  # must never be called
        raise AssertionError("gate ran despite med_selfcheck=False")

    monkeypatch.setattr(
        "fal_net_tpu.ops.med_selfcheck.fused_med_selfcheck", boom
    )
    cfg = Stage1Config(**_tiny_cfg(med_selfcheck=False))
    tr = Trainer(cfg, stage="stage1", mesh=make_mesh(1),
                 train_dataset=SyntheticStereo())
    tr.setup()
    assert tr.model.med_impl == "auto"
