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
