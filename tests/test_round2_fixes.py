"""Regression tests for the round-2 fixes (VERDICT weak items + ADVICE)."""

import threading
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fal_net_tpu.models import create_model


# ---------------------------------------------------------------------------
# load_params_any: explicit structure detection (ADVICE/VERDICT weak #8)
# ---------------------------------------------------------------------------


def test_load_params_any_rejects_unknown_structure(tmp_path):
    from flax import serialization

    from fal_net_tpu.train.checkpoint import load_params_any

    bogus = tmp_path / "bogus.msgpack"
    bogus.write_bytes(
        serialization.msgpack_serialize({"weights": {"w": np.zeros(3)}})
    )
    with pytest.raises(ValueError, match="unrecognized checkpoint structure"):
        load_params_any(str(bogus))


def test_load_params_any_accepts_all_native_layouts(tmp_path):
    from flax import serialization

    from fal_net_tpu.train.checkpoint import load_params_any

    inner = {"backbone": {"conv0": {"kernel": np.zeros((3, 3, 3, 4))}}}
    cases = {
        "variables.msgpack": {"params": inner},
        "bare.msgpack": inner,
        "state.msgpack": {
            "step": np.int32(7),
            "params": {"params": inner},
            "opt_state": {"0": {"count": np.int32(7)}},
        },
    }
    for fname, tree in cases.items():
        p = tmp_path / fname
        p.write_bytes(serialization.msgpack_serialize(tree))
        variables, _, _ = load_params_any(str(p))
        assert "params" in variables and "backbone" in variables["params"], fname


# ---------------------------------------------------------------------------
# Warm-restart LR schedule (ADVICE medium #1)
# ---------------------------------------------------------------------------


def _first_update_norm(state, grads):
    new_state = state.apply_gradients(grads)
    delta = jax.tree.map(
        lambda a, b: np.abs(np.asarray(a) - np.asarray(b)),
        jax.device_get(new_state.params),
        jax.device_get(state.params),
    )
    return max(float(l.max()) for l in jax.tree.leaves(delta))


def test_warm_restart_fast_forwards_lr_schedule():
    """start_step past a milestone must train at the decayed LR — the
    reference fast-forwards MultiStepLR at Train_Stage1_K.py:183-184."""
    from fal_net_tpu.train.state import create_train_state

    model = create_model("tiny", 5)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 3)), 2.0, 30.0, ret_disp=True
    )
    grads = jax.tree.map(jnp.ones_like, variables)
    kw = dict(
        lr=1e-2, beta1=0.5, beta2=0.999, milestones=(1, 2), lr_gamma=0.5,
        steps_per_epoch=10,
    )
    cold = create_train_state(model, variables, **kw, start_step=0)
    warm = create_train_state(model, variables, **kw, start_step=25)  # past both
    # Adam's first update magnitude is ~lr * sign(grad); the warm restart
    # must apply gamma^2 = 0.25x the cold LR.
    ratio = _first_update_norm(warm, grads) / _first_update_norm(cold, grads)
    np.testing.assert_allclose(ratio, 0.25, rtol=1e-3)


# ---------------------------------------------------------------------------
# ms_post_process per-image percentile (ADVICE medium #2)
# ---------------------------------------------------------------------------


def test_ms_pp_batch_independence(rng):
    """An image's ms-pp output must not depend on its batchmates (the 95th
    percentile is per-image; the reference runs batch-1 so this preserves
    parity while fixing batched serving)."""
    from fal_net_tpu.eval.pipeline import DisparityPipeline

    model = create_model("tiny", 5)
    h, w = 48, 96
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), 2.0, 30.0, ret_disp=True
    )
    items = [
        (str(i), rng.random((h, w, 3)).astype(np.float32) - 0.4) for i in range(3)
    ]
    batched = dict(
        DisparityPipeline(
            model, variables, batch_size=2, max_disp=30.0, ms_post_process=True
        ).run(iter(items))
    )
    single = dict(
        DisparityPipeline(
            model, variables, batch_size=1, max_disp=30.0, ms_post_process=True
        ).run(iter(items))
    )
    for k in single:
        np.testing.assert_allclose(batched[k], single[k], rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# prefetch_to_device: early break must not leak the producer (ADVICE low)
# ---------------------------------------------------------------------------


def test_prefetch_early_break_stops_producer():
    from fal_net_tpu.data.loader import prefetch_to_device

    produced = []

    def source():
        for i in range(100):
            produced.append(i)
            yield {"x": np.full((2, 2), i, np.float32)}

    before = threading.active_count()
    it = prefetch_to_device(source(), size=2)
    for i, batch in enumerate(it):
        if i == 1:
            break
    it.close()  # what a `break` out of a for loop triggers on GC
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"
    assert len(produced) < 100, "producer ran the whole source after break"


# ---------------------------------------------------------------------------
# CLI --slow applies the Kslow batch-size default (ADVICE low)
# ---------------------------------------------------------------------------


def test_cli_slow_default_batch_size(monkeypatch, tmp_path):
    from fal_net_tpu.cli import train as cli_train

    captured = {}

    class FakeTrainer:
        def __init__(self, cfg, stage=None, mesh=None, val_dataset=None):
            captured["cfg"] = cfg
            captured["stage"] = stage

        def fit(self):
            return {"best_rmse": 0.0}

    monkeypatch.setattr(cli_train, "Trainer", FakeTrainer)
    cli_train.main(["--stage", "1", "--slow", "--data_root", str(tmp_path)])
    assert captured["stage"] == "stage1_slow"
    assert captured["cfg"].batch_size == 4  # Train_Stage1_Kslow.py:48 default

    cli_train.main([
        "--stage", "1", "--slow", "--data_root", str(tmp_path),
        "--batch_size", "6",
    ])
    assert captured["cfg"].batch_size == 6  # explicit override still wins


# ---------------------------------------------------------------------------
# s2d flags reachable from the public factory (VERDICT weak #10)
# ---------------------------------------------------------------------------


def test_create_model_exposes_s2d_flags():
    m = create_model("tiny", 5, s2d_stem=False, s2d_tail=False)
    assert m.s2d_stem is False
    x = jnp.zeros((1, 16, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, 2.0, 30.0, ret_disp=True)
    m2 = create_model("tiny", 5, s2d_stem=True, s2d_tail=True)
    v2 = m2.init(jax.random.PRNGKey(0), x, 2.0, 30.0, ret_disp=True)
    # parameter structure is identical across domains
    assert jax.tree.structure(v) == jax.tree.structure(v2)
    out = m2.apply(v2, x, 2.0, 30.0, ret_disp=True)
    assert np.isfinite(np.asarray(out.disp)).all()
