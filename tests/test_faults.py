"""Transient-dispatch fault tolerance (fal_net_tpu/utils/faults.py).

The reference has no failure handling (SURVEY §5: manual
--pretrained/--start_epoch relaunch).  This framework retries retryable
runtime errors: plain retry for non-donating dispatches (evaluation,
metric fetches), snapshot rollback for the donating train step.  These
tests inject failures at the dispatch seams and assert training /
evaluation complete with correct results.
"""

import numpy as np
import pytest
import jax

from fal_net_tpu.utils.faults import is_transient, retry_transient, tree_alive


class _Transient(RuntimeError):
    pass


def _t(msg="FAILED_PRECONDITION: relay dropped the call"):
    return _Transient(msg)


# ---------------------------------------------------------------------------
# Classification + retry primitive
# ---------------------------------------------------------------------------

def test_is_transient_classification():
    assert is_transient(_t())
    assert is_transient(RuntimeError("UNAVAILABLE: Socket closed"))
    assert is_transient(RuntimeError("DEADLINE_EXCEEDED while awaiting reply"))
    assert not is_transient(ValueError("shape mismatch (8, 64) vs (8, 65)"))
    assert not is_transient(KeyboardInterrupt())


def test_retry_transient_recovers_and_bounds():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise _t()
        return "ok"

    assert retry_transient(flaky, retries=2, backoff_s=0.0) == "ok"
    assert calls["n"] == 3

    def always():
        raise _t()

    with pytest.raises(_Transient):
        retry_transient(always, retries=1, backoff_s=0.0)

    def hard():
        raise ValueError("not retryable")

    calls["n"] = 0

    def counting_hard():
        calls["n"] += 1
        raise ValueError("not retryable")

    with pytest.raises(ValueError):
        retry_transient(counting_hard, retries=5, backoff_s=0.0)
    assert calls["n"] == 1  # non-transient: no retry


def test_tree_alive_detects_deleted_buffers():
    tree = {"a": jax.numpy.ones((4,)), "b": [jax.numpy.zeros((2, 2))]}
    assert tree_alive(tree)
    tree["b"][0].delete()
    assert not tree_alive(tree)


# ---------------------------------------------------------------------------
# Trainer: retry-in-place and snapshot rollback
# ---------------------------------------------------------------------------

def _tiny_trainer(tmp_path, **cfg_kw):
    from fal_net_tpu.parallel.mesh import make_mesh
    from fal_net_tpu.train import Stage1Config, Trainer
    from tests.test_train import SyntheticStereo, _tiny_cfg

    cfg = Stage1Config(**_tiny_cfg(epochs=1, epoch_size=3, **cfg_kw))
    tr = Trainer(cfg, stage="stage1", mesh=make_mesh(1),
                 train_dataset=SyntheticStereo(n=24))
    tr.setup()
    return tr


def test_train_step_retry_in_place(tmp_path):
    """A transient failure that leaves the donated state intact is retried
    with the same batch; training completes."""
    tr = _tiny_trainer(tmp_path)
    real_step = tr.train_step
    calls = {"n": 0, "failed": 0}

    def flaky_step(state, batch, vgg, teacher):
        calls["n"] += 1
        if calls["n"] == 2:
            calls["failed"] += 1
            raise _t()  # state untouched -> retry-in-place path
        return real_step(state, batch, vgg, teacher)

    tr.train_step = flaky_step
    res = tr.fit(save_path=str(tmp_path / "run"))
    assert calls["failed"] == 1
    assert np.isfinite(res["history"][-1]["loss"])
    # all 3 steps applied exactly once despite the retry
    assert int(tr.state.step) == 3


def test_train_step_rollback_after_donation_loss(tmp_path):
    """A transient failure that consumed the donated state triggers a
    rollback to the host snapshot, then training continues."""
    tr = _tiny_trainer(tmp_path)
    real_step = tr.train_step
    calls = {"n": 0}

    def flaky_step(state, batch, vgg, teacher):
        calls["n"] += 1
        if calls["n"] == 2:
            for leaf in jax.tree.leaves(state):
                if isinstance(leaf, jax.Array):
                    leaf.delete()  # simulate a dispatch that ate its donation
            raise _t()
        return real_step(state, batch, vgg, teacher)

    tr.train_step = flaky_step
    res = tr.fit(save_path=str(tmp_path / "run"))
    assert np.isfinite(res["history"][-1]["loss"])
    # batch 0 applied (step 1), batch 1's failure consumed the state and
    # rolled back to the epoch-start snapshot (step 0) — losing step 1 —
    # then batch 1's retry and batch 2 applied: final counter = 2.
    assert calls["n"] == 4  # 3 batches + 1 retry
    assert int(tr.state.step) == 2


@pytest.mark.parametrize("mesh_kind", ["data8", "data2_spatial4"])
@pytest.mark.slow
def test_rollback_bitexact_vs_uninterrupted_on_mesh(tmp_path, mesh_kind):
    """VERDICT r3 #3: snapshot rollback must work — and reproduce the
    uninterrupted run bit-for-bit — when the donated train state lives
    sharded over the 8-device CPU mesh (restore path:
    trainer.py::_step_with_recovery -> device_put(replicate_sharding)).

    With snapshot_every_steps=1 no applied step is ever lost, so the
    interrupted run must apply the exact same update sequence: final
    params, step counter and loss history are compared bit-exactly."""
    from fal_net_tpu.parallel.mesh import make_mesh, replicate_sharding
    from fal_net_tpu.parallel.spatial import make_2d_mesh
    from fal_net_tpu.train import Stage1Config, Trainer
    from tests.test_train import SyntheticStereo, _tiny_cfg

    def make_tr():
        mesh = (
            make_mesh(8) if mesh_kind == "data8" else make_2d_mesh(2, 4)
        )
        cfg = Stage1Config(
            **_tiny_cfg(epochs=1, epoch_size=3, snapshot_every_steps=1)
        )
        tr = Trainer(cfg, stage="stage1", mesh=mesh,
                     train_dataset=SyntheticStereo(n=24))
        tr.setup()
        return tr

    tr_a = make_tr()
    res_a = tr_a.fit(save_path=str(tmp_path / "a"))
    params_a = jax.device_get(tr_a.state.params)

    tr_b = make_tr()
    real_step = tr_b.train_step
    calls = {"n": 0}

    def flaky_step(state, batch, vgg, teacher):
        calls["n"] += 1
        if calls["n"] == 2:
            for leaf in jax.tree.leaves(state):
                if isinstance(leaf, jax.Array):
                    leaf.delete()  # dispatch consumed its donated buffers
            raise _t()
        return real_step(state, batch, vgg, teacher)

    tr_b.train_step = flaky_step
    res_b = tr_b.fit(save_path=str(tmp_path / "b"))
    assert calls["n"] == 4  # 3 batches + 1 retry after the rollback
    assert int(tr_b.state.step) == int(tr_a.state.step) == 3
    # the restored state is re-replicated over the mesh
    rep = replicate_sharding(tr_b.mesh)
    for leaf in jax.tree.leaves(tr_b.state.params):
        assert leaf.sharding.is_equivalent_to(rep, ndim=leaf.ndim)
    params_b = jax.device_get(tr_b.state.params)
    for a, b in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert [h["loss"] for h in res_a["history"]] == [
        h["loss"] for h in res_b["history"]
    ]


def test_relay_retries_zero_fails_fast(tmp_path):
    tr = _tiny_trainer(tmp_path, relay_retries=0)

    def dead_step(state, batch, vgg, teacher):
        raise _t()

    tr.train_step = dead_step
    with pytest.raises(_Transient):
        tr.fit(save_path=str(tmp_path / "run"))


# ---------------------------------------------------------------------------
# Evaluator: re-dispatch from the resident device input
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_evaluator_redispatch_on_transient_fetch(tmp_path):
    from fal_net_tpu.eval.evaluate import EvalConfig, Evaluator
    from tests.test_evaluate import SyntheticEval, _make_model

    model, variables = _make_model()

    def run(inject: bool):
        cfg = EvalConfig(
            dataset="Kitti2015",
            ms_post_process=True,
            save_path=str(tmp_path / ("flaky" if inject else "clean")),
            print_freq=1,
            batch_size=2,
        )
        ev = Evaluator(model, variables, cfg)
        if inject:
            real_step = ev._jit_eval_step
            state = {"n": 0}

            class FlakyFetch:
                def __init__(self, arr):
                    self._arr = arr

                def __array__(self, dtype=None, copy=None):
                    raise _t("UNAVAILABLE: Socket closed mid-transfer")

            def flaky(variables, left, pan=False, subocc=False):
                out, disp = real_step(variables, left, pan=pan, subocc=subocc)
                state["n"] += 1
                if state["n"] == 1:
                    return out, FlakyFetch(disp)
                return out, disp

            ev.__dict__["_jit_eval_step"] = flaky
        return ev.run(SyntheticEval(n=3))

    clean = run(False)
    flaky = run(True)
    for k in ("abs_rel", "rms", "a1"):
        np.testing.assert_allclose(flaky[k], clean[k], rtol=1e-6)


def test_validate_retry_on_transient_forward(tmp_path):
    """Trainer.validate retries a transient forward failure (nothing is
    donated there); metrics equal the clean run."""
    tr = _tiny_trainer(tmp_path)

    class ValDS:
        def __len__(self):
            return 3

        def get(self, i, rng_=None):
            r = np.random.default_rng(100 + i)
            disp = (r.random((32, 1242, 1)) * 20).astype(np.float32)
            disp[disp < 5] = 0
            return {
                "left": r.random((32, 1242, 3)).astype(np.float32) - 0.4,
                "right": r.random((32, 1242, 3)).astype(np.float32) - 0.4,
                "targets": [disp],
            }

    clean = tr.validate(ValDS())

    real_fwd = tr._val_forward
    state = {"n": 0}

    def flaky_fwd(params, left):
        state["n"] += 1
        if state["n"] == 1:
            raise _t()
        return real_fwd(params, left)

    tr.__dict__["_val_forward"] = flaky_fwd
    flaky = tr.validate(ValDS())
    assert state["n"] >= 2  # failed once, retried
    for k in clean:
        np.testing.assert_allclose(flaky[k], clean[k], rtol=1e-6, err_msg=k)


def test_train_step_failure_surfacing_at_metric_fetch(tmp_path):
    """Dispatch is async on remote backends: an execution failure often
    surfaces at the metric fetch, AFTER the old state was donated.  The
    step + fetch form one recovery unit, so this must roll back and
    retry, not crash."""
    tr = _tiny_trainer(tmp_path)
    real_step = tr.train_step
    calls = {"n": 0}

    class FlakyScalar:
        def __float__(self):
            raise _t("UNAVAILABLE: Socket closed mid-fetch")

    def flaky_step(state, batch, vgg, teacher):
        calls["n"] += 1
        new_state, aux = real_step(state, batch, vgg, teacher)
        if calls["n"] == 2:
            # emulate the async case: dispatch "succeeded", the old state
            # is already gone, and the error surfaces only at fetch time
            for leaf in jax.tree.leaves(state):
                if isinstance(leaf, jax.Array):
                    leaf.delete()
            aux = dict(aux)
            aux["loss"] = FlakyScalar()
        return new_state, aux

    tr.train_step = flaky_step
    res = tr.fit(save_path=str(tmp_path / "run"))
    assert np.isfinite(res["history"][-1]["loss"])
    assert calls["n"] == 4  # 3 batches + 1 retry after the rollback
    assert int(tr.state.step) == 2  # step 1 lost to the rollback


def test_pipeline_retry_on_transient_fetch(rng):
    """DisparityPipeline re-runs a batch whose async forward failed at
    fetch time; outputs equal the clean run."""
    from fal_net_tpu.eval.pipeline import DisparityPipeline
    from fal_net_tpu.models import create_model
    import jax.numpy as jnp

    model = create_model("tiny", 5)
    h, w = 32, 64
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), 2.0, 30.0, ret_disp=True
    )
    items = [(f"i{i}", rng.random((h, w, 3)).astype(np.float32) - 0.4)
             for i in range(6)]

    clean = dict(DisparityPipeline(
        model, variables, batch_size=4, max_disp=30.0).run(iter(items)))

    pipe = DisparityPipeline(model, variables, batch_size=4, max_disp=30.0)
    real_fwd = pipe._forward
    state = {"n": 0}

    class FlakyFetch:
        def __init__(self, arr):
            self._arr = arr

        def __array__(self, dtype=None, copy=None):
            raise _t("UNAVAILABLE: Socket closed mid-transfer")

    def flaky(variables, images):
        out = real_fwd(variables, images)
        state["n"] += 1
        if state["n"] == 1:
            return FlakyFetch(out)
        return out

    pipe.__dict__["_forward"] = flaky
    flaky_out = dict(pipe.run(iter(items)))
    assert state["n"] >= 3  # 2 batches + 1 re-dispatch
    assert clean.keys() == flaky_out.keys()
    for k in clean:
        np.testing.assert_allclose(flaky_out[k], clean[k], rtol=1e-6)


def test_snapshot_every_steps_bounds_rollback(tmp_path):
    """With snapshot_every_steps=1 the recovery point advances each step,
    so a donation-consuming failure at batch 3 rolls back only one step
    (vs the epoch-start rollback in the test above)."""
    tr = _tiny_trainer(tmp_path, snapshot_every_steps=1)
    real_step = tr.train_step
    calls = {"n": 0}

    def flaky_step(state, batch, vgg, teacher):
        calls["n"] += 1
        if calls["n"] == 3:
            for leaf in jax.tree.leaves(state):
                if isinstance(leaf, jax.Array):
                    leaf.delete()
            raise _t()
        return real_step(state, batch, vgg, teacher)

    tr.train_step = flaky_step
    res = tr.fit(save_path=str(tmp_path / "run"))
    assert np.isfinite(res["history"][-1]["loss"])
    # steps 1, 2 applied and snapshotted; batch 3's failure rolls back to
    # the step-2 snapshot and the retry applies it: nothing is lost.
    assert calls["n"] == 4
    assert int(tr.state.step) == 3
