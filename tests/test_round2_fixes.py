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
            return {"best_metric": "train_loss", "best_value": 0.0}

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
# Per-sample disparity-range plumbing (VERDICT missing #2 / weak #3)
# ---------------------------------------------------------------------------


def test_med_negative_bounds_parity(rng):
    """fix_order=False swapped samples carry negative disparity bounds
    (x_pix = -max_pix with min scaled proportionally,
    listdataset_train.py:74-81 + Train_Stage1_K.py:237); parity vs the
    torch grid_sample transcription of FAL_netB.py:200-297."""
    pytest.importorskip("torch")
    from fal_net_tpu.ops.med import med_outputs
    from tests.test_med import torch_med_reference

    B, H, W, N, C = 1, 8, 96, 9, 3
    logits = rng.standard_normal((B, N, H, W)).astype(np.float32)
    image = rng.standard_normal((B, C, H, W)).astype(np.float32)
    mn, mx = -1.0, -30.0  # swapped order: both bounds negated
    want_disp, want_pan, want_ml, want_mr = torch_med_reference(
        logits, image, mn, mx
    )
    got = med_outputs(
        jnp.asarray(logits.transpose(0, 2, 3, 1)),
        jnp.asarray(image.transpose(0, 2, 3, 1)),
        mn, mx,
        ret_disp=True, ret_pan=True, ret_subocc=True,
    )
    to_nchw = lambda a: np.asarray(a).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(to_nchw(got.disp), want_disp, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(to_nchw(got.pan), want_pan, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(to_nchw(got.maskL), want_ml, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(to_nchw(got.maskR), want_mr, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_stage1_per_sample_bounds(rng):
    """stage1_loss with a per-sample max_disp batch entry equals the average
    of scalar-bounds per-sample losses (mixed +/- signs exercised)."""
    from fal_net_tpu.train.stages import stage1_loss

    model = create_model("tiny", 5)
    h, w = 16, 32
    left = rng.random((2, h, w, 3)).astype(np.float32) - 0.4
    right = rng.random((2, h, w, 3)).astype(np.float32) - 0.4
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), 2.0, 30.0, ret_disp=True
    )
    kw = dict(min_disp=2.0, max_disp=30.0, a_p=0.0, a_sm=0.2 * 2 / 512)
    mx = np.array([30.0, -30.0], np.float32)
    loss, _ = stage1_loss(
        variables,
        {"left": jnp.asarray(left), "right": jnp.asarray(right),
         "max_disp": jnp.asarray(mx)},
        model.apply,
        **kw,
    )
    per_sample = []
    for b in range(2):
        lb, _ = stage1_loss(
            variables,
            {"left": jnp.asarray(left[b : b + 1]),
             "right": jnp.asarray(right[b : b + 1]),
             "max_disp": jnp.asarray(mx[b : b + 1])},
            model.apply,
            **kw,
        )
        per_sample.append(float(lb))
    np.testing.assert_allclose(float(loss), np.mean(per_sample), rtol=1e-5)
    # and the swapped sample genuinely differs from the unswapped one
    assert abs(per_sample[0] - per_sample[1]) > 1e-6


def test_trainer_fix_order_false_smoke():
    """A fix_order=False training step consumes the batch's per-sample
    max_disp (mixed signs) without error."""
    from fal_net_tpu.parallel.mesh import make_mesh
    from fal_net_tpu.train import Stage1Config, Trainer
    from tests.test_train import SyntheticStereo, _tiny_cfg

    class SwappedStereo(SyntheticStereo):
        def get(self, index, rng):
            s = super().get(index, rng)
            if index % 2:
                s["left"], s["right"] = s["right"], s["left"]
                s["max_disp"] = np.float32(-30.0)
            return s

    cfg = Stage1Config(**_tiny_cfg(epochs=1, epoch_size=2, fix_order=False))
    tr = Trainer(cfg, stage="stage1", mesh=make_mesh(1),
                 train_dataset=SwappedStereo(n=8))
    res = tr.fit()
    assert np.isfinite(res["history"][-1]["loss"])


# ---------------------------------------------------------------------------
# FAL_netA maskR align_corners quirk (VERDICT missing #3): deliberate fix,
# quantified
# ---------------------------------------------------------------------------


def test_falneta_maskr_align_corners_quirk(rng):
    """The reference's variant-A maskR grid_sample omits align_corners
    (models/FAL_netA.py:264 -> False) on a grid built with
    align_corners=True; every other warp uses True.  We apply True
    uniformly (see models/falnet.py docstring).  This pins both facts:
    our maskR matches the align_corners=True transcription exactly, and
    the quirk's divergence is real but small."""
    torch_mod = pytest.importorskip("torch")
    import torch.nn.functional as F

    from fal_net_tpu.ops.med import med_outputs

    B, H, W, N = 1, 8, 96, 9
    mn, mx = 1.0, 30.0
    logits = rng.standard_normal((B, N, H, W)).astype(np.float32)
    image = rng.standard_normal((B, 3, H, W)).astype(np.float32)

    def torch_maskr(align_corners_for_maskr):
        dlog0 = torch_mod.from_numpy(logits)
        sm = torch_mod.softmax(dlog0, dim=1)
        theta = torch_mod.zeros(B, 2, 3)
        theta[:, 0, 0] = 1
        theta[:, 1, 1] = 1
        i_grid = F.affine_grid(theta, [B, 3, H, W], align_corners=True)
        maskR = 0
        for n in range(N):
            c = n / (N - 1)
            x_of = (2 * mx / W) * np.exp(np.log(mx / mn) * (c - 1))
            g = i_grid.clone()
            g[:, :, :, 0] = g[:, :, :, 0] + x_of
            maskR = maskR + F.grid_sample(
                sm[:, n].unsqueeze(1), g, align_corners=align_corners_for_maskr
            )
        return torch_mod.clamp(maskR, max=1).numpy()

    ours = np.asarray(
        med_outputs(
            jnp.asarray(logits.transpose(0, 2, 3, 1)),
            jnp.asarray(image.transpose(0, 2, 3, 1)),
            mn, mx, ret_disp=False, ret_pan=False, ret_subocc=True,
        ).maskR
    ).transpose(0, 3, 1, 2)

    # exact vs the uniform align_corners=True semantics we ship
    np.testing.assert_allclose(ours, torch_maskr(True), rtol=1e-4, atol=1e-4)
    # the reference quirk diverges substantially on white-noise volumes:
    # the ac=False reinterpretation mis-shifts every plane by a sub-pixel,
    # column-dependent amount (measured ~0.67 max on a [0,1] mask)
    quirk = torch_maskr(False)
    div = np.abs(ours - quirk).max()
    assert 0.1 < div < 1.0, f"quirk divergence {div}"

    # opt-in maskr_quirk=True reproduces the reference's ac=False resample
    # (VERDICT r2 item 5: bit-parity for published A checkpoints)
    ours_quirk = np.asarray(
        med_outputs(
            jnp.asarray(logits.transpose(0, 2, 3, 1)),
            jnp.asarray(image.transpose(0, 2, 3, 1)),
            mn, mx, ret_disp=False, ret_pan=False, ret_subocc=True,
            maskr_quirk=True,
        ).maskR
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours_quirk, quirk, rtol=1e-4, atol=1e-4)
    # ...and only maskR changes: pan/maskL/disp are quirk-independent
    a = med_outputs(
        jnp.asarray(logits.transpose(0, 2, 3, 1)),
        jnp.asarray(image.transpose(0, 2, 3, 1)),
        mn, mx, ret_disp=True, ret_pan=True, ret_subocc=True,
    )
    b = med_outputs(
        jnp.asarray(logits.transpose(0, 2, 3, 1)),
        jnp.asarray(image.transpose(0, 2, 3, 1)),
        mn, mx, ret_disp=True, ret_pan=True, ret_subocc=True,
        maskr_quirk=True,
    )
    np.testing.assert_array_equal(np.asarray(a.disp), np.asarray(b.disp))
    np.testing.assert_array_equal(np.asarray(a.pan), np.asarray(b.pan))
    np.testing.assert_array_equal(np.asarray(a.maskL), np.asarray(b.maskL))


def test_falneta_quirk_flag_through_model(rng):
    """create_model(a_maskr_quirk=True) plumbs through FalNet: forwards
    differ only in maskR and the flag disables the fused head."""
    model = create_model("tiny", 5)
    model_q = create_model("tiny", 5, a_maskr_quirk=True)
    x = jnp.asarray(rng.standard_normal((1, 16, 64, 3)).astype(np.float32) * 0.3)
    variables = model.init(jax.random.PRNGKey(0), x, 2.0, 30.0, ret_disp=True)
    out = model.apply(variables, x, 2.0, 30.0, ret_disp=True, ret_subocc=True)
    out_q = model_q.apply(variables, x, 2.0, 30.0, ret_disp=True, ret_subocc=True)
    np.testing.assert_array_equal(np.asarray(out.disp), np.asarray(out_q.disp))
    np.testing.assert_array_equal(np.asarray(out.maskL), np.asarray(out_q.maskL))
    assert np.abs(np.asarray(out.maskR) - np.asarray(out_q.maskR)).max() > 1e-4


# ---------------------------------------------------------------------------
# s2d flags reachable from the public factory (VERDICT weak #10)
# ---------------------------------------------------------------------------


def test_create_model_exposes_s2d_flags():
    m = create_model("tiny", 5, s2d_stem=False, s2d_tail=False)
    assert m.s2d_stem is False
    x = jnp.zeros((1, 16, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, 2.0, 30.0, ret_disp=True)
    # fuse_logits (default ON since round 5) composes into the plain-domain
    # iconv1 and is incompatible with the s2d tail — disable it here
    m2 = create_model("tiny", 5, s2d_stem=True, s2d_tail=True, fuse_logits=False)
    v2 = m2.init(jax.random.PRNGKey(0), x, 2.0, 30.0, ret_disp=True)
    # parameter structure is identical across domains
    assert jax.tree.structure(v) == jax.tree.structure(v2)
    out = m2.apply(v2, x, 2.0, 30.0, ret_disp=True)
    assert np.isfinite(np.asarray(out.disp)).all()


# ---------------------------------------------------------------------------
# bf16 backbone -> fp32 MED head boundary (VERDICT weak #4): the logits
# conv emits fp32 straight from the MXU accumulator so a bf16 model never
# materializes bf16 logits (a separate convert forces a tiling relayout —
# the entire measured bf16 inference slowdown, 63.8 -> 47 ms at b8).
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_bf16_logits_boundary_fp32_and_close():
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 16, 32, 3)), jnp.float32
    )
    m32 = create_model("tiny", 5, dtype=jnp.float32)
    v = m32.init(jax.random.PRNGKey(0), x, 2.0, 30.0, ret_disp=True)
    m16 = create_model("tiny", 5, dtype=jnp.bfloat16)
    out32 = m32.apply(v, x, 2.0, 30.0, ret_disp=True).disp
    out16 = m16.apply(v, x, 2.0, 30.0, ret_disp=True).disp
    assert out16.dtype == jnp.float32  # head is fp32 regardless of backbone
    # bf16 backbone compute, fp32 head: close to the fp32 model within
    # bf16 resolution through a 7-level net
    np.testing.assert_allclose(
        np.asarray(out16), np.asarray(out32), rtol=0.15, atol=0.6
    )


@pytest.mark.slow
def test_bf16_training_grads_flow():
    """The mixed-dtype logits conv (bf16 in, fp32 accum out) must be
    differentiable: JAX's builtin conv transpose rule rejects it, so
    ConvOp routes through a custom VJP.  Checks bf16 grads exist, are
    finite, and point the same way as fp32 grads."""
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 16, 32, 3)), jnp.float32
    )
    target = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 16, 32, 1)), jnp.float32
    )

    def loss(model, v):
        out = model.apply(v, x, 2.0, 30.0, ret_disp=True, ret_pan=True)
        return jnp.mean((out.disp - target) ** 2) + jnp.mean(jnp.abs(out.pan))

    m32 = create_model("tiny", 5, dtype=jnp.float32)
    v = m32.init(jax.random.PRNGKey(0), x, 2.0, 30.0, ret_disp=True)
    g32 = jax.grad(lambda p: loss(m32, p))(v)
    m16 = create_model("tiny", 5, dtype=jnp.bfloat16)
    g16 = jax.grad(lambda p: loss(m16, p))(v)

    flat32 = jax.tree_util.tree_leaves(g32)
    flat16 = jax.tree_util.tree_leaves(g16)
    for a, b in zip(flat32, flat16):
        assert b.dtype == a.dtype  # grads land in param dtype (fp32)
        assert np.isfinite(np.asarray(b)).all()
    # directionally consistent: cosine similarity of the full gradient
    va = np.concatenate([np.asarray(t).ravel() for t in flat32])
    vb = np.concatenate([np.asarray(t).ravel() for t in flat16])
    cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb) + 1e-12))
    assert cos > 0.98, cos
