"""AOT export/serving artifact tests (fal_net_tpu/serve.py).

Round-trips a tiny model through export -> serialize -> deserialize and
checks the artifact's outputs match the live model exactly (same lowering,
same constants).  CPU platform; the artifact also carries a tpu lowering
in production use.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fal_net_tpu.models import create_model
from fal_net_tpu.serve import export_forward, load_exported, save_exported


@pytest.fixture(scope="module")
def tiny():
    model = create_model("tiny", 5)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 16, 32, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, 2.0, 30.0, ret_disp=True)
    return model, variables, x


def test_export_roundtrip_disp(tmp_path, tiny):
    model, variables, x = tiny
    blob = export_forward(
        model, variables, batch=1, height=16, width=32,
        min_disp=2.0, max_disp=30.0, platforms=("cpu",),
    )
    path = str(tmp_path / "tiny.jaxexp")
    save_exported(path, blob)
    fwd = load_exported(path)
    assert fwd.meta["outputs"] == ["disp"]
    assert fwd.meta["height"] == 16 and fwd.meta["width"] == 32
    (disp,) = fwd(x)
    ref = model.apply(variables, x, 2.0, 30.0, ret_disp=True).disp
    # The exported blob and the direct apply compile separately; XLA:CPU is
    # free to vectorize/fuse them differently (observed: 1-ulp drift when
    # one side loads from the persistent cache), so don't demand exactness.
    np.testing.assert_allclose(
        np.asarray(disp), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_export_all_outputs(tmp_path, tiny):
    model, variables, x = tiny
    blob = export_forward(
        model, variables, batch=1, height=16, width=32,
        min_disp=2.0, max_disp=30.0, ret_pan=True, ret_subocc=True,
        platforms=("cpu",),
    )
    path = str(tmp_path / "tiny_all.jaxexp")
    save_exported(path, blob)
    fwd = load_exported(path)
    assert fwd.meta["outputs"] == ["disp", "pan", "maskL", "maskR"]
    disp, pan, maskL, maskR = fwd(x)
    ref = model.apply(
        variables, x, 2.0, 30.0, ret_disp=True, ret_pan=True, ret_subocc=True
    )
    np.testing.assert_allclose(np.asarray(pan), np.asarray(ref.pan), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(maskL), np.asarray(ref.maskL), rtol=1e-5, atol=1e-5)


def test_export_rejects_garbage(tmp_path):
    path = str(tmp_path / "junk.jaxexp")
    with open(path, "wb") as f:
        f.write(b"not an artifact")
    with pytest.raises(ValueError, match="not a falnet-tpu export"):
        load_exported(path)


def test_export_cli(tmp_path, tiny):
    from flax import serialization

    model, variables, x = tiny
    ckpt = tmp_path / "tiny.msgpack"
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(variables)))
    out = str(tmp_path / "tiny_cli.jaxexp")
    from fal_net_tpu.cli.export import main as export_main

    export_main([
        "--pretrained", str(ckpt), "--model", "tiny", "--no_levels", "5",
        "--batch", "1", "--height", "16", "--width", "32",
        "--max_disp", "30.0", "--platforms", "cpu", "--out", out,
    ])
    fwd = load_exported(out)
    (disp,) = fwd(x)
    assert np.isfinite(np.asarray(disp)).all()


def test_export_uint8_input(tmp_path, tiny):
    """uint8_input artifacts take raw RGB and bake the /255 − mean
    normalization in; outputs match the live model fed host-normalized
    floats (to 1 ulp of the float64 mean subtraction)."""
    model, variables, x = tiny
    blob = export_forward(
        model, variables, batch=1, height=16, width=32,
        min_disp=2.0, max_disp=30.0, platforms=("cpu",), uint8_input=True,
    )
    path = str(tmp_path / "tiny_u8.jaxexp")
    save_exported(path, blob)
    fwd = load_exported(path)
    assert fwd.meta["input"] == "uint8"

    from fal_net_tpu.data.transforms import RGB_MEAN

    raw = (np.random.default_rng(3).random((1, 16, 32, 3)) * 255).astype(np.uint8)
    (disp,) = fwd(jnp.asarray(raw))
    norm = jnp.asarray(
        (raw.astype(np.float32) / 255.0 - RGB_MEAN).astype(np.float32)
    )
    ref = model.apply(variables, norm, 2.0, 30.0, ret_disp=True).disp
    np.testing.assert_allclose(np.asarray(disp), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_export_bf16_artifact(tmp_path, tiny):
    """--dtype bfloat16 export (the measured best-throughput serving
    config): metadata records the dtype, disparity output stays fp32, and
    |disp_bf16 - disp_fp32| on a fixed input is bounded (VERDICT r2 item
    7).  The bound is loose vs fp32 rounding but tight vs the disparity
    range: the MED head always runs fp32, so only backbone activations
    round through bf16."""
    from flax import serialization

    model, variables, x = tiny
    ckpt = tmp_path / "tiny.msgpack"
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(variables)))
    from fal_net_tpu.cli.export import main as export_main

    art = str(tmp_path / "tiny_bf16.jaxexp")
    export_main([
        "--pretrained", str(ckpt), "--model", "tiny", "--no_levels", "5",
        "--batch", "1", "--height", "16", "--width", "32",
        "--max_disp", "30.0", "--platforms", "cpu",
        "--dtype", "bfloat16", "--out", art,
    ])
    fwd = load_exported(art)
    assert fwd.meta["dtype"] == "bfloat16"
    (disp,) = fwd(x)
    disp = np.asarray(disp)
    assert disp.dtype == np.float32  # output stays fp32
    ref = np.asarray(model.apply(variables, x, 2.0, 30.0, ret_disp=True).disp)
    # golden bound on a fixed input: 5% of max_disp max / 1% mean.  (A
    # random-init model is the worst case — near-uniform softmax over the
    # 2..30 px levels amplifies logit rounding; measured max here ~0.66 px.)
    assert np.abs(disp - ref).max() < 0.05 * 30.0, np.abs(disp - ref).max()
    assert np.abs(disp - ref).mean() < 0.01 * 30.0
    # fp32 artifacts record their dtype too
    blob = export_forward(
        model, variables, batch=1, height=16, width=32,
        min_disp=2.0, max_disp=30.0, platforms=("cpu",),
    )
    p32 = str(tmp_path / "tiny_f32.jaxexp")
    save_exported(p32, blob)
    assert load_exported(p32).meta["dtype"] == "float32"


def test_export_bundle_dispatch(tmp_path, tiny):
    """Multi-shape bundle: one file, per-shape dispatch by input shape,
    shape-mismatch error, outputs identical to the live model."""
    from fal_net_tpu.serve import export_bundle

    model, variables, x = tiny
    shapes = [(16, 32), (24, 48)]
    blob = export_bundle(
        model, variables, shapes, batch=1,
        min_disp=2.0, max_disp=30.0, platforms=("cpu",),
    )
    path = str(tmp_path / "tiny_bundle.jaxexp")
    save_exported(path, blob)
    fwd = load_exported(path)
    assert [tuple(s) for s in fwd.meta["shapes"]] == shapes

    rng = np.random.default_rng(5)
    for h, w in shapes:
        xi = jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)
        (disp,) = fwd(xi)
        ref = model.apply(variables, xi, 2.0, 30.0, ret_disp=True).disp
        np.testing.assert_allclose(np.asarray(disp), np.asarray(ref), rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError, match="not in bundle"):
        fwd(jnp.zeros((1, 20, 40, 3), jnp.float32))


def test_infer_cli_bundle(tmp_path, tiny):
    """cli.infer with a --sizes bundle routes each image to its nearest
    bucket (by log-scale distance) and writes full-size outputs."""
    import os

    from PIL import Image

    from flax import serialization
    from fal_net_tpu.cli.export import main as export_main
    from fal_net_tpu.cli.infer import main as infer_main

    model, variables, x = tiny
    ckpt = tmp_path / "tiny.msgpack"
    ckpt.write_bytes(serialization.to_bytes(jax.device_get(variables)))
    art = str(tmp_path / "bundle.jaxexp")
    export_main([
        "--pretrained", str(ckpt), "--model", "tiny", "--no_levels", "5",
        "--batch", "2", "--sizes", "16x32,32x64",
        "--max_disp", "30.0", "--platforms", "cpu", "--out", art,
    ])
    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(0)
    # near 16x32 and near 32x64 respectively
    for name, (h, w) in [("s", (15, 30)), ("l", (34, 70)), ("s2", (16, 32))]:
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{name}.png")
    out = str(tmp_path / "out_bundle")
    infer_main(["--images", str(d), "--out_dir", out, "--artifact", art])
    from fal_net_tpu.data.datasets import load_kitti_disp_png

    for name, (h, w) in [("s", (15, 30)), ("l", (34, 70)), ("s2", (16, 32))]:
        disp = load_kitti_disp_png(os.path.join(out, f"{name}_disp.png"))[..., 0]
        assert disp.shape == (h, w), name


def test_artifact_evaluation_matches_live(tmp_path):
    """Evaluator.from_artifact runs the full eval protocol (bucketed
    batches, ms-pp, metrics) against a deployed bundle and matches the
    live-model evaluator; ms-pp needs the 2/3-scale shapes in the bundle
    (--with_ms_pp semantics)."""
    from fal_net_tpu.eval.evaluate import EvalConfig, Evaluator
    from fal_net_tpu.models import create_model
    from fal_net_tpu.serve import export_bundle

    h, w = 64, 1242
    model = create_model("tiny", 5)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), 2.0, 30.0, ret_disp=True
    )

    class DS:
        def __len__(self):
            return 3

        def get(self, i, rng=None):
            r = np.random.default_rng(i)
            disp = (r.random((h, w, 1)) * 25).astype(np.float32)
            disp[disp < 8] = 0
            return {
                "left": r.random((h, w, 3)).astype(np.float32) - 0.5,
                "targets": [disp],
                "name": f"a{i}",
            }

    up = 2.0 / 3.0
    blob = export_bundle(
        model, variables, [(h, w), (int(h * up), int(w * up))], batch=2,
        min_disp=2.0, max_disp=30.0, platforms=("cpu",),
    )
    path = str(tmp_path / "eval_bundle.jaxexp")
    save_exported(path, blob)
    fwd = load_exported(path)
    assert fwd.meta["n_params"] > 0

    def cfg(p):
        return EvalConfig(
            dataset="Kitti2015", ms_post_process=True, batch_size=2,
            max_disp=30.0, min_disp=2.0, save_path=str(tmp_path / p),
            print_freq=10,
        )

    live = Evaluator(model, variables, cfg("live")).run(DS())
    art = Evaluator.from_artifact(fwd, cfg("art")).run(DS())
    for k in ("abs_rel", "sq_rel", "rms", "a1", "epe"):
        np.testing.assert_allclose(art[k], live[k], rtol=1e-5, atol=1e-6, err_msg=k)
    # errors.txt carries the baked param count
    txt = open(tmp_path / "art" / "errors.txt").read()
    assert f"Number of parameters {fwd.meta['n_params']}" in txt

    # a shape missing from the bundle fails with the buckets listed
    import pytest as _pytest

    bad = export_bundle(
        model, variables, [(h, w)], batch=2,
        min_disp=2.0, max_disp=30.0, platforms=("cpu",),
    )
    save_exported(str(tmp_path / "noms.jaxexp"), bad)
    ev = Evaluator.from_artifact(load_exported(str(tmp_path / "noms.jaxexp")), cfg("bad"))
    with _pytest.raises(ValueError, match="not in bundle"):
        ev.run(DS())


def test_infer_cli_uint8_artifact(tmp_path, tiny):
    """cli.infer auto-detects a uint8-input artifact from its metadata."""
    from flax import serialization

    model, variables, x = tiny
    ckpt = tmp_path / "tiny.msgpack"
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(variables)))
    from fal_net_tpu.cli.export import main as export_main
    from fal_net_tpu.cli.infer import main as infer_main
    from PIL import Image

    art = str(tmp_path / "tiny_u8.jaxexp")
    export_main([
        "--pretrained", str(ckpt), "--model", "tiny", "--no_levels", "5",
        "--batch", "2", "--height", "16", "--width", "32",
        "--max_disp", "30.0", "--platforms", "cpu", "--uint8_input",
        "--out", art,
    ])
    d = tmp_path / "frames"
    d.mkdir()
    arr = (np.random.default_rng(0).random((16, 32, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(d / "a.png")
    out = str(tmp_path / "out_u8")
    infer_main(["--images", str(d), "--out_dir", out, "--artifact", art])
    import os

    assert os.path.isfile(os.path.join(out, "a_disp.png"))


def test_export_preserves_maskr_quirk(tmp_path):
    """export_forward's portable clone must carry a_maskr_quirk: a
    quirk-enabled model's artifact maskR matches the live quirk model (and
    differs from the non-quirk model) — models/falnet.py:70."""
    model_q = create_model("tiny", 5, a_maskr_quirk=True)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 16, 32, 3)), jnp.float32
    )
    variables = model_q.init(jax.random.PRNGKey(0), x, 2.0, 30.0, ret_disp=True)
    blob = export_forward(
        model_q, variables, batch=1, height=16, width=32,
        min_disp=2.0, max_disp=30.0, ret_pan=True, ret_subocc=True,
        platforms=("cpu",),
    )
    path = str(tmp_path / "tiny_quirk.jaxexp")
    save_exported(path, blob)
    fwd = load_exported(path)
    _, _, _, maskR = fwd(x)
    ref_q = model_q.apply(
        variables, x, 2.0, 30.0, ret_disp=True, ret_pan=True, ret_subocc=True
    ).maskR
    np.testing.assert_allclose(
        np.asarray(maskR), np.asarray(ref_q), rtol=1e-5, atol=1e-5
    )
    model_plain = create_model("tiny", 5)
    ref_plain = model_plain.apply(
        variables, x, 2.0, 30.0, ret_disp=True, ret_pan=True, ret_subocc=True
    ).maskR
    assert np.abs(np.asarray(ref_q) - np.asarray(ref_plain)).max() > 1e-4


def test_from_artifact_save_pan_needs_masks(tmp_path, tiny):
    """A pan-without-subocc artifact must be rejected up front for
    --save_pan (the per-image exporter writes maskL/maskR too)."""
    from fal_net_tpu.eval.evaluate import EvalConfig, Evaluator

    model, variables, x = tiny
    blob = export_forward(
        model, variables, batch=1, height=16, width=32,
        min_disp=2.0, max_disp=30.0, ret_pan=True, ret_subocc=False,
        platforms=("cpu",),
    )
    path = str(tmp_path / "tiny_panonly.jaxexp")
    save_exported(path, blob)
    cfg = EvalConfig(
        dataset="Kitti2015", save=True, save_pan=True,
        ms_post_process=False, save_path=str(tmp_path / "out"),
    )
    with pytest.raises(ValueError, match="pan --subocc"):
        Evaluator.from_artifact(load_exported(path), cfg)


def test_export_cli_rejects_uint8_with_ms_pp(tmp_path):
    """--uint8_input + --with_ms_pp can never be evaluated (from_artifact
    rejects post-processing on uint8 artifacts) — fail at export time."""
    from fal_net_tpu.cli.export import main as export_main

    with pytest.raises(SystemExit, match="float32-input"):
        export_main([
            "--pretrained", "nope.msgpack", "--model", "tiny",
            "--uint8_input", "--with_ms_pp",
            "--out", str(tmp_path / "x.jaxexp"),
        ])


def test_eval_cli_artifact_rejects_checkpoint_flags(tmp_path):
    """cli.test --artifact + a baked-in checkpoint-mode flag is a silent
    misconfiguration — must exit with the flag named (same contract as
    cli.infer)."""
    from fal_net_tpu.cli.test import main as test_main

    with pytest.raises(SystemExit, match="batch_size"):
        test_main([
            "--artifact", str(tmp_path / "missing.jaxexp"),
            "--data_root", str(tmp_path),
            "--batch_size", "4",
        ])
