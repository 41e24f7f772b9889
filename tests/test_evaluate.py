"""End-to-end Evaluator test: tiny model, synthetic KITTI2015-style data."""

import os

import numpy as np
import pytest
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


class MixedShapeEval:
    """5 samples across 2 KITTI widths (both in the intrinsics table) in
    interleaved order — exercises the per-shape bucket batching."""

    SHAPES = [(64, 1242), (64, 1226), (64, 1242), (64, 1226), (64, 1242)]

    def __len__(self):
        return len(self.SHAPES)

    def get(self, index, rng=None):
        h, w = self.SHAPES[index]
        r = np.random.default_rng(index)
        left = r.random((h, w, 3)).astype(np.float32) - 0.5
        disp = (r.random((h, w, 1)) * 80).astype(np.float32)
        disp[disp < 20] = 0  # sparse
        return {"left": left, "targets": [disp], "name": f"mix{index}"}


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
    # reference writes the param count into errors.txt (Test_KITTI.py:277)
    from fal_net_tpu.utils.meters import count_params

    txt = open(tmp_path / "errors.txt").read()
    assert f"Number of parameters {count_params(variables)}" in txt
    # machine-readable sibling
    import json

    mj = json.load(open(tmp_path / "metrics.json"))
    assert mj["n_images"] == 2 and np.isclose(mj["abs_rel"], metrics["abs_rel"])


def test_evaluator_median_scale_surfaced(tmp_path):
    """--median: the mean per-image scale factor lands in metrics.json and
    errors.txt (the reference tracks/prints it via module globals,
    myUtils.py:193-207)."""
    model, variables = _make_model()
    cfg = EvalConfig(
        dataset="Kitti2015",
        use_median=True,
        save_path=str(tmp_path),
        print_freq=1,
    )
    metrics = Evaluator(model, variables, cfg).run(SyntheticEval())
    assert np.isfinite(metrics["median_scale_mean"])
    assert metrics["median_scale_mean"] > 0
    import json

    mj = json.load(open(tmp_path / "metrics.json"))
    assert np.isclose(mj["median_scale_mean"], metrics["median_scale_mean"])
    txt = open(tmp_path / "errors.txt").read()
    assert "Median scaling mean factor" in txt
    # without --median the key is absent
    cfg2 = EvalConfig(
        dataset="Kitti2015", save_path=str(tmp_path / "nomed"), print_freq=1
    )
    m2 = Evaluator(model, variables, cfg2).run(SyntheticEval())
    assert "median_scale_mean" not in m2


@pytest.mark.slow
def test_batched_eval_metric_identity(tmp_path):
    """Bucketed batch-N evaluation produces the same metrics as the
    reference-shaped batch-1 loop (VERDICT round-2 item 1 done-criterion):
    5 images over 2 interleaved KITTI shapes, ms-pp on (its percentile
    blend is per-image), batch 2 => one full batch + ragged tail per shape."""
    model, variables = _make_model()

    def run(batch_size):
        cfg = EvalConfig(
            dataset="Kitti2015",
            ms_post_process=True,
            batch_size=batch_size,
            save_path=str(tmp_path / f"b{batch_size}"),
            print_freq=2,
        )
        return Evaluator(model, variables, cfg).run(MixedShapeEval())

    m1, m2 = run(1), run(2)
    for k in ("abs_rel", "sq_rel", "rms", "log_rms", "a1", "a2", "a3", "epe"):
        np.testing.assert_allclose(m2[k], m1[k], rtol=1e-5, atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_decode_prefetch_metric_identity(tmp_path):
    """Background prefetch-decode (decode_workers>0) consumes samples
    strictly in dataset order, so metrics are IDENTICAL (==, not allclose)
    to the inline-decode loop — same bucket fill order, same batch
    composition, same accumulation order."""
    model, variables = _make_model()

    def run(workers):
        cfg = EvalConfig(
            dataset="Kitti2015",
            ms_post_process=True,
            batch_size=2,
            decode_workers=workers,
            save_path=str(tmp_path / f"w{workers}"),
            print_freq=100,
        )
        return Evaluator(model, variables, cfg).run(MixedShapeEval())

    m0, m4 = run(0), run(4)
    for k in ("abs_rel", "sq_rel", "rms", "log_rms", "a1", "a2", "a3", "epe"):
        assert m4[k] == m0[k], k


def test_raw_uint8_upload_metric_identity(tmp_path):
    """Raw-uint8 upload + on-device normalization (the default cli.test
    path — 4x fewer host->device bytes) produces the same metrics as
    host-normalized fp32 upload to fp32 tolerance (the two normalizations
    agree to 1 ulp)."""
    from fal_net_tpu.data.transforms import normalize

    class U8Eval:
        def __init__(self, raw):
            self.raw = raw

        def __len__(self):
            return 3

        def get(self, index, rng=None):
            r = np.random.default_rng(index)
            img = r.integers(0, 256, (64, 1242, 3), dtype=np.uint8)
            disp = (r.random((64, 1242, 1)) * 80).astype(np.float32)
            disp[disp < 20] = 0
            return {
                "left": img if self.raw else normalize(img),
                "targets": [disp],
                "name": f"u{index}",
            }

    model, variables = _make_model()

    def run(raw):
        cfg = EvalConfig(
            dataset="Kitti2015",
            ms_post_process=True,
            batch_size=2,
            save_path=str(tmp_path / f"raw{raw}"),
            print_freq=10,
        )
        return Evaluator(model, variables, cfg).run(U8Eval(raw))

    m_f32, m_u8 = run(False), run(True)
    for k in ("abs_rel", "sq_rel", "rms", "log_rms", "a1", "a2", "a3", "epe"):
        np.testing.assert_allclose(m_u8[k], m_f32[k], rtol=1e-4, atol=1e-5, err_msg=k)


def test_eval_dataset_raw_uint8_flag(tmp_path):
    """StereoEvalDataset.raw_uint8 yields the source uint8 for 'left' and
    normalize(raw) equals the default float path exactly."""
    from PIL import Image

    from fal_net_tpu.data.datasets import StereoEvalDataset
    from fal_net_tpu.data.transforms import normalize

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (16, 32, 3), dtype=np.uint8)
    Image.fromarray(img).save(tmp_path / "l.png")
    Image.fromarray(img[:, ::-1]).save(tmp_path / "r.png")
    items = [(("l.png", "r.png"), None)]
    ds = StereoEvalDataset(str(tmp_path), items)
    ds_raw = StereoEvalDataset(str(tmp_path), items, raw_uint8=True)
    s, s_raw = ds.get(0), ds_raw.get(0)
    assert s_raw["left"].dtype == np.uint8
    np.testing.assert_array_equal(s_raw["left"], img)
    np.testing.assert_array_equal(normalize(s_raw["left"]), s["left"])
    # 'right' stays normalized either way (only consumed host-side)
    assert s_raw["right"].dtype == np.float32


def test_quantize_transfer_metrics_and_warning(tmp_path):
    """quantize_transfer fetches uint16 fixed-point disparities (1/256 px
    — KITTI's own GT PNG precision): metrics agree with the fp32 fetch to
    the quantization level, and combining it with max_disp > 255.996 warns."""
    import pytest

    model, variables = _make_model()

    def run(q):
        cfg = EvalConfig(
            dataset="Kitti2015",
            ms_post_process=True,
            batch_size=2,
            quantize_transfer=q,
            max_disp=30.0,
            save_path=str(tmp_path / f"q{q}"),
            print_freq=10,
        )
        return Evaluator(model, variables, cfg).run(SyntheticEval(n=3))

    m_f32, m_q = run(False), run(True)
    for k in ("abs_rel", "rms", "a1"):
        np.testing.assert_allclose(m_q[k], m_f32[k], rtol=1e-3, atol=1e-3, err_msg=k)

    with pytest.warns(UserWarning, match="255.996"):
        Evaluator(
            model, variables,
            EvalConfig(dataset="Kitti2015", quantize_transfer=True, max_disp=300.0),
        )


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
    # feats = [local_normalization(input), maskL, maskR] (Test_KITTI.py:193-194)
    from fal_net_tpu.utils.viz import local_normalization

    assert os.path.isfile(tmp_path / "feats" / "0000000000_maskL_c0.png")
    assert os.path.isfile(tmp_path / "feats" / "0000000000_maskR_c0.png")
    for c in range(3):
        assert os.path.isfile(tmp_path / "feats" / f"0000000000_norm_input_c{c}.png")
    # the exported normalized-input channels match utils.viz.local_normalization
    from PIL import Image

    sample = SyntheticEval(n=1).get(0)
    want = np.clip(np.abs(local_normalization(sample["left"])) * 255, 0, 255)
    got = np.asarray(
        Image.open(tmp_path / "feats" / "0000000000_norm_input_c0.png")
    )
    np.testing.assert_allclose(got, np.rint(want[..., 0]), atol=1)


def test_sharded_eval_matches_single_device(tmp_path):
    """mesh= shards each evaluation batch over the 'data' axis (params
    replicated); metrics must match the unsharded evaluator."""
    from fal_net_tpu.parallel.mesh import make_mesh

    model, variables = _make_model()

    def run(mesh):
        cfg = EvalConfig(
            dataset="Kitti2015",
            ms_post_process=True,
            batch_size=2,
            save_path=str(tmp_path / f"m{mesh is not None}"),
            print_freq=10,
        )
        return Evaluator(model, variables, cfg, mesh=mesh).run(SyntheticEval(n=3))

    plain, sharded = run(None), run(make_mesh(2))
    for k in ("abs_rel", "sq_rel", "rms", "a1", "epe"):
        np.testing.assert_allclose(sharded[k], plain[k], rtol=1e-5, atol=1e-6, err_msg=k)

    import pytest

    with pytest.raises(ValueError, match="divisible"):
        Evaluator(
            model, variables,
            EvalConfig(dataset="Kitti2015", batch_size=3),
            mesh=make_mesh(2),
        )


def test_crop_top_95_batched(tmp_path):
    """'Owndata' crop_top_95 composes with bucket batching: buckets key on
    the CROPPED shape and metrics match the batch-1 run."""
    model = create_model("tiny", 5)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 1242, 3)), 2.0, 300.0, ret_disp=True
    )

    class NoGT:
        def __len__(self):
            return 3

        def get(self, i, rng=None):
            r = np.random.default_rng(i)
            # 68 rows -> int(0.95*68) = 64 rows after the crop
            return {"left": r.random((68, 1242, 3)).astype(np.float32) - 0.5,
                    "name": f"c{i}"}

    outs = {}
    for bs in (1, 2):
        cfg = EvalConfig(
            dataset="Kitti2015", ms_post_process=False, crop_top_95=True,
            batch_size=bs, save=True, save_path=str(tmp_path / f"b{bs}"),
            print_freq=10,
        )
        Evaluator(model, variables, cfg).run(NoGT(), evaluate=False)
        from PIL import Image

        outs[bs] = np.stack([
            np.asarray(Image.open(tmp_path / f"b{bs}" / "disp" / f"{i:010d}.png"))
            for i in range(3)
        ])
    assert outs[1].shape[1] == 64  # crop applied
    np.testing.assert_array_equal(outs[2], outs[1])


def test_artifact_export_raw_uint8(tmp_path):
    """save/save_pan artifact export composes with raw-uint8 upload: the
    feature/input/pc exporters normalize the uint8 on host and outputs
    match the float-upload run byte-for-byte (PNG pixel equality)."""
    from PIL import Image

    from fal_net_tpu.data.transforms import normalize

    model, variables = _make_model()

    class OneImg:
        def __init__(self, raw):
            self.raw = raw

        def __len__(self):
            return 1

        def get(self, i, rng=None):
            r = np.random.default_rng(0)
            img = r.integers(0, 256, (64, 1242, 3), dtype=np.uint8)
            return {"left": img if self.raw else normalize(img), "name": "x"}

    outs = {}
    for raw in (False, True):
        cfg = EvalConfig(
            dataset="Kitti2015", ms_post_process=False, save=True,
            save_pan=True, save_input=True, save_point_cloud=True,
            batch_size=2, save_path=str(tmp_path / f"r{raw}"), print_freq=10,
        )
        Evaluator(model, variables, cfg).run(OneImg(raw), evaluate=False)
        d = tmp_path / f"r{raw}"
        outs[raw] = {
            p.relative_to(d): np.asarray(Image.open(p))
            for p in sorted(d.rglob("*.png"))
        }
    assert outs[False].keys() == outs[True].keys() and len(outs[True]) >= 5
    for k in outs[False]:
        # device vs host normalization differ by 1 ulp; the plasma
        # colormap can turn that into a couple of 8-bit color steps on a
        # handful of pixels (measured: 5/318k pixels off by 2)
        np.testing.assert_allclose(
            outs[True][k].astype(np.int64), outs[False][k].astype(np.int64),
            atol=3, err_msg=str(k),
        )


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
