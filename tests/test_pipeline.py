"""Batched streaming inference pipeline."""

import numpy as np
import jax
import jax.numpy as jnp

from fal_net_tpu.eval.pipeline import DisparityPipeline
from fal_net_tpu.models import create_model


def test_pipeline_order_and_ragged_tail(rng):
    model = create_model("tiny", 5)
    h, w = 32, 64
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), 2.0, 30.0, ret_disp=True
    )
    pipe = DisparityPipeline(model, variables, batch_size=4, max_disp=30.0)

    n = 10  # ragged: 4 + 4 + 2(+2 pad)
    items = [(f"img{i:02d}", rng.random((h, w, 3)).astype(np.float32) - 0.4)
             for i in range(n)]
    out = list(pipe.run(iter(items)))
    assert [name for name, _ in out] == [f"img{i:02d}" for i in range(n)]
    for _, d in out:
        assert d.shape == (h, w)
        assert np.isfinite(d).all()
        assert 2.0 - 1e-3 <= d.min() and d.max() <= 30.0 + 1e-2

    # batched result matches per-image forward
    single = np.asarray(
        model.apply(variables, jnp.asarray(items[5][1])[None], 2.0, 30.0,
                    ret_disp=True).disp
    )[0, ..., 0]
    np.testing.assert_allclose(out[5][1], single, rtol=1e-5, atol=1e-5)


def test_pipeline_with_ms_pp(rng):
    model = create_model("tiny", 5)
    h, w = 48, 96
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), 2.0, 30.0, ret_disp=True
    )
    pipe = DisparityPipeline(
        model, variables, batch_size=2, max_disp=30.0, ms_post_process=True
    )
    items = [(str(i), rng.random((h, w, 3)).astype(np.float32) - 0.4) for i in range(3)]
    out = list(pipe.run(iter(items)))
    assert len(out) == 3 and all(np.isfinite(d).all() for _, d in out)


def test_pipeline_sharded_matches_single_device(rng):
    """mesh= shards each serving batch over the data axis; results must
    match the unsharded pipeline exactly."""
    from fal_net_tpu.parallel.mesh import make_mesh

    model = create_model("tiny", 5)
    h, w = 32, 64
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), 2.0, 30.0, ret_disp=True
    )
    items = [(str(i), rng.random((h, w, 3)).astype(np.float32) - 0.4)
             for i in range(6)]
    plain = dict(DisparityPipeline(
        model, variables, batch_size=4, max_disp=30.0
    ).run(iter(items)))
    sharded = dict(DisparityPipeline(
        model, variables, batch_size=4, max_disp=30.0, mesh=make_mesh(4)
    ).run(iter(items)))
    assert plain.keys() == sharded.keys()
    for k in plain:
        np.testing.assert_allclose(sharded[k], plain[k], rtol=1e-5, atol=1e-5)


def test_pipeline_quantize_uint16(rng):
    """quantize_uint16 fetches disp as on-device round(d*256) uint16 (the
    KITTI PNG fixed-point format, half the D2H bytes) and yields floats at
    1/256 px resolution."""
    model = create_model("tiny", 5)
    h, w = 32, 64
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), 2.0, 30.0, ret_disp=True
    )
    items = [(str(i), rng.random((h, w, 3)).astype(np.float32) - 0.4)
             for i in range(5)]
    exact = dict(DisparityPipeline(
        model, variables, batch_size=2, max_disp=30.0
    ).run(iter(items)))
    quant = dict(DisparityPipeline(
        model, variables, batch_size=2, max_disp=30.0, quantize_uint16=True
    ).run(iter(items)))
    assert exact.keys() == quant.keys()
    for k in exact:
        assert quant[k].dtype == np.float32
        np.testing.assert_allclose(quant[k], exact[k], atol=0.5 / 256 + 1e-6)


def test_pipeline_quantize_warns_on_large_max_disp(rng):
    """quantize_uint16 caps at 65535/256 px; combining it with a larger
    max_disp must warn at construction (ADVICE r2)."""
    import pytest

    model = create_model("tiny", 5)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)), 2.0, 300.0, ret_disp=True
    )
    with pytest.warns(UserWarning, match="255.996"):
        DisparityPipeline(
            model, variables, batch_size=2, max_disp=300.0, quantize_uint16=True
        )


def test_pipeline_device_normalize_bitwise(rng):
    """device_normalize=True uploads raw uint8 and normalizes on device.
    The host path's mean subtraction rounds through float64 (numpy
    promotion), so inputs differ by <=1 ulp; outputs agree to fp32
    noise."""
    from fal_net_tpu.data.transforms import RGB_MEAN

    model = create_model("tiny", 5)
    h, w = 32, 64
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), 2.0, 30.0, ret_disp=True
    )
    raw = [(str(i), (rng.random((h, w, 3)) * 255).astype(np.uint8))
           for i in range(5)]
    norm = [(k, (v.astype(np.float32) / 255.0 - RGB_MEAN).astype(np.float32))
            for k, v in raw]
    host = dict(DisparityPipeline(
        model, variables, batch_size=2, max_disp=30.0
    ).run(iter(norm)))
    dev = dict(DisparityPipeline(
        model, variables, batch_size=2, max_disp=30.0, device_normalize=True
    ).run(iter(raw)))
    for k in host:
        np.testing.assert_allclose(dev[k], host[k], rtol=2e-5, atol=2e-4)


def test_pipeline_device_normalize_rejects_floats(rng):
    """Feeding pre-normalized floats with device_normalize=True must raise,
    not silently wrap negatives into uint8 garbage."""
    import pytest

    model = create_model("tiny", 5)
    h, w = 32, 64
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), 2.0, 30.0, ret_disp=True
    )
    pipe = DisparityPipeline(
        model, variables, batch_size=2, max_disp=30.0, device_normalize=True
    )
    bad = [("x", rng.random((h, w, 3)).astype(np.float32) - 0.4)]
    with pytest.raises(TypeError, match="expects uint8"):
        list(pipe.run(iter(bad)))
