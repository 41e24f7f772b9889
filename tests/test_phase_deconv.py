"""Phase-decomposed deconv (ops/phase_deconv.py): exactness vs the plain
nearest-2x-upsample + conv3x3 path, at the op, layer, and model levels."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fal_net_tpu.models import create_model
from fal_net_tpu.models.layers import Deconv
from fal_net_tpu.ops.phase_deconv import conv3x3_on_up2


@pytest.mark.parametrize("h,w,cin,cout", [
    (16, 20, 7, 5),
    (9, 13, 3, 4),   # odd source sizes still produce exact 2x targets
    (6, 40, 16, 8),
])
def test_op_matches_plain(rng, h, w, cin, cout):
    x = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.float32)
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    ref = jax.lax.conv_general_dilated(
        up, w3, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = conv3x3_on_up2(x, w3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_op_gradients_match(rng):
    """The decomposition is linear in both inputs, so VJPs must agree with
    the plain path (training uses this path too)."""
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 5)), jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((3, 3, 5, 4)) * 0.1, jnp.float32)

    def loss_phase(x_, w_):
        return jnp.sum(jnp.sin(conv3x3_on_up2(x_, w_)))

    def loss_plain(x_, w_):
        up = jnp.repeat(jnp.repeat(x_, 2, axis=1), 2, axis=2)
        y = jax.lax.conv_general_dilated(
            up, w_, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(jnp.sin(y))

    gx1, gw1 = jax.grad(loss_phase, argnums=(0, 1))(x, w3)
    gx2, gw2 = jax.grad(loss_plain, argnums=(0, 1))(x, w3)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4, atol=1e-5)


def test_deconv_layer_phase_matches_plain(rng):
    """Deconv(phase=True) == Deconv(phase=False) with identical params
    (same 'conv/kernel' path — checkpoints are phase-agnostic)."""
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 6)), jnp.float32)
    plain = Deconv(4, phase=False)
    variables = plain.init(jax.random.PRNGKey(0), x, (16, 20))
    ref = plain.apply(variables, x, (16, 20))
    got = Deconv(4, phase=True).apply(variables, x, (16, 20))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_deconv_layer_non_2x_falls_back(rng):
    """Odd/non-2x targets (odd KITTI-raw sizes) use the resize path with
    the same parameters."""
    x = jnp.asarray(rng.standard_normal((1, 8, 10, 6)), jnp.float32)
    plain = Deconv(4, phase=False)
    variables = plain.init(jax.random.PRNGKey(0), x, (15, 19))
    ref = plain.apply(variables, x, (15, 19))
    got = Deconv(4, phase=True).apply(variables, x, (15, 19))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert got.shape == (1, 15, 19, 4)


def test_model_phase_flag_equivalence(rng):
    """create_model(phase_deconv=...) toggles the decoder path; disp is
    identical to fp32 tolerance, and odd input sizes still run."""
    x = jnp.asarray(rng.standard_normal((1, 64, 96, 3)).astype(np.float32) * 0.3)
    m_on = create_model("tiny", 5)
    m_off = create_model("tiny", 5, phase_deconv=False)
    variables = m_on.init(jax.random.PRNGKey(0), x, 2.0, 30.0, ret_disp=True)
    d_on = m_on.apply(variables, x, 2.0, 30.0, ret_disp=True).disp
    d_off = m_off.apply(variables, x, 2.0, 30.0, ret_disp=True).disp
    np.testing.assert_allclose(np.asarray(d_on), np.asarray(d_off), rtol=1e-4, atol=1e-5)

    # odd spatial size (s2d stem pads; decoder targets go odd -> fallback)
    x_odd = jnp.asarray(rng.standard_normal((1, 63, 95, 3)).astype(np.float32) * 0.3)
    v2 = m_on.init(jax.random.PRNGKey(0), x_odd, 2.0, 30.0, ret_disp=True)
    d_odd = m_on.apply(v2, x_odd, 2.0, 30.0, ret_disp=True).disp
    assert d_odd.shape == (1, 63, 95, 1) and np.isfinite(np.asarray(d_odd)).all()
