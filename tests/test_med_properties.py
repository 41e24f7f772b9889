"""Physics/property sanity for the MED head (both implementations).

These pin down behaviors the golden tests imply but don't state:
probability mass conservation away from borders, constant-image pan
reconstruction, and disparity bounds.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from fal_net_tpu.ops.med import med_outputs
from fal_net_tpu.ops.med_pallas import med_outputs_fused


IMPLS = [
    ("jnp", lambda *a, **k: med_outputs(*a, **k)),
    ("fused", lambda *a, **k: med_outputs_fused(*a, **k, interpret=True)),
]


@pytest.mark.parametrize("name,impl", IMPLS)
def test_constant_image_pan_interior(rng, name, impl):
    """pan of a constant image equals that constant wherever no plane's
    shift reads out of bounds (Dprob sums to 1)."""
    b, h, w, n = 1, 8, 256, 7
    logits = jnp.asarray(rng.standard_normal((b, h, w, n)).astype(np.float32))
    image = jnp.full((b, h, w, 3), 0.37, jnp.float32)
    max_disp = 20.0
    out = impl(logits, image, 2.0, max_disp, ret_disp=True, ret_pan=True)
    interior = np.asarray(out.pan)[:, :, : w - int(max_disp) - 2, :]
    np.testing.assert_allclose(interior, 0.37, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name,impl", IMPLS)
def test_disp_within_bounds(rng, name, impl):
    b, h, w, n = 2, 8, 64, 9
    logits = jnp.asarray(rng.standard_normal((b, h, w, n)).astype(np.float32) * 3)
    image = jnp.zeros((b, h, w, 3), jnp.float32)
    out = impl(logits, image, 2.0, 300.0, ret_disp=True)
    d = np.asarray(out.disp)
    assert d.min() >= 2.0 - 1e-3 and d.max() <= 300.0 + 1e-1


@pytest.mark.parametrize("name,impl", IMPLS)
def test_uniform_logits_disp_is_mean_level(rng, name, impl):
    """Equal logits -> uniform plane probabilities -> disp == mean(levels)."""
    from fal_net_tpu.ops.med import disparity_levels

    b, h, w, n = 1, 8, 64, 9
    logits = jnp.zeros((b, h, w, n), jnp.float32)
    image = jnp.zeros((b, h, w, 3), jnp.float32)
    out = impl(logits, image, 2.0, 300.0, ret_disp=True)
    want = float(np.mean(np.asarray(disparity_levels(2.0, 300.0, n))))
    np.testing.assert_allclose(np.asarray(out.disp), want, rtol=1e-4)


@pytest.mark.parametrize("name,impl", IMPLS)
def test_mask_mass_interior(rng, name, impl):
    """maskR stays in [0, 1] after the clamp; for SPATIALLY CONSTANT plane
    probabilities the shifted mass sums to exactly 1 wherever every plane's
    source is in range (each plane samples a different x, so this only
    holds when sm0 doesn't vary across x)."""
    b, h, w, n = 1, 8, 256, 7
    const_logits = jnp.broadcast_to(
        jnp.asarray(rng.standard_normal((n,)).astype(np.float32)), (b, h, w, n)
    )
    image = jnp.zeros((b, h, w, 3), jnp.float32)
    max_disp = 16.0
    out = impl(
        const_logits, image, 2.0, max_disp, ret_disp=True, ret_pan=True, ret_subocc=True
    )
    mr = np.asarray(out.maskR)
    assert mr.min() >= 0.0 and mr.max() <= 1.0 + 1e-6
    interior = mr[:, :, : w - int(max_disp) - 2, :]
    np.testing.assert_allclose(interior, 1.0, atol=1e-3)

    # random logits: still bounded by the clamp
    logits = jnp.asarray(rng.standard_normal((b, h, w, n)).astype(np.float32))
    out2 = impl(
        logits, image, 2.0, max_disp, ret_disp=True, ret_pan=True, ret_subocc=True
    )
    mr2 = np.asarray(out2.maskR)
    assert mr2.min() >= 0.0 and mr2.max() <= 1.0 + 1e-6
