"""Space-to-depth stem: exactness vs the plain stem, including odd sizes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fal_net_tpu.models.backbone import FalNetBackbone, VARIANTS
from fal_net_tpu.ops.s2d import (
    concat_s2d,
    conv_s2d_s1,
    conv_s2d_s2,
    depth_to_space,
    space_to_depth,
)


@pytest.mark.parametrize("kh,kw", [(3, 3), (3, 1), (1, 3)])
def test_conv_s2d_s1_exact(rng, kh, kw):
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 5)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((kh, kw, 5, 7)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((7,)).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    got = depth_to_space(conv_s2d_s1(space_to_depth(x), k, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_conv_s2d_s2_exact(rng):
    x = jnp.asarray(rng.standard_normal((1, 10, 14, 4)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 6)).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, k, (2, 2), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = conv_s2d_s2(space_to_depth(x), k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_concat_s2d_matches_full_res_concat(rng):
    a = jnp.asarray(rng.standard_normal((1, 8, 8, 6)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(concat_s2d([space_to_depth(a), space_to_depth(b)])),
        np.asarray(space_to_depth(jnp.concatenate([a, b], -1))),
    )


@pytest.mark.parametrize("variant", ["A", "B"])
@pytest.mark.parametrize("hw", [(64, 96), (63, 96), (63, 95)])
def test_backbone_s2d_stem_matches_plain(rng, variant, hw):
    """Same params, s2d stem on/off -> same logits (odd sizes exercise the
    pad+mask path emulating conv zero padding)."""
    h, w = hw
    image = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32) * 0.3)
    flow = jnp.full((1, h, w, 1), 3.0, jnp.float32)

    plain = FalNetBackbone(VARIANTS[variant], num_out=9, s2d_stem=False)
    s2d = FalNetBackbone(VARIANTS[variant], num_out=9, s2d_stem=True)
    params = plain.init(jax.random.PRNGKey(0), image, flow)
    # identical param trees
    jax.tree.map(lambda a, b: None, params, s2d.init(jax.random.PRNGKey(0), image, flow))

    want = plain.apply(params, image, flow)
    got = s2d.apply(params, image, flow)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
