"""Space-to-depth stem: exactness vs the plain stem, including odd sizes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fal_net_tpu.models.backbone import FalNetBackbone, VARIANTS
from fal_net_tpu.ops.s2d import (
    concat_s2d,
    conv_s2d_input,
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


@pytest.mark.parametrize("kh,kw", [(3, 3), (3, 1), (1, 3), (1, 1)])
def test_conv_s2d_input_exact(rng, kh, kw):
    """Fused input-space form: conv_s2d_input(x) == s2d(conv_s1(x)) with no
    s2d of x ever built."""
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 3)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((kh, kw, 3, 7)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((7,)).astype(np.float32))
    want = space_to_depth(
        jax.lax.conv_general_dilated(
            x, k, (1, 1), ((kh // 2, kh // 2), (kw // 2, kw // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + b
    )
    got = conv_s2d_input(x, k, b)
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


def test_convop_s2d_raw_extra_matches_concat(rng):
    """ConvOp's tuple-s2d split-sum with a RAW full-res extra (plus a
    ConstPlane, so the kernel-slice offset bookkeeping is exercised too)
    == the stride-2 conv over the full-res concat.  No in-model config
    passes a raw extra today (stem_flow_analytic wraps the constant flow
    plane in a ConstPlane instead); this pins the general branch — in
    particular its ((1,0),(1,0)) low-side padding, which must match
    conv_s2d_s2's block-domain windows."""
    from fal_net_tpu.models.layers import ConstPlane, ConvOp

    x0 = rng.standard_normal((2, 12, 16, 6)).astype(np.float32)
    raw = rng.standard_normal((2, 12, 16, 2)).astype(np.float32)
    const_val = jnp.full((2, 1, 1, 1), 3.0, jnp.float32)
    xs = (
        space_to_depth(jnp.asarray(x0)),
        ConstPlane(const_val, (0, 0)),
        jnp.asarray(raw),
    )
    op = ConvOp(7, (3, 3), stride=2, domain="s2d")
    variables = op.init(jax.random.PRNGKey(0), xs)
    got = op.apply(variables, xs)

    k = variables["params"]["kernel"]
    b = variables["params"]["bias"]
    cat = jnp.concatenate(
        [jnp.asarray(x0), jnp.broadcast_to(const_val, (2, 12, 16, 1)),
         jnp.asarray(raw)], -1,
    )
    want = jax.lax.conv_general_dilated(
        cat, k, (2, 2), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_stem_flow_analytic_rejects_varying_flow(rng):
    """stem_flow_analytic reads only flow[:, :1, :1, :]; an eager call with
    a spatially varying flow plane must fail loudly, not return silently
    wrong outputs."""
    image = jnp.asarray(rng.standard_normal((1, 16, 24, 3)).astype(np.float32))
    flow_bad = jnp.asarray(
        rng.standard_normal((1, 16, 24, 1)).astype(np.float32)
    )
    m = FalNetBackbone(
        VARIANTS["tiny"], num_out=5, s2d_stem=True, stem_flow_analytic=True
    )
    with pytest.raises(ValueError, match="per-item-constant flow"):
        m.init(jax.random.PRNGKey(0), image, flow_bad)
    # the broadcast-constant plane FalNet always passes is accepted
    m.init(jax.random.PRNGKey(0), image, jnp.full((1, 16, 24, 1), 3.0))


@pytest.mark.slow  # two full-backbone grad compiles (~50 s cold)
def test_stem_input_fuse_grads_match(rng):
    """Training path: parameter grads through the fused stem (conv_s2d_input
    + analytic-flow split-sum conv1) match the materialized-s2d stem's."""
    image = jnp.asarray(rng.standard_normal((2, 16, 24, 3)).astype(np.float32) * 0.3)
    flow = jnp.full((2, 16, 24, 1), 3.0, jnp.float32)
    spec = VARIANTS["tiny"]
    m0 = FalNetBackbone(spec, num_out=5, s2d_stem=True, stem_input_fuse=False)
    m1 = FalNetBackbone(
        spec, num_out=5, s2d_stem=True,
        stem_input_fuse=True, stem_flow_analytic=True,
    )
    params = m0.init(jax.random.PRNGKey(0), image, flow)

    def loss(m):
        return lambda p: jnp.sum(jnp.square(m.apply(p, image, flow)))

    g0 = jax.grad(loss(m0))(params)
    g1 = jax.grad(loss(m1))(params)
    jax.tree.map(
        # split-sum conv1 + fused conv0 reassociate sums; grads are O(1e2)
        # here, so atol 1e-3 is still a 1e-5 relative bound on the tree
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-3
        ),
        g0,
        g1,
    )


@pytest.mark.parametrize("variant", ["A", "B"])
@pytest.mark.parametrize("hw", [(64, 96), (63, 96), (63, 95)])
@pytest.mark.parametrize("input_fuse", [False, True])
def test_backbone_s2d_stem_matches_plain(rng, variant, hw, input_fuse):
    """Same params, s2d stem on/off -> same logits (odd sizes exercise the
    pad+mask path emulating conv zero padding).  ``input_fuse`` covers both
    stem forms: the s2d-domain convs over a materialized s2d(image), and the
    fused raw-input conv0 + analytic-flow split-sum conv1 (no s2d copies,
    no flow conv at all; odd sizes exercise the ConstPlane pad taps)."""
    h, w = hw
    image = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32) * 0.3)
    flow = jnp.full((1, h, w, 1), 3.0, jnp.float32)

    plain = FalNetBackbone(VARIANTS[variant], num_out=9, s2d_stem=False)
    s2d = FalNetBackbone(
        VARIANTS[variant], num_out=9, s2d_stem=True,
        stem_input_fuse=input_fuse, stem_flow_analytic=input_fuse,
    )
    params = plain.init(jax.random.PRNGKey(0), image, flow)
    # identical param trees
    jax.tree.map(lambda a, b: None, params, s2d.init(jax.random.PRNGKey(0), image, flow))

    want = plain.apply(params, image, flow)
    got = s2d.apply(params, image, flow)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
