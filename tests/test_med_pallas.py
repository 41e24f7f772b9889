"""Fused Pallas MED kernel vs the jnp reference implementation.

Runs in Pallas interpret mode on CPU (numerically identical semantics to
the compiled TPU kernel, minus Mosaic codegen).  A separate on-TPU check
lives in bench/verify flows.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fal_net_tpu.ops.med import med_outputs
from fal_net_tpu.ops.med_pallas import med_outputs_fused


def _data(rng, b=1, h=16, w=256, n=9, c=3):
    logits = jnp.asarray(rng.standard_normal((b, h, w, n)).astype(np.float32))
    image = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    return logits, image


@pytest.mark.parametrize("min_disp,max_disp", [(2.0, 300.0), (1.0, 30.0)])
def test_fused_forward_matches_reference(rng, min_disp, max_disp):
    logits, image = _data(rng)
    want = med_outputs(
        logits, image, min_disp, max_disp,
        ret_disp=True, ret_pan=True, ret_subocc=True,
    )
    got = med_outputs_fused(
        logits, image, min_disp, max_disp,
        ret_disp=True, ret_pan=True, ret_subocc=True, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got.disp), np.asarray(want.disp), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.pan), np.asarray(want.pan), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.maskL), np.asarray(want.maskL), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.maskR), np.asarray(want.maskR), rtol=1e-4, atol=1e-4)


def test_fused_forward_odd_height(rng):
    """H not a multiple of TILE_H exercises the pad/crop path."""
    logits, image = _data(rng, h=13)
    want = med_outputs(logits, image, 2.0, 300.0, ret_disp=True, ret_pan=True)
    got = med_outputs_fused(
        logits, image, 2.0, 300.0, ret_disp=True, ret_pan=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got.disp), np.asarray(want.disp), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.pan), np.asarray(want.pan), rtol=1e-4, atol=1e-4)


def test_fused_forward_unaligned_width(rng):
    """W not a multiple of 128 (all real KITTI widths): the padded row
    length must stay lane-aligned or Mosaic rejects the dynamic rotates
    (found driving 375x1242 on hardware)."""
    logits, image = _data(rng, h=16, w=187)
    want = med_outputs(
        logits, image, 2.0, 300.0, ret_disp=True, ret_pan=True, ret_subocc=True
    )
    got = med_outputs_fused(
        logits, image, 2.0, 300.0,
        ret_disp=True, ret_pan=True, ret_subocc=True, interpret=True,
    )
    for name in ("disp", "pan", "maskL", "maskR"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            rtol=1e-4, atol=1e-4,
        )


def test_pad_row_len_is_pow2_tiles():
    """The padded scratch row length must be a power-of-two multiple of
    128 lanes: the backend's Mosaic miscompiles dynamic pltpu.roll on
    3x/5x/6x128-lane rows (scripts/probe_roll_bug.py, round 5) — this
    pins the workaround so a refactor can't quietly reintroduce plain
    128-alignment."""
    from fal_net_tpu.ops.med_pallas import _pad_row_len, _plane_tables

    for x in (129, 384, 640, 896, 1408, 2048, 2049):
        wp = _pad_row_len(x)
        assert wp >= x and wp % 128 == 0
        tiles = wp // 128
        assert tiles & (tiles - 1) == 0, (x, wp)
    # the shapes that broke / mattered on-chip
    for w, mind, maxd in ((128, 2.0, 18.0), (640, 2.0, 300.0), (1280, 2.0, 300.0)):
        *_, pad = _plane_tables(mind, maxd, 33, w)
        wp = _pad_row_len(w + 2 * pad)
        tiles = wp // 128
        assert tiles & (tiles - 1) == 0, (w, wp)
    # the production 384x1280 program is unchanged (16x128 either way)
    *_, pad = _plane_tables(2.0, 300.0, 49, 1280)
    assert _pad_row_len(1280 + 2 * pad) == 2048


def test_fused_disp_only(rng):
    logits, image = _data(rng, b=2)
    want = med_outputs(logits, image, 2.0, 300.0, ret_disp=True)
    got = med_outputs_fused(logits, image, 2.0, 300.0, ret_disp=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got.disp), np.asarray(want.disp), rtol=1e-5, atol=1e-4)
    assert got.pan is None and got.maskL is None


@pytest.mark.parametrize(
    "n,min_disp,max_disp",
    [
        (7, 2.0, 60.0),
        # the A/C variants' native plane count at their training bounds —
        # the round-5 on-chip regression shape (see probe_med_shapes.py)
        (33, 2.0, 18.0),
        (49, 2.0, 300.0),  # production plane count
    ],
)
def test_fused_gradients_match_reference(rng, n, min_disp, max_disp):
    logits, image = _data(rng, h=8, w=128, n=n)

    def loss_ref(lg, im):
        o = med_outputs(lg, im, min_disp, max_disp, ret_disp=True, ret_pan=True)
        return jnp.sum(jnp.sin(o.pan)) + jnp.sum(jnp.cos(o.disp / max_disp))

    def loss_fused(lg, im):
        o = med_outputs_fused(
            lg, im, min_disp, max_disp, ret_disp=True, ret_pan=True, interpret=True
        )
        return jnp.sum(jnp.sin(o.pan)) + jnp.sum(jnp.cos(o.disp / max_disp))

    gl_ref, gi_ref = jax.grad(loss_ref, argnums=(0, 1))(logits, image)
    gl_f, gi_f = jax.grad(loss_fused, argnums=(0, 1))(logits, image)
    np.testing.assert_allclose(np.asarray(gl_f), np.asarray(gl_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gi_f), np.asarray(gi_ref), rtol=1e-4, atol=1e-5)


def test_fused_gradients_subocc_stopgrad(rng):
    """Masks carry no gradient in either implementation."""
    logits, image = _data(rng, h=8, w=128, n=5)

    def loss(lg):
        o = med_outputs_fused(
            lg, image, 2.0, 60.0, ret_disp=True, ret_pan=True, ret_subocc=True,
            interpret=True,
        )
        return jnp.sum(o.maskL) + jnp.sum(o.maskR)

    g = jax.grad(loss)(logits)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


def test_fused_falls_back_for_traced_bounds(rng):
    logits, image = _data(rng, h=8, w=64, n=5)
    out = med_outputs_fused(
        logits, image, jnp.float32(2.0), jnp.float32(60.0), ret_disp=True
    )
    want = med_outputs(logits, image, 2.0, 60.0, ret_disp=True)
    np.testing.assert_allclose(np.asarray(out.disp), np.asarray(want.disp), rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize(
    "b,h,w,n,c",
    [
        (3, 16, 96, 2, 3),   # minimum plane count
        (1, 3, 64, 5, 1),    # H below one tile, single-channel image
        (2, 16, 48, 7, 4),   # W smaller than the max shift in pixels
        (1, 8, 140, 49, 3),  # production plane count, unaligned W
    ],
)
def test_fused_adversarial_shapes(rng, b, h, w, n, c):
    """Shape fuzz: tiny plane counts, sub-tile heights, shifts that run
    past the image width, odd channel counts — all must match the jnp
    reference bit-for-fp32-bit through the pad/crop machinery."""
    logits = jnp.asarray(rng.standard_normal((b, h, w, n)).astype(np.float32))
    image = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    want = med_outputs(
        logits, image, 2.0, 300.0, ret_disp=True, ret_pan=True, ret_subocc=True
    )
    got = med_outputs_fused(
        logits, image, 2.0, 300.0,
        ret_disp=True, ret_pan=True, ret_subocc=True, interpret=True,
    )
    for name in ("disp", "pan", "maskL", "maskR"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            rtol=1e-4, atol=1e-4, err_msg=f"{name} @ {(b, h, w, n, c)}",
        )
