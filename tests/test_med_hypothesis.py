"""Property-based (hypothesis) tests for the core MED ops.

(Separate from tests/test_med_properties.py, the fixed-case physics
properties — this file randomizes shapes/bounds via hypothesis.)

Complements the golden tests: instead of pinning against the reference at
fixed shapes, these assert invariants that must hold for ANY shape/bounds
the ops accept — the class of bugs shape-specific goldens can miss.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from fal_net_tpu.ops.med import (
    disparity_expectation,
    disparity_levels,
    med_outputs,
)
from fal_net_tpu.ops.shift import hshift

pytestmark = pytest.mark.slow  # hypothesis property sweeps

SET = dict(max_examples=15, deadline=None)


@settings(**SET)
@given(
    n=st.integers(2, 49),
    min_d=st.floats(0.5, 10.0),
    ratio=st.floats(1.5, 200.0),
)
def test_levels_monotone_geometric(n, min_d, ratio):
    max_d = min_d * ratio
    lv = np.asarray(disparity_levels(min_d, max_d, n))
    assert lv.shape == (n,)
    assert np.all(np.diff(lv) > 0)  # strictly increasing
    assert lv[0] == pytest.approx(min_d, rel=1e-5)
    assert lv[-1] == pytest.approx(max_d, rel=1e-5)
    # geometric: constant ratio between consecutive levels
    r = lv[1:] / lv[:-1]
    np.testing.assert_allclose(r, r[0], rtol=1e-4)


@settings(**SET)
@given(
    b=st.integers(1, 3),
    h=st.integers(1, 9),
    w=st.integers(4, 40),
    n=st.integers(2, 9),
    seed=st.integers(0, 2**31 - 1),
)
def test_expectation_bounded_by_levels(b, h, w, n, seed):
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.standard_normal((b, h, w, n)).astype(np.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    lv = disparity_levels(2.0, 30.0, n)
    d = np.asarray(disparity_expectation(probs, lv))
    assert d.shape == (b, h, w, 1)
    assert (d >= 2.0 - 1e-4).all() and (d <= 30.0 + 1e-4).all()


@settings(**SET)
@given(
    w=st.integers(4, 60),
    shift_px=st.floats(-70.0, 70.0),  # beyond +-w: fully out of range
    seed=st.integers(0, 2**31 - 1),
)
def test_hshift_mass_bounds(w, shift_px, seed):
    """A shift never creates mass: sum(shifted) <= sum(x) for non-negative
    x (zeros padding only removes).  ``hshift`` takes the shift in PIXELS
    (ops/shift.py:31-40: output[i] = x[i + shift])."""
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((1, 4, w, 1)).astype(np.float32))
    y = np.asarray(hshift(x, shift_px, axis=-2))
    assert y.shape == x.shape
    assert y.sum() <= np.asarray(x).sum() + 1e-3
    assert (y >= -1e-6).all()
    if abs(shift_px) >= w:
        np.testing.assert_array_equal(y, 0.0)  # fully out of range


@settings(**SET)
@given(
    w=st.integers(4, 60),
    k=st.integers(-60, 60),
    seed=st.integers(0, 2**31 - 1),
)
def test_hshift_integer_shift_exact(w, k, seed):
    """Integer pixel shifts move values EXACTLY (frac = 0, pure gather
    with zero fill) — output[i] = x[i + k] where in range, else 0."""
    rng = np.random.default_rng(seed)
    x_np = rng.random((1, 2, w, 1)).astype(np.float32)
    y = np.asarray(hshift(jnp.asarray(x_np), float(k), axis=-2))
    want = np.zeros_like(x_np)
    for i in range(w):
        if 0 <= i + k < w:
            want[:, :, i] = x_np[:, :, i + k]
    np.testing.assert_array_equal(y, want)


@settings(**SET)
@given(
    h=st.integers(2, 8),
    w=st.integers(8, 48),
    n=st.integers(2, 7),
    c=st.integers(1, 3),
    seed=st.integers(0, 2**31 - 1),
)
def test_med_outputs_invariants(h, w, n, c, seed):
    """For any shape: disp within [min,max], masks in [0,1], pan finite,
    Dprob-driven pan bounded by the max |left| value (convex-ish blend of
    shifted copies, each weight sum <= 1 per pixel)."""
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.standard_normal((1, h, w, n)).astype(np.float32))
    image = jnp.asarray(rng.random((1, h, w, c)).astype(np.float32))
    out = med_outputs(
        logits, image, 2.0, 30.0, ret_disp=True, ret_pan=True, ret_subocc=True
    )
    d = np.asarray(out.disp)
    assert np.isfinite(d).all()
    assert (d >= 2.0 - 1e-4).all() and (d <= 30.0 + 1e-4).all()
    for m in (out.maskL, out.maskR):
        m = np.asarray(m)
        assert (m >= -1e-6).all() and (m <= 1.0 + 1e-6).all()
    pan = np.asarray(out.pan)
    assert np.isfinite(pan).all()
    assert pan.max() <= float(np.asarray(image).max()) + 1e-4
    assert pan.min() >= -1e-4  # non-negative image, non-negative weights
