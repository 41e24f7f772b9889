"""MED head ops vs a direct torch transcription of the reference semantics.

Builds the reference's head math (FAL_netB.py:200-297) in torch on CPU from
its published equations — plane-by-plane grid_sample loop — and checks our
vectorized jnp implementation against it.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fal_net_tpu.ops import (
    disparity_levels,
    disparity_expectation,
    med_outputs,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_med_reference(logits_nchw, image_nchw, min_disp, max_disp):
    """Torch transcription of FAL_netB.py:200-297 (CPU, no .cuda())."""
    dlog0 = torch.from_numpy(logits_nchw)
    left = torch.from_numpy(image_nchw)
    B, N, H, W = dlog0.shape
    C = left.shape[1]
    x_pix_min = 2 * min_disp / W
    x_pix_max = 2 * max_disp / W
    sm = torch.softmax(dlog0, dim=1)

    disp = 0
    for n in range(N):
        c = n / (N - 1)
        w = max_disp * np.exp(np.log(max_disp / min_disp) * (c - 1))
        disp = disp + w * sm[:, n, :, :].unsqueeze(1)

    theta = torch.zeros(B, 2, 3)
    theta[:, 0, 0] = 1
    theta[:, 1, 1] = 1
    i_grid = F.affine_grid(theta, [B, C, H, W], align_corners=True)

    planes = []
    for n in range(N):
        c = n / (N - 1)
        x_of = x_pix_max * np.exp(np.log(x_pix_max / x_pix_min) * (c - 1))
        g = i_grid.clone()
        g[:, :, :, 0] = g[:, :, :, 0] + x_of
        planes.append(F.grid_sample(dlog0[:, n].unsqueeze(1), g, align_corners=True))
    Dprob = torch.softmax(torch.cat(planes, 1), dim=1)

    pan = 0
    maskR = 0
    maskL = 0
    for n in range(N):
        c = n / (N - 1)
        x_of = x_pix_max * np.exp(np.log(x_pix_max / x_pix_min) * (c - 1))
        g = i_grid.clone()
        g[:, :, :, 0] = g[:, :, :, 0] + x_of
        maskR = maskR + F.grid_sample(sm[:, n].unsqueeze(1), g, align_corners=True)
        g1 = i_grid.clone()
        g1[:, :, :, 0] = g1[:, :, :, 0] - x_of
        maskL = maskL + F.grid_sample(Dprob[:, n].unsqueeze(1), g1, align_corners=True)
        pan = pan + F.grid_sample(left, g, align_corners=True) * Dprob[:, n].unsqueeze(1)
    maskR = torch.clamp(maskR, max=1)
    maskL = torch.clamp(maskL, max=1)
    return (
        disp.numpy(),
        pan.numpy(),
        maskL.numpy(),
        maskR.numpy(),
    )


@pytest.mark.parametrize("min_disp,max_disp", [(2.0, 300.0), (1.0, 30.0)])
def test_med_outputs_match_reference_semantics(rng, min_disp, max_disp):
    B, H, W, N, C = 1, 8, 96, 9, 3
    logits = rng.standard_normal((B, N, H, W)).astype(np.float32)
    image = rng.standard_normal((B, C, H, W)).astype(np.float32)
    want_disp, want_pan, want_ml, want_mr = torch_med_reference(
        logits, image, min_disp, max_disp
    )
    got = med_outputs(
        jnp.asarray(logits.transpose(0, 2, 3, 1)),
        jnp.asarray(image.transpose(0, 2, 3, 1)),
        min_disp,
        max_disp,
        ret_disp=True,
        ret_pan=True,
        ret_subocc=True,
    )
    to_nchw = lambda a: np.asarray(a).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(to_nchw(got.disp), want_disp, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(to_nchw(got.pan), want_pan, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(to_nchw(got.maskL), want_ml, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(to_nchw(got.maskR), want_mr, rtol=1e-4, atol=1e-4)


def test_disparity_levels_span():
    lv = np.asarray(disparity_levels(2.0, 300.0, 49))
    assert lv.shape == (49,)
    np.testing.assert_allclose(lv[0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(lv[-1], 300.0, rtol=1e-6)
    # geometric spacing: constant ratio
    ratios = lv[1:] / lv[:-1]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-5)


def test_disparity_expectation_shapes(rng):
    probs = jax.nn.softmax(jnp.asarray(rng.standard_normal((2, 4, 8, 5)).astype(np.float32)))
    lv = disparity_levels(2.0, 300.0, 5)
    d = disparity_expectation(probs, lv)
    assert d.shape == (2, 4, 8, 1)
    # probabilities sum to one -> expectation within [min,max]
    dn = np.asarray(d)
    assert dn.min() >= 2.0 - 1e-4 and dn.max() <= 300.0 + 1e-3


def test_med_outputs_per_sample_disp_range(rng):
    """Per-sample (B,) min/max disparities go down the vmap path."""
    B, H, W, N, C = 2, 4, 32, 5, 3
    logits = rng.standard_normal((B, H, W, N)).astype(np.float32)
    image = rng.standard_normal((B, H, W, C)).astype(np.float32)
    mn = np.array([2.0, 4.0], np.float32)
    mx = np.array([300.0, 600.0], np.float32)
    got = med_outputs(
        jnp.asarray(logits), jnp.asarray(image), jnp.asarray(mn), jnp.asarray(mx),
        ret_disp=True, ret_pan=True, ret_subocc=True,
    )
    for b in range(B):
        ref = med_outputs(
            jnp.asarray(logits[b : b + 1]), jnp.asarray(image[b : b + 1]),
            float(mn[b]), float(mx[b]),
            ret_disp=True, ret_pan=True, ret_subocc=True,
        )
        np.testing.assert_allclose(
            np.asarray(got.disp[b]), np.asarray(ref.disp[0]), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got.pan[b]), np.asarray(ref.pan[0]), rtol=1e-5, atol=1e-5
        )


def test_med_outputs_grad_flows(rng):
    """Autodiff through the volume: grads land on logits, masks are detached."""
    B, H, W, N = 1, 4, 24, 5
    logits = jnp.asarray(rng.standard_normal((B, H, W, N)).astype(np.float32))
    image = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))

    def loss(lg):
        out = med_outputs(lg, image, 2.0, 300.0, ret_disp=True, ret_pan=True, ret_subocc=True)
        return jnp.sum(out.pan) + jnp.sum(out.disp)

    g = jax.grad(loss)(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
