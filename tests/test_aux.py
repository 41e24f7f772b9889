"""Auxiliary-component parity: multiscale EPE, sparse max pool,
local_normalization, viz helpers, point-cloud geometry."""

import numpy as np
import pytest
import jax.numpy as jnp

from fal_net_tpu.losses.epe import multiscale_epe, sparse_max_pool
from fal_net_tpu.utils.viz import disp2rgb, flow2rgb, grid2rgb, local_normalization
from fal_net_tpu.eval.export import disparity_to_point_cloud

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_sparse_max_pool_matches_reference(rng):
    x = (rng.random((1, 12, 20, 1)).astype(np.float32) - 0.5) * 40
    x[rng.random((1, 12, 20, 1)) < 0.6] = 0
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    pos = (t > 0).float()
    neg = (t < 0).float()
    want = (
        F.adaptive_max_pool2d(t * pos, (5, 7))
        - F.adaptive_max_pool2d(-t * neg, (5, 7))
    ).numpy()
    got = np.asarray(sparse_max_pool(jnp.asarray(x), (5, 7))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_multiscale_epe_matches_reference(rng):
    target = rng.random((1, 16, 24, 1)).astype(np.float32) * 30
    target[0, :4] = 0
    outs = [
        rng.random((1, 8, 12, 1)).astype(np.float32) * 30,
        rng.random((1, 4, 6, 1)).astype(np.float32) * 30,
    ]
    weights = [0.01, 0.02]

    # reference-style torch computation
    t = torch.from_numpy(target.transpose(0, 3, 1, 2))
    want = 0.0
    for o, wgt in zip(outs, weights):
        ot = torch.from_numpy(o.transpose(0, 3, 1, 2))
        _, _, h, w = ot.shape
        pos = (t > 0).float()
        neg = (t < 0).float()
        ts = F.adaptive_max_pool2d(t * pos, (h, w)) - F.adaptive_max_pool2d(-t * neg, (h, w))
        epe_map = torch.norm(ts - ot, p=2, dim=1)
        mask = ts[:, 0] == 0
        want = want + wgt * (epe_map[~mask].sum() / ot.shape[0])
    got = float(multiscale_epe(
        [jnp.asarray(o) for o in outs], jnp.asarray(target), weights, sparse=True
    ))
    np.testing.assert_allclose(got, float(want), rtol=1e-5)


def test_local_normalization_matches_reference(rng):
    img = rng.random((1, 10, 14, 3)).astype(np.float32) - 0.4
    t = torch.from_numpy(img.transpose(0, 3, 1, 2))
    m_rgb = torch.ones((1, 3, 1, 1))
    for c, v in enumerate([0.411, 0.432, 0.45]):
        m_rgb[:, c] *= v
    x = t + m_rgb
    win = 3
    mean = F.avg_pool2d(x, kernel_size=win, stride=1, padding=(win - 1) // 2)
    std = F.avg_pool2d((x - mean) ** 2, kernel_size=win, stride=1, padding=(win - 1) // 2) ** 0.5
    want = ((x - mean) / (std + 1e-7)).numpy()
    got = local_normalization(img[0]).transpose(2, 0, 1)[None]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_viz_shapes(rng):
    d = rng.random((6, 8, 1)).astype(np.float32) * 50
    rgb = disp2rgb(d)
    assert rgb.shape == (6, 8, 3) and rgb.min() >= 0 and rgb.max() <= 1
    f = rng.standard_normal((6, 8, 2)).astype(np.float32)
    assert flow2rgb(f).shape == (6, 8, 3)
    assert grid2rgb(f).shape == (6, 8, 3)


def test_point_cloud_geometry(rng):
    h, w = 16, 1242
    disp = np.full((h, w), 50.0, np.float32)
    img = np.full((h, w, 3), 128.0, np.float32)
    pc = disparity_to_point_cloud(img, disp)
    assert pc.shape == (h * w, 6)
    # constant disparity -> constant depth (column 1 = z in the reference's
    # axis convention), z = f*b/d
    from fal_net_tpu.eval.metrics import WIDTH_TO_BASELINE, WIDTH_TO_FOCAL

    z = WIDTH_TO_FOCAL[1242] * WIDTH_TO_BASELINE[1242] / (50.0 + 1e-4)
    np.testing.assert_allclose(pc[:, 1], z, rtol=1e-5)


def test_flow2rgb_matches_reference_recipe(rng):
    """Golden parity with myUtils.flow2rgb (transcribed) on flow without
    invalid (zero-vector) pixels and an explicit max_value — the nan
    handling for invalid pixels is a deliberate fix here (the reference's
    max_value=None path poisons the whole image with nan via np.max)."""
    flow = rng.standard_normal((6, 8, 2)).astype(np.float32)
    flow[np.abs(flow) < 1e-3] = 0.1  # no exact zero-vectors
    max_value = 2.0

    # reference math (myUtils.py:31-43), CHW
    fm = flow.transpose(2, 0, 1).copy()
    ref = np.ones((3, 6, 8), np.float32)
    nf = fm / max_value
    ref[0] += nf[0]
    ref[1] -= 0.5 * (nf[0] + nf[1])
    ref[2] += nf[1]
    ref = ref.clip(0, 1)

    got = flow2rgb(flow, max_value)
    np.testing.assert_allclose(got.transpose(2, 0, 1), ref, rtol=1e-6)

    # grid2rgb shares the recipe (myUtils.py:45-56, HWC input)
    got_g = grid2rgb(flow, max_value)
    np.testing.assert_allclose(got_g, got, rtol=1e-6)


def test_disp2rgb_matches_reference_recipe(rng):
    disp = (rng.random((6, 8, 1)) * 40).astype(np.float32)
    got = disp2rgb(disp, max_value=50.0)
    ref = np.clip(disp[..., 0] / 50.0, 0, 1)
    for c in range(3):
        np.testing.assert_allclose(got[..., c], ref, rtol=1e-6)
