"""Loss parity vs torch transcriptions of the reference loss_functions.py."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fal_net_tpu.losses import smoothness, rec_loss, perceptual_loss, real_epe
from fal_net_tpu.losses.vgg import Vgg19Features, convert_torch_vgg19

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_smoothness(img_nchw, disp_nchw, gamma):
    """CPU transcription of reference smoothness (loss_functions.py:70-109)."""
    img = torch.from_numpy(img_nchw)
    disp = torch.from_numpy(disp_nchw)
    B, C, H, W = img.shape
    m_rgb = torch.ones((B, C, 1, 1))
    m_rgb[:, 0] *= 0.411
    m_rgb[:, 1] *= 0.432
    m_rgb[:, 2] *= 0.45
    x = img + m_rgb
    gray = (0.299 * x[:, 0] + 0.587 * x[:, 1] + 0.114 * x[:, 2]).unsqueeze(1)

    def k(mat):
        return torch.tensor(mat, dtype=torch.float32).unsqueeze(0).unsqueeze(0)

    sx = k([[0, 0, 0], [-1, 2, -1], [0, 0, 0]])
    sy = k([[0, -1, 0], [0, 2, 0], [0, -1, 0]])
    dx = k([[0, 0, 0], [0, 1, -1], [0, 0, 0]])
    dy = k([[0, -1, 0], [0, 1, 0], [0, 0, 0]])
    dx1 = k([[0, 0, 0], [-1, 1, 0], [0, 0, 0]])
    dy1 = k([[0, 0, 0], [0, 1, 0], [0, -1, 0]])
    dx_img = F.conv2d(gray, sx, padding=1)
    dy_img = F.conv2d(gray, sy, padding=1)
    dx_d = F.conv2d(disp, dx, padding=1)
    dy_d = F.conv2d(disp, dy, padding=1)
    dx1_d = F.conv2d(disp, dx1, padding=1)
    dy1_d = F.conv2d(disp, dy1, padding=1)
    cds = torch.mean(
        (dx_d.abs() + dx1_d.abs()) * torch.exp(-gamma * dx_img.abs())
        + (dy_d.abs() + dy1_d.abs()) * torch.exp(-gamma * dy_img.abs())
    )
    return float(cds)


def test_smoothness_matches_reference(rng):
    img = rng.standard_normal((2, 3, 16, 24)).astype(np.float32) * 0.2
    disp = (rng.random((2, 1, 16, 24)).astype(np.float32)) * 80
    want = torch_smoothness(img, disp, gamma=2.0)
    got = float(
        smoothness(
            jnp.asarray(img.transpose(0, 2, 3, 1)),
            jnp.asarray(disp.transpose(0, 2, 3, 1)),
            gamma=2.0,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rec_loss_l1_only(rng):
    synth = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    label = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    got = float(rec_loss(1.0, jnp.asarray(synth), jnp.asarray(label), None, 0.0))
    want = np.mean(np.abs(synth - label))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_rec_loss_with_perceptual(rng):
    """Full rec loss with a tiny random VGG: same math as the reference formula."""
    model = Vgg19Features()
    x0 = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x0)
    vgg_apply = lambda im: model.apply(params, im)

    synth = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    label = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    mask = jnp.ones((1, 32, 32, 1))
    vgg_label = vgg_apply(label)
    a_p = 0.01
    got = float(rec_loss(mask, synth, label, vgg_label, a_p, vgg_apply))
    want = float(jnp.mean(jnp.abs(synth - label))) + a_p * float(
        perceptual_loss(vgg_apply(synth), vgg_label)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_vgg19_torch_weight_roundtrip(rng):
    """Random torch-layout weights -> converter -> same features as torch conv stack."""
    import torch.nn as nn

    # build torchvision-vgg19-features-equivalent conv/pool stack (config E)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M"]
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = v
    tnet = nn.Sequential(*layers)
    sd = {f"features.{i}.{p}": t.detach().numpy() for i, m in enumerate(tnet)
          if isinstance(m, nn.Conv2d) for p, t in m.named_parameters()}

    params = convert_torch_vgg19(sd)
    model = Vgg19Features()
    x = rng.standard_normal((1, 3, 32, 48)).astype(np.float32) * 0.3
    with torch.no_grad():
        t = torch.from_numpy(x)
        feats_t = []
        for m in tnet:
            t = m(t)
            if isinstance(m, nn.MaxPool2d):
                feats_t.append(t.numpy())
    feats_j = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(feats_j) == 3
    for ft, fj in zip(feats_t, feats_j):
        np.testing.assert_allclose(
            np.asarray(fj).transpose(0, 3, 1, 2), ft, rtol=1e-4, atol=1e-4
        )


def test_real_epe_matches_reference(rng):
    pred = rng.random((1, 8, 16, 1)).astype(np.float32) * 50
    target = rng.random((1, 17, 33, 1)).astype(np.float32) * 50
    target[0, :5, :7, 0] = 0  # sparse holes
    up = F.interpolate(
        torch.from_numpy(pred.transpose(0, 3, 1, 2)),
        size=(17, 33),
        mode="bilinear",
        align_corners=True,
    )
    t = torch.from_numpy(target.transpose(0, 3, 1, 2))
    epe_map = torch.norm(t - up, p=2, dim=1)
    mask = t[:, 0] == 0
    want = float(epe_map[~mask].mean())
    got = float(real_epe(jnp.asarray(pred), jnp.asarray(target), sparse=True))
    np.testing.assert_allclose(got, want, rtol=1e-5)
