"""Stage-loss assembly parity vs torch transcriptions of the reference
training scripts (Train_Stage1_K.py:227-259, Train_Stage1_Kslow.py:237-283,
Train_Stage2_K.py:246-331).

The model is replaced by a deterministic stub returning precomputed
(pan, disp, masks), so this pins down exactly the loss *assembly*: the
20%-column crops, occlusion-mask composition, per-image mirror
normalization, and two-view averaging.  Model outputs themselves are
covered by the golden model/ops tests.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from fal_net_tpu.ops.med import MedOutputs
from fal_net_tpu.train.stages import stage1_loss, stage1_slow_loss, stage2_loss

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def t_smooth(img, disp, gamma=2.0):
    """torch transcription of reference smoothness (see test_losses)."""
    B, C, H, W = img.shape
    m_rgb = torch.ones((B, C, 1, 1))
    for c, v in enumerate([0.411, 0.432, 0.45]):
        m_rgb[:, c] *= v
    x = img + m_rgb
    gray = (0.299 * x[:, 0] + 0.587 * x[:, 1] + 0.114 * x[:, 2]).unsqueeze(1)
    k = lambda m: torch.tensor(m, dtype=torch.float32).reshape(1, 1, 3, 3)
    conv = lambda a, m: F.conv2d(a, k(m), padding=1)
    dx_img = conv(gray, [[0, 0, 0], [-1, 2, -1], [0, 0, 0]])
    dy_img = conv(gray, [[0, -1, 0], [0, 2, 0], [0, -1, 0]])
    dx_d = conv(disp, [[0, 0, 0], [0, 1, -1], [0, 0, 0]])
    dy_d = conv(disp, [[0, -1, 0], [0, 1, 0], [0, 0, 0]])
    dx1_d = conv(disp, [[0, 0, 0], [-1, 1, 0], [0, 0, 0]])
    dy1_d = conv(disp, [[0, 0, 0], [0, 1, 0], [0, -1, 0]])
    return torch.mean(
        (dx_d.abs() + dx1_d.abs()) * torch.exp(-gamma * dx_img.abs())
        + (dy_d.abs() + dy1_d.abs()) * torch.exp(-gamma * dy_img.abs())
    )


class FakeModel:
    """model_apply stub keyed by the (flipped) input it receives."""

    def __init__(self, table):
        self.table = table  # list of (match_fn, MedOutputs)

    def __call__(self, params, x, mn, mx, **flags):
        for match, out in self.table:
            if x.shape[0] == match:
                return out
        raise AssertionError(f"unexpected input batch {x.shape}")


B, H, W = 2, 16, 32


@pytest.fixture
def data(rng):
    mk = lambda *s: rng.random(s).astype(np.float32)
    return {
        "left": mk(B, H, W, 3) - 0.4,
        "right": mk(B, H, W, 3) - 0.4,
        "rpan": mk(B, H, W, 3) - 0.4,
        "lpan_flipped": mk(B, H, W, 3) - 0.4,
        "ldisp": mk(B, H, W, 1) * 80 + 2,
        "rdisp_flipped": mk(B, H, W, 1) * 80 + 2,
        "lmask": mk(B, H, W, 1),
        "rmask_flipped": mk(B, H, W, 1),
        "rlmask": mk(B, H, W, 1),
        "lrmask_flipped": mk(B, H, W, 1),
        "mldisp_flipped": mk(B, H, W, 1) * 80 + 2,
        "mrdisp": mk(B, H, W, 1) * 80 + 2,
    }


def to_t(a_nhwc):
    return torch.from_numpy(np.asarray(a_nhwc).transpose(0, 3, 1, 2))


def test_stage1_assembly(data):
    out = MedOutputs(
        pan=jnp.asarray(data["rpan"]), disp=jnp.asarray(data["ldisp"]),
        maskL=None, maskR=None,
    )
    model = FakeModel([(B, out)])
    a_sm = 0.2 * 2 / 512
    loss, aux = stage1_loss(
        None,
        {"left": jnp.asarray(data["left"]), "right": jnp.asarray(data["right"])},
        model,
        min_disp=2.0, max_disp=300.0, a_p=0.0, a_sm=a_sm,
    )
    # torch transcription
    left, right = to_t(data["left"]), to_t(data["right"])
    rpan, ldisp = to_t(data["rpan"]), to_t(data["ldisp"])
    rec = torch.mean(torch.abs(rpan - right))
    x0 = int(0.20 * W)
    sm = t_smooth(left[:, :, :, x0:], ldisp[:, :, :, x0:])
    want = rec + a_sm * sm
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)


def test_stage1_slow_assembly(data):
    # stacked forward: first B rows -> right pan/ldisp; last B -> flipped outputs
    pan = jnp.concatenate(
        [jnp.asarray(data["rpan"]), jnp.asarray(data["lpan_flipped"])], 0
    )
    disp = jnp.concatenate(
        [jnp.asarray(data["ldisp"]), jnp.asarray(data["rdisp_flipped"])], 0
    )
    out = MedOutputs(pan=pan, disp=disp, maskL=None, maskR=None)
    model = FakeModel([(2 * B, out)])
    a_sm = 0.2 * 2 / 512
    loss, _ = stage1_slow_loss(
        None,
        {"left": jnp.asarray(data["left"]), "right": jnp.asarray(data["right"])},
        model,
        min_disp=2.0, max_disp=300.0, a_p=0.0, a_sm=a_sm,
    )
    left, right = to_t(data["left"]), to_t(data["right"])
    rpan, ldisp = to_t(data["rpan"]), to_t(data["ldisp"])
    lpan = torch.flip(to_t(data["lpan_flipped"]), dims=[3])
    rdisp = torch.flip(to_t(data["rdisp_flipped"]), dims=[3])
    rec = (torch.mean(torch.abs(rpan - right)) + torch.mean(torch.abs(lpan - left))) / 2
    x0, x1 = int(0.20 * W), int(0.80 * W)
    sm = (
        t_smooth(left[:, :, :, x0:], ldisp[:, :, :, x0:])
        + t_smooth(right[:, :, :, :x1], rdisp[:, :, :, :x1])
    ) / 2
    want = rec + a_sm * sm
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)


def test_stage2_assembly(data):
    # student stacked forward (2B): [left | flipped right]
    pan = jnp.concatenate([jnp.asarray(data["rpan"]), jnp.asarray(data["lpan_flipped"])], 0)
    disp = jnp.concatenate([jnp.asarray(data["ldisp"]), jnp.asarray(data["rdisp_flipped"])], 0)
    maskL = jnp.concatenate([jnp.asarray(data["lmask"]), jnp.asarray(data["rmask_flipped"])], 0)
    maskR = jnp.concatenate([jnp.asarray(data["rlmask"]), jnp.asarray(data["lrmask_flipped"])], 0)
    student_out = MedOutputs(pan=pan, disp=disp, maskL=maskL, maskR=maskR)

    # teacher stacked forward (2B): [flipped left | right] -> disp only
    t_disp = jnp.concatenate(
        [jnp.asarray(data["mldisp_flipped"]), jnp.asarray(data["mrdisp"])], 0
    )
    teacher_out = MedOutputs(pan=None, disp=t_disp, maskL=None, maskR=None)

    student = FakeModel([(2 * B, student_out)])
    teacher = FakeModel([(2 * B, teacher_out)])

    a_sm = 0.4 * 2 / 512
    a_mr = 1.0
    loss, aux = stage2_loss(
        None,
        {"left": jnp.asarray(data["left"]), "right": jnp.asarray(data["right"])},
        student,
        teacher,
        None,
        min_disp=2.0, max_disp=300.0, a_p=0.0, a_sm=a_sm, a_mr=a_mr,
    )

    # ---- torch transcription of Train_Stage2_K.py:246-331 ----
    left, right = to_t(data["left"]), to_t(data["right"])
    flip = lambda t: torch.flip(t, dims=[3])
    rpan = to_t(data["rpan"])
    lpan = flip(to_t(data["lpan_flipped"]))
    ldisp = to_t(data["ldisp"])
    rdisp = flip(to_t(data["rdisp_flipped"]))
    lmask = to_t(data["lmask"])
    rmask = flip(to_t(data["rmask_flipped"]))
    rlmask = to_t(data["rlmask"])
    lrmask = flip(to_t(data["lrmask_flipped"]))
    mldisp = flip(to_t(data["mldisp_flipped"]))
    mrdisp = to_t(data["mrdisp"])

    x0, x1 = int(0.20 * W), int(0.80 * W)
    O_L = lmask * lrmask
    O_L[:, :, :, 0:x0] = 1
    O_R = rmask * rlmask
    O_R[:, :, :, x1:] = 1
    rec = (
        torch.mean(O_R * torch.abs(rpan - right))
        + torch.mean(O_L * torch.abs(lpan - left))
    ) / 2
    sm = (
        t_smooth(left[:, :, :, x0:], ldisp[:, :, :, x0:])
        + t_smooth(right[:, :, :, :x1], rdisp[:, :, :, :x1])
    ) / 2
    nmaxl = 1 / F.max_pool2d(mldisp, kernel_size=(H, W))
    nmaxr = 1 / F.max_pool2d(mrdisp, kernel_size=(H, W))
    mirror = (
        torch.mean(nmaxl * (1 - O_L)[:, :, :, x0:] * torch.abs(ldisp - mldisp)[:, :, :, x0:])
        + torch.mean(nmaxr * (1 - O_R)[:, :, :, :x1] * torch.abs(rdisp - mrdisp)[:, :, :, :x1])
    ) / 2
    want = rec + a_sm * sm + a_mr * mirror
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)
    assert float(aux["mirror_loss"]) > 0
