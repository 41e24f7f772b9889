"""Metric-suite parity vs the reference myUtils.py (imported directly — its
metric functions are pure numpy and CPU-safe)."""

import sys

import numpy as np
import pytest
import jax.numpy as jnp

from fal_net_tpu.eval import (
    compute_kitti_errors,
    compute_make_errors,
    disps_to_depths_kitti,
    disps_to_depths_kitti2015,
    disps_to_depths_make,
)
from fal_net_tpu.eval.postprocess import ms_post_process, flip_post_process

pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_utils():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import myUtils

    return myUtils


def test_compute_kitti_errors_parity(rng, ref_utils):
    gt = rng.random((100, 200)).astype(np.float64) * 90
    gt[rng.random((100, 200)) < 0.7] = 0  # sparse
    pred = rng.random((100, 200)).astype(np.float64) * 90 + 0.5
    want = ref_utils.compute_kitti_errors(gt.copy(), pred.copy())
    got = compute_kitti_errors(gt.copy(), pred.copy())
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_compute_kitti_errors_median_parity(rng, ref_utils):
    """use_median: metrics AND the tracked scale factor match the
    reference's running-global tracking (myUtils.py:193-207)."""
    ref_utils.sum_cnt = 0
    ref_utils.sum_scale = 0
    scales = []
    for seed in range(3):
        r = np.random.default_rng(seed)
        gt = r.random((60, 80)) * 90
        gt[r.random((60, 80)) < 0.6] = 0
        pred = r.random((60, 80)) * 40 + 0.5
        want = ref_utils.compute_kitti_errors(
            gt.copy(), pred.copy(), use_median=True
        )
        got = compute_kitti_errors(
            gt.copy(), pred.copy(), use_median=True, scale_out=scales
        )
        np.testing.assert_allclose(got, want, rtol=1e-9)
    assert len(scales) == ref_utils.sum_cnt == 3
    np.testing.assert_allclose(
        np.mean(scales), ref_utils.sum_scale / ref_utils.sum_cnt, rtol=1e-12
    )


def test_disps_to_depths_kitti_parity(rng, ref_utils):
    h, w = 375, 1242
    gt = rng.random((1, h, w)) * 80
    pred = rng.random((1, h, w)) * 100 + 1
    want_gt, want_pred = ref_utils.disps_to_depths_kitti(gt.copy(), pred.copy())
    got_gt, got_pred = disps_to_depths_kitti(gt.copy(), pred.copy())
    np.testing.assert_allclose(got_gt[0], want_gt[0], rtol=1e-9)
    np.testing.assert_allclose(got_pred[0], want_pred[0], rtol=1e-9)


def test_disps_to_depths_kitti2015_parity(rng, ref_utils):
    h, w = 375, 1242
    gt = rng.random((1, h, w)) * 120
    gt[0, :50] = 0
    pred = rng.random((1, h, w)) * 120 + 1
    want_gt, want_pred = ref_utils.disps_to_depths_kitti2015(gt.copy(), pred.copy())
    got_gt, got_pred = disps_to_depths_kitti2015(gt.copy(), pred.copy())
    np.testing.assert_allclose(got_gt[0], want_gt[0], rtol=1e-9)
    np.testing.assert_allclose(got_pred[0], want_pred[0], rtol=1e-9)


def test_make3d_parity(rng, ref_utils):
    gt = rng.random((1, 100, 150)) * 80
    pred = rng.random((1, 100, 150)) * 100 + 1
    want_gt, want_pred = ref_utils.disps_to_depths_make(gt.copy(), pred.copy())
    got_gt, got_pred = disps_to_depths_make(gt.copy(), pred.copy())
    np.testing.assert_allclose(got_gt[0], want_gt[0], rtol=1e-9)
    np.testing.assert_allclose(got_pred[0], want_pred[0], rtol=1e-9)
    want = ref_utils.compute_make_errors(want_gt[0], want_pred[0])
    got = compute_make_errors(got_gt[0], got_pred[0])
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_flip_post_process(rng):
    """flip-pp: identity disp_fn on a symmetric field leaves disp unchanged."""
    disp = jnp.asarray(rng.random((1, 8, 16, 1)).astype(np.float32) * 50)
    image = jnp.asarray(rng.random((1, 8, 16, 3)).astype(np.float32))
    out = flip_post_process(image, lambda im: disp, disp)
    want = (np.asarray(disp) + np.asarray(disp)[:, :, ::-1]) / 2
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)


def test_ms_post_process_reference_semantics(rng):
    """ms-pp vs a torch transcription of Test_KITTI.py:287-300."""
    import torch
    import torch.nn.functional as F

    h, w = 24, 36
    image = rng.random((1, h, w, 3)).astype(np.float32)
    disp = (rng.random((1, h, w, 1)).astype(np.float32)) * 80

    # disp_fn: a deterministic toy function of the input (mean-pool channel)
    def disp_fn_j(im):
        return jnp.mean(im, axis=-1, keepdims=True) * 10 + 1.0

    got = np.asarray(
        ms_post_process(jnp.asarray(image), disp_fn_j, jnp.asarray(disp))
    )

    # torch transcription
    im_t = torch.from_numpy(image.transpose(0, 3, 1, 2))
    disp_t = torch.from_numpy(disp.transpose(0, 3, 1, 2))
    up_fac = 2 / 3
    flipped = torch.flip(im_t, dims=[3])
    upscaled = F.interpolate(flipped, scale_factor=up_fac, mode="bilinear", align_corners=True)
    dwn = upscaled.mean(dim=1, keepdim=True) * 10 + 1.0
    dwn = (1 / up_fac) * F.interpolate(dwn, size=(h, w), mode="nearest")
    dwn = torch.flip(dwn, dims=[3])
    norm = disp_t / (np.percentile(disp_t.numpy(), 95) + 1e-6)
    norm[norm > 1] = 1
    want = ((1 - norm) * disp_t + norm * dwn).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_image_rmse_np_matches_jnp(rng):
    """Host-side numpy twin == the jnp image_rmse (eval/metrics.py)."""
    import jax.numpy as jnp

    from fal_net_tpu.eval.metrics import image_rmse, image_rmse_np

    out = rng.standard_normal((8, 12, 3)).astype(np.float32) * 0.3
    lab = rng.standard_normal((8, 12, 3)).astype(np.float32) * 0.3
    want = float(image_rmse(jnp.asarray(out)[None], jnp.asarray(lab)[None]))
    np.testing.assert_allclose(image_rmse_np(out, lab), want, rtol=1e-5)


def test_real_epe_np_matches_jnp(rng):
    """Same-size sparse EPE: numpy twin == real_epe (losses/epe.py)."""
    import jax.numpy as jnp

    from fal_net_tpu.losses.epe import real_epe, real_epe_np

    pred = (rng.random((9, 14, 1)) * 20).astype(np.float32)
    target = (rng.random((9, 14, 1)) * 20).astype(np.float32)
    target[target < 8] = 0  # sparse GT
    want = float(
        real_epe(jnp.asarray(pred)[None], jnp.asarray(target)[None], sparse=True)
    )
    np.testing.assert_allclose(real_epe_np(pred, target), want, rtol=1e-5)
