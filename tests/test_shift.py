"""Shift-op parity vs torch.nn.functional.grid_sample (the reference sampler).

The model-internal warps in the reference are horizontal translations done
with affine_grid + grid_sample(align_corners=True, padding_mode='zeros')
(models/FAL_netB.py:231-282).  Our `hshift` must match bit-for-bit-ish
(fp32 tolerance) including the (W-1)/W pixel-shift factor and the
zero-padding boundary blend.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from fal_net_tpu.ops import hshift, hshift_planes, hflip

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_hshift(x_nchw: np.ndarray, x_of: float, align_corners=True) -> np.ndarray:
    """Reference-style horizontal warp via affine_grid + grid_sample."""
    t = torch.from_numpy(x_nchw)
    b, c, h, w = t.shape
    theta = torch.zeros(b, 2, 3)
    theta[:, 0, 0] = 1
    theta[:, 1, 1] = 1
    grid = F.affine_grid(theta, [b, c, h, w], align_corners=align_corners)
    grid = grid.clone()
    grid[:, :, :, 0] = grid[:, :, :, 0] + x_of
    out = F.grid_sample(t, grid, align_corners=align_corners)
    return out.numpy()


@pytest.mark.parametrize("disp_px", [0.0, 1.0, 2.7, 37.51, -5.25, 300.0, 640.0])
def test_hshift_matches_grid_sample(rng, disp_px):
    b, c, h, w = 2, 3, 8, 64
    x = rng.standard_normal((b, c, h, w)).astype(np.float32)
    x_of = 2.0 * disp_px / w
    want = torch_hshift(x, x_of)
    # our convention: pixel shift = d * (W-1)/W under align_corners=True
    got = np.asarray(hshift(jnp.asarray(x), disp_px * (w - 1) / w, axis=-1))
    # torch round-trips pixel->normalized->pixel coordinates in fp32, which
    # perturbs the interpolation weight by ~1e-5; match at that scale.
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def test_hshift_planes_matches_per_plane_loop(rng):
    b, h, w, n = 2, 6, 48, 7
    x = rng.standard_normal((b, h, w, n)).astype(np.float32)
    shifts = np.linspace(-3.3, 17.9, n).astype(np.float32)
    got = np.asarray(hshift_planes(jnp.asarray(x), jnp.asarray(shifts), axis=-2))
    for i in range(n):
        want_i = np.asarray(hshift(jnp.asarray(x[..., i]), float(shifts[i]), axis=-1))
        np.testing.assert_allclose(got[..., i], want_i, rtol=1e-5, atol=1e-6)


def test_hshift_planes_image_axis(rng):
    """Shifting (B,H,W,C,N) along W (-3) matches the grid_sample loop."""
    b, h, w, c, n = 1, 4, 32, 3, 5
    img = rng.standard_normal((b, h, w, c)).astype(np.float32)
    disps = np.linspace(1.0, 12.0, n).astype(np.float32)
    planes = np.broadcast_to(img[..., None], img.shape + (n,))
    shifts = disps * (w - 1) / w
    got = np.asarray(hshift_planes(jnp.asarray(planes), jnp.asarray(shifts), axis=-3))
    x_nchw = img.transpose(0, 3, 1, 2)
    for i in range(n):
        want = torch_hshift(x_nchw, 2.0 * disps[i] / w).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got[..., i], want, rtol=1e-5, atol=1e-5)


def test_hflip_is_exact_mirror(rng):
    x = rng.standard_normal((1, 3, 5, 16)).astype(np.float32)
    # torch flip-grid with either align_corners lands exactly on W-1-x
    t = torch.from_numpy(x)
    theta = torch.zeros(1, 2, 3)
    theta[:, 0, 0] = 1
    theta[:, 1, 1] = 1
    for ac in (True, False):
        grid = F.affine_grid(theta, [1, 3, 5, 16], align_corners=ac)
        grid = grid.clone()
        grid[:, :, :, 0] = -grid[:, :, :, 0]
        want = F.grid_sample(t, grid, align_corners=ac).numpy()
        got = np.asarray(hflip(jnp.asarray(x), axis=-1))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_hshift_traced_shift_jits(rng):
    import jax

    x = jnp.asarray(rng.standard_normal((2, 4, 32, 3)).astype(np.float32))

    @jax.jit
    def f(x, s):
        return hshift(x, s, axis=-2)

    out = f(x, jnp.float32(3.5))
    ref = hshift(x, 3.5, axis=-2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("n,h,w,mn,mx", [
    (5, 6, 33, 1.0, 12.0),
    (9, 8, 96, 2.0, 30.0),
    (7, 4, 127, 0.5, 64.0),
    (3, 16, 256, 2.0, 300.0),
])
def test_hshift_planes_quirk_matches_grid_sample(rng, n, h, w, mn, mx):
    """Property sweep of the FAL_netA maskR quirk sampler (ac=False
    grid_sample of an ac=True grid, models/FAL_netA.py:264) across plane
    counts / odd widths / disparity ranges, vs the torch transcription."""
    from fal_net_tpu.ops.shift import hshift_planes_quirk

    x = rng.standard_normal((1, n, h, w)).astype(np.float32)  # NCHW planes
    levels = mx * np.exp(
        np.log(mx / mn) * (np.arange(n) / (n - 1) - 1.0)
    ).astype(np.float64)

    t = torch.from_numpy(x)
    theta = torch.zeros(1, 2, 3)
    theta[:, 0, 0] = 1
    theta[:, 1, 1] = 1
    i_grid = F.affine_grid(theta, [1, n, h, w], align_corners=True)
    want = np.empty_like(x)
    for k in range(n):
        g = i_grid.clone()
        g[:, :, :, 0] = g[:, :, :, 0] + 2.0 * levels[k] / w
        want[:, k] = F.grid_sample(t[:, k:k+1], g).numpy()[:, 0]

    got = np.asarray(
        hshift_planes_quirk(
            jnp.asarray(x.transpose(0, 2, 3, 1)),  # (1, H, W, N)
            jnp.asarray(levels, jnp.float32),
            axis=-2,
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
