"""Resize parity vs torch.nn.functional.interpolate."""

import numpy as np
import pytest
import jax.numpy as jnp

from fal_net_tpu.ops import resize_nearest_torch, resize_bilinear_align_corners

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((6, 10), (12, 20)), ((5, 7), (9, 13)), ((94, 160), (188, 320)), ((10, 10), (7, 3))],
)
def test_nearest_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, 3) + in_hw).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=out_hw, mode="nearest").numpy()
    got = np.asarray(
        resize_nearest_torch(jnp.asarray(x.transpose(0, 2, 3, 1)), out_hw)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("in_hw,out_hw", [((6, 10), (13, 21)), ((128, 256), (375, 1242)), ((9, 9), (5, 4))])
def test_bilinear_matches_torch(rng, align, in_hw, out_hw):
    x = rng.standard_normal((1, 2) + in_hw).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=align
    ).numpy()
    got = np.asarray(
        resize_bilinear_align_corners(
            jnp.asarray(x.transpose(0, 2, 3, 1)), out_hw, align_corners=align
        )
    ).transpose(0, 3, 1, 2)
    # fp32 product/accumulation ordering differs from torch; 1e-4 abs is the
    # right scale for unit-variance data.
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
