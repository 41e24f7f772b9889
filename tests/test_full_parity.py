"""Full-model pan/mask parity: our model vs (reference backbone on CPU +
torch MED transcription).

The reference's own pan path can't run on CPU (hard-coded .cuda(),
FAL_netB.py:231), so this composes the pieces that CAN: the actual
reference BackBone + 1x1 conv produce `dlog0`, which feeds the
grid_sample-loop transcription validated in test_med.py.  Against that we
run OUR full model with the ported weights — covering backbone, weight
port, and MED head as one integrated path for every output.
"""

import sys

import numpy as np
import pytest
import jax.numpy as jnp

from fal_net_tpu.models import create_model
from fal_net_tpu.models.torch_import import convert_state_dict
from tests.test_med import torch_med_reference

pytestmark = pytest.mark.torch_parity

torch = pytest.importorskip("torch")


def test_full_model_all_outputs_parity(rng):
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models.FAL_netB import FAL_netB

    num_levels = 7
    ref = FAL_netB(None, no_levels=num_levels).eval()

    x = rng.standard_normal((1, 3, 64, 96)).astype(np.float32) * 0.3
    min_disp, max_disp = 2.0, 60.0

    with torch.no_grad():
        xt = torch.from_numpy(x)
        flow = torch.full((1, 1, 64, 96), max_disp / 100.0)
        dlog = ref.backbone(xt, flow)
        dlog0 = ref.conv0(dlog)
    want_disp, want_pan, want_ml, want_mr = torch_med_reference(
        dlog0.numpy(), x, min_disp, max_disp
    )

    params = {"params": convert_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )}
    model = create_model("B", num_levels)
    out = model.apply(
        params,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        min_disp,
        max_disp,
        ret_disp=True,
        ret_pan=True,
        ret_subocc=True,
    )
    to_nchw = lambda a: np.asarray(a).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(to_nchw(out.disp), want_disp, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(to_nchw(out.pan), want_pan, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(to_nchw(out.maskL), want_ml, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(to_nchw(out.maskR), want_mr, rtol=5e-3, atol=5e-3)
