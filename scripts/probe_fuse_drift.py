"""Quantify the fuse-flag disparity drift at random init (CPU, control'd).

probe_stem_fuse.py measured px-scale disp maxdiffs for the reassociation-
only rewrites at 384x1280 random init (flow_analytic 1.9e1 px max).  The
parity tests pin exactness at small shapes to ~1e-5, so the large-shape
drift should be softmax near-tie amplification: at random init adjacent
logits tie, and a ~1e-6 relative reassociation difference flips weight
between disparity planes up to ~30 px apart.

Control: perturb the BASELINE input by 1 ulp-scale noise (1e-6 relative)
and measure the baseline-vs-baseline disp diff.  If the control diff is
the same order as the fuse diff, the drift is chaos at random init, not a
composition bug.  Also reports the diff distribution (median / p99 / max).

    python scripts/probe_fuse_drift.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from fal_net_tpu.models import create_model

H, W = 384, 1280


def stats(d):
    d = np.abs(np.asarray(d)).ravel()
    return (
        f"median {np.median(d):.2e}  p99 {np.percentile(d, 99):.2e}  "
        f"max {d.max():.2e} px"
    )


def main() -> int:
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32) * 0.3)

    # flags default ON since round 5 — pin the unfused baseline explicitly
    ref = create_model("B", fuse_logits=False, stem_flow_analytic=False,
                       stem_input_fuse=False)
    variables = ref.init(jax.random.PRNGKey(0), x, 2.0, 300.0)
    fwd = jax.jit(lambda m, v, x: m.apply(v, x, 2.0, 300.0).disp,
                  static_argnums=0)
    d_ref = fwd(ref, variables, x)

    # control: 1e-6-relative input perturbation through the UNmodified model
    x_pert = x * (1.0 + 1e-6)
    d_pert = fwd(ref, variables, x_pert)
    print("control (baseline, input*1.000001):", stats(d_pert - d_ref))

    for name, kw in [
        ("fuse_logits", {"fuse_logits": True}),
        ("flow_analytic", {"stem_flow_analytic": True}),
        ("input_fuse", {"stem_input_fuse": True}),
        ("all_on", {"fuse_logits": True, "stem_flow_analytic": True,
                    "stem_input_fuse": True}),
    ]:
        d = fwd(create_model("B", **kw), variables, x)
        print(f"{name:14s} vs baseline:", stats(d - d_ref))
    return 0


if __name__ == "__main__":
    sys.exit(main())
