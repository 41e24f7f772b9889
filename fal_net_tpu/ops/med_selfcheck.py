"""Runtime correctness gate for the compiled fused MED kernel.

Why this exists: the fused Pallas head (:mod:`fal_net_tpu.ops.med_pallas`)
is validated in interpret mode by CI and on real hardware by
``scripts/verify_tpu.py`` at the production shapes — but Mosaic compiles a
fresh binary per (W, N, bounds, grid) combination, and a server-side
compile of a NEW combination can silently miscompile while every tested
shape stays green.  Round 5 hit exactly that: at (w=128, N=33,
bounds 2..18) — the FAL_netA/C synthetic-training shape — the compiled
kernel returned an all-zero ``pan``/``maskR`` (every shifted read landed
in the scratch zero margin) while interpret mode, the jnp oracle, and all
previously-compiled shapes were exact.  Stage-1 training then "ran" with
a black synthesized view and plateaued with no error anywhere.

The reference has no analog (a CUDA ``grid_sample`` chain has no
per-shape codegen step to distrust; SURVEY §5 lists no failure detection
at all) — this is TPU-native defensive machinery for a TPU-native risk.

:func:`fused_med_selfcheck` compares the fused kernel against the jnp
oracle on one random batch at the EXACT shape a run will use, sharing the
logits tensor between both paths so any disagreement is pure kernel
arithmetic (feeding each path its own full-model forward instead would
mix in softmax near-tie amplification of MXU single-pass-bf16 conv noise
— see DESIGN.md §Stem/logits fusion).  Three gates use it, covering every
entry point that can select the fused kernel at a fresh shape:

* ``Trainer.setup`` — the training crop (student + teacher level counts);
  falls back to ``med_impl='reference'`` with a loud warning.
* ``Trainer._val_forward_for`` — each validation bucket shape (validation
  frames are full-size, not the training crop); that run validates
  through the jnp path on disagreement.
* ``Evaluator._med_guard`` — each eval bucket shape on the ``save_pan``
  path (the only eval path that requests pan/masks; plain disparity eval
  never selects the fused kernel, and serving artifacts bake the portable
  jnp path at export).

A failed check costs the fused head's speedup instead of a silently
wrong run.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_med_selfcheck"]

# Catastrophic-failure detector, not a numerics test: legitimate
# compiled-vs-oracle drift at shared logits measures ~5e-4 (disp) to
# ~2e-3 (pan) on-chip (scripts/verify_variants_tpu.py N=33 numerics);
# the miscompile signature is O(1) (pan off by the full image range).
_TOL = 1e-2


def fused_med_selfcheck(
    width: int,
    num_levels: int,
    min_disp: float,
    max_disp: float,
    *,
    height: int = 64,
    batch: int = 1,
    interpret: bool = False,
    seed: int = 0,
) -> Tuple[bool, float]:
    """Compare the fused MED kernel against the jnp oracle at one shape.

    Returns ``(ok, maxdiff)`` where ``maxdiff`` is the largest
    absolute disagreement over disp/pan/maskL/maskR.  On backends where
    the fused kernel would not be selected anyway (no Mosaic compiler:
    anything but ``tpu``/``axon``) the check is vacuous and returns
    ``(True, 0.0)`` without dispatching — unless ``interpret=True``,
    which forces the interpret-mode kernel (used by CPU tests).
    """
    from fal_net_tpu.models.falnet import _fused_med_available
    from fal_net_tpu.ops.med import med_outputs
    from fal_net_tpu.ops.med_pallas import med_outputs_fused

    if not interpret and not _fused_med_available():
        return True, 0.0

    rng = np.random.default_rng(seed)
    logits = jnp.asarray(
        rng.standard_normal((batch, height, width, num_levels)).astype(np.float32)
    )
    image = jnp.asarray(
        rng.standard_normal((batch, height, width, 3)).astype(np.float32)
    )
    kw = dict(ret_disp=True, ret_pan=True, ret_subocc=True)
    want = jax.jit(
        lambda lg, im: med_outputs(lg, im, min_disp, max_disp, **kw)
    )(logits, image)
    got = jax.jit(
        lambda lg, im: med_outputs_fused(
            lg, im, min_disp, max_disp, interpret=interpret, **kw
        )
    )(logits, image)
    maxdiff = 0.0
    for name in ("disp", "pan", "maskL", "maskR"):
        a = np.asarray(getattr(got, name))
        r = np.asarray(getattr(want, name))
        d = float(np.abs(a - r).max()) if a.size else 0.0
        if not np.isfinite(d):
            d = float("inf")
        maxdiff = max(maxdiff, d)
    return maxdiff < _TOL, maxdiff
