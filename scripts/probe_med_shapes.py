"""On-chip fused-MED correctness sweep over (N, W, bounds) combos.

Round-5 regression hunt: the compiled kernel produced all-zero pan/maskR at
(w=128, N=33, bounds 2..18) — the variant-training shape — while
(w=128, N=9), (w=1280, N=33..49) and every interpret-mode case are exact.
This sweeps the neighborhood to find the real boundary.

    python scripts/probe_med_shapes.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
from fal_net_tpu.ops.med import med_outputs
from fal_net_tpu.ops.med_pallas import med_outputs_fused

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)

CASES = [
    # (b, h, w, n, min_d, max_d, subocc)
    (4, 64, 128, 33, 2.0, 18.0, True),   # the exact failing variant-leg shape
    (1, 8, 128, 33, 2.0, 18.0, True),    # minimal: grid (1,1)
    (1, 8, 128, 33, 2.0, 18.0, False),   # pan-only (the stage-1 config)
    (1, 64, 128, 33, 2.0, 18.0, True),   # grid (1,8)
    (4, 8, 128, 33, 2.0, 18.0, True),    # grid (4,1)
    (1, 8, 128, 9, 2.0, 18.0, True),     # B-tiny training shape (known good)
    (1, 8, 128, 32, 2.0, 18.0, True),
    (1, 8, 128, 34, 2.0, 18.0, True),
    (1, 8, 128, 49, 2.0, 18.0, True),
    (1, 8, 128, 33, 2.0, 300.0, True),   # bounds variation
    (1, 8, 256, 33, 2.0, 18.0, True),    # width variation
    (1, 8, 384, 33, 2.0, 18.0, True),
    (1, 8, 640, 49, 2.0, 300.0, True),   # the production TRAINING width —
    #   wp was 11x128 (odd-multiple, roll-broken) before _pad_row_len
    (1, 16, 1280, 49, 2.0, 300.0, True), # the eval/bench width (wp 2048
    #   = 16x128, program unchanged by the fix — must stay exact)
]

def run(b, h, w, n, mind, maxd, subocc):
    logits = jnp.asarray(rng.standard_normal((b, h, w, n)).astype(np.float32))
    image = jnp.asarray(rng.standard_normal((b, h, w, 3)).astype(np.float32))
    kw = dict(ret_disp=True, ret_pan=True, ret_subocc=subocc)
    want = jax.jit(lambda lg, im: med_outputs(lg, im, mind, maxd, **kw))(logits, image)
    got = jax.jit(lambda lg, im: med_outputs_fused(lg, im, mind, maxd, **kw))(logits, image)
    diffs = {}
    names = ("disp", "pan", "maskL", "maskR") if subocc else ("disp", "pan")
    for name in names:
        a = np.asarray(getattr(got, name)); r = np.asarray(getattr(want, name))
        diffs[name] = float(np.abs(a - r).max())
    pan = np.asarray(got.pan)
    bad = max(v for k, v in diffs.items() if k != "disp") > 1e-2
    print(f"{'FAIL' if bad else 'ok  '} b{b} h{h} w{w} n{n} [{mind},{maxd}]"
          f" subocc={int(subocc)}: "
          + "  ".join(f"{k} {v:.2e}" for k, v in diffs.items())
          + f"  pan[min {pan.min():.3f} max {pan.max():.3f}]", flush=True)
    return not bad

ok = True
for case in CASES:
    try:
        ok &= run(*case)
    except Exception as e:  # keep sweeping past one bad compile
        ok = False
        print(f"ERROR {case}: {type(e).__name__}: {str(e)[:200]}", flush=True)
print("MED SHAPE SWEEP:", "PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
