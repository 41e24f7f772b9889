"""Minimal on-chip repro for the pltpu.roll cross-tile miscompile.

probe_med_shapes.py found every fresh fused-MED compile broken when the
padded scratch row length wp is an odd multiple of 128 lanes (3x/5x/7x)
and correct at 4x/16x.  This strips the kernel to its core construct:
zero-padded (8, wp) scratch, data written at a static 128-aligned window,
pltpu.roll by a traced SMEM amount, static-slice read — exactly
ops/med_pallas.py::_shift_sample.  Sweeps wp tile counts and shift
amounts; prints which (wp, f) combos return wrong data.

    python scripts/probe_roll_bug.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)
H, W, L = 8, 128, 128  # window [L, L+W) like the MED kernel's pad

def make_fn(wp):
    def kernel(f_ref, x_ref, o_ref, scratch):
        scratch[...] = jnp.zeros(scratch.shape, scratch.dtype)
        scratch[:, L : L + W] = x_ref[...]
        r = pltpu.roll(scratch[...], -f_ref[0], axis=1)
        o_ref[...] = r[:, L : L + W]

    @jax.jit
    def run(f, x):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            scratch_shapes=[pltpu.VMEM((H, wp), jnp.float32)],
        )(f, x)
    return run

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32))
xn = np.asarray(x)

ok_all = True
for tiles in (3, 4, 5, 6, 8):
    wp = tiles * 128
    run = make_fn(wp)
    bad_fs = []
    for f in (0, 1, 5, 17, 127):
        got = np.asarray(run(jnp.asarray([f], jnp.int32), x))
        # expected: rows shifted left by f inside the zero-padded buffer
        buf = np.zeros((H, wp), np.float32); buf[:, L:L+W] = xn
        want = np.roll(buf, -f, axis=1)[:, L:L+W]
        d = np.abs(got - want).max()
        if d > 1e-6:
            bad_fs.append((f, float(d)))
    status = "ok  " if not bad_fs else f"FAIL {bad_fs}"
    ok_all &= not bad_fs
    print(f"wp={wp} ({tiles}x128): {status}", flush=True)
print("ROLL PROBE:", "PASS" if ok_all else "FAIL")
