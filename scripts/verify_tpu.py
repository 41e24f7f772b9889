"""On-TPU verification: fused Pallas MED kernel vs the jnp reference path.

The CI suite runs the kernel only in interpret mode on CPU; this script
checks the REAL Mosaic-compiled kernel's numerics and speed on the current
TPU.  Run whenever the kernel or its wrapper changes:

    python scripts/verify_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from fal_net_tpu.ops.med import med_outputs
from fal_net_tpu.ops.med_pallas import med_outputs_fused


def chained_ms(fn, logits, image, iters=8):
    @jax.jit
    def chained(lg):
        def body(_, carry):
            lg, acc = carry
            o = fn(lg, image)
            acc = acc + jnp.sum(o.pan) + jnp.sum(o.disp)
            return lg + 1e-12 * acc, acc

        return jax.lax.fori_loop(0, iters, body, (lg, jnp.float32(0)))[1]

    float(chained(logits))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(chained(logits))
        best = min(best, time.time() - t0)
    return best / iters * 1000


def main() -> int:
    print("devices:", jax.devices())
    b, h, w, n = 1, 384, 1280, 49
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((b, h, w, n)).astype(np.float32))
    image = jnp.asarray(rng.standard_normal((b, h, w, 3)).astype(np.float32))
    kw = dict(ret_disp=True, ret_pan=True, ret_subocc=True)

    ref = jax.jit(lambda lg, im: med_outputs(lg, im, 2.0, 300.0, **kw))(logits, image)
    fus = jax.jit(lambda lg, im: med_outputs_fused(lg, im, 2.0, 300.0, **kw))(logits, image)

    ok = True
    for name, tol in [("disp", 2e-3), ("pan", 5e-3), ("maskL", 2e-3), ("maskR", 2e-3)]:
        d = float(np.abs(np.asarray(getattr(fus, name)) - np.asarray(getattr(ref, name))).max())
        status = "OK " if d < tol else "FAIL"
        ok &= d < tol
        print(f"  {status} {name:6s} maxdiff {d:.2e} (tol {tol:.0e})")

    # grad check on a smaller shape
    lg_s, im_s = logits[:, :64, :256], image[:, :64, :256]

    def loss(medfn, lg):
        o = medfn(lg, im_s, 2.0, 300.0, ret_disp=True, ret_pan=True)
        return jnp.sum(jnp.sin(o.pan)) + jnp.sum(jnp.cos(o.disp / 300.0))

    g_ref = jax.jit(jax.grad(lambda lg: loss(med_outputs, lg)))(lg_s)
    g_fus = jax.jit(jax.grad(lambda lg: loss(med_outputs_fused, lg)))(lg_s)
    gd = float(np.abs(np.asarray(g_fus) - np.asarray(g_ref)).max())
    print(f"  {'OK ' if gd < 5e-3 else 'FAIL'} grad   maxdiff {gd:.2e} (tol 5e-3)")
    ok &= gd < 5e-3

    # shard_map + compiled-Mosaic integration on REAL hardware.  The
    # multi-device dryrun can only run this composition in interpret mode
    # (no Mosaic on the CPU mesh — DESIGN.md "known validation boundary");
    # a 1-device ('data','spatial') mesh on the chip proves the
    # shard_map-wrapped pallas_call (and its custom VJP) compiles and
    # executes through the real Mosaic pipeline.  1 shard ≡ unsharded, so
    # outputs must match the direct fused call to fp32 roundoff.
    from jax.sharding import Mesh
    from fal_net_tpu.ops.med_pallas import med_outputs_fused_dp

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "spatial"))
    shd = jax.jit(
        lambda lg, im: med_outputs_fused_dp(
            lg, im, 2.0, 300.0, mesh=mesh, spatial_axis="spatial", **kw
        )
    )(logits, image)
    for name in ("disp", "pan", "maskL", "maskR"):
        d = float(
            np.abs(np.asarray(getattr(shd, name)) - np.asarray(getattr(fus, name))).max()
        )
        status = "OK " if d < 1e-5 else "FAIL"
        ok &= d < 1e-5
        print(f"  {status} shard_map {name:6s} maxdiff vs fused {d:.2e} (tol 1e-5)")

    def med_sharded(lg, im, mn, mx, **k):
        return med_outputs_fused_dp(lg, im, mn, mx, mesh=mesh, **k)

    g_shd = jax.jit(jax.grad(lambda lg: loss(med_sharded, lg)))(lg_s)
    gsd = float(np.abs(np.asarray(g_shd) - np.asarray(g_fus)).max())
    print(f"  {'OK ' if gsd < 1e-5 else 'FAIL'} shard_map grad maxdiff vs fused {gsd:.2e} (tol 1e-5)")
    ok &= gsd < 1e-5

    ms_ref = chained_ms(lambda lg, im: med_outputs(lg, im, 2.0, 300.0, **kw), logits, image)
    ms_fus = chained_ms(lambda lg, im: med_outputs_fused(lg, im, 2.0, 300.0, **kw), logits, image)
    print(f"  jnp path   {ms_ref:6.2f} ms")
    print(f"  fused path {ms_fus:6.2f} ms  ({ms_ref / ms_fus:.2f}x)")

    print("VERIFY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
