"""Deployment self-check: validate an install on the current accelerator.

    python -m fal_net_tpu.cli.selfcheck [--full] [--timeout 900]

The reference has no analog (its only install check is "the script ran",
SURVEY §4); on a fleet, a one-command health gate before scheduling real
work is table stakes.  Checks, in order:

1. backend report — platform, device kind/count, default backend;
2. model forward — FAL_netB-family forward at a reduced shape: outputs
   finite, disparities inside [min_disp, max_disp], masks in [0, 1];
3. fused-kernel numerics — the Pallas MED kernel against the vectorized
   jnp oracle (the CI suite only covers interpret mode on CPU; this runs
   whatever the current backend compiles, i.e. real Mosaic on TPU);
4. gradient step — one jitted train step on synthetic stereo: loss
   finite and the parameters actually move;
5. (--full) flagship-shape throughput — chained-iteration timing of the
   384x1280 batch-8 forward, reported for eyeballing against
   BENCH/README numbers.

Each phase runs under a watchdog thread (a dead remote backend parks
blocking calls inside C where no signal fires) so a hung device yields a
clear per-phase TIMEOUT instead of a silent hang.  Exit code 0 iff every
executed phase passes.
"""

from __future__ import annotations

import argparse
import time
from typing import Callable


def _bounded(fn: Callable[[], object], budget_s: float):
    """Run fn under the shared hang watchdog; (ok, value_or_error, s)."""
    from fal_net_tpu.utils.faults import run_bounded

    return run_bounded(fn, budget_s)


def _check_backend():
    import jax

    devs = jax.devices()
    return f"{len(devs)} x {devs[0].device_kind} ({devs[0].platform})"


def _check_forward():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fal_net_tpu.models import create_model

    model = create_model("B", 49)
    h, w = 192, 640
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32) * 0.3)
    variables = model.init(jax.random.PRNGKey(0), left, 2.0, 300.0, ret_disp=True)
    out = model.apply(
        variables, left, 2.0, 300.0, ret_disp=True, ret_pan=True, ret_subocc=True
    )
    disp = np.asarray(out.disp)
    assert np.isfinite(disp).all(), "disparities not finite"
    assert disp.min() >= 2.0 - 1e-3 and disp.max() <= 300.0 + 1e-2, (
        f"disp out of [min_disp, max_disp]: [{disp.min()}, {disp.max()}]"
    )
    for name in ("maskL", "maskR"):
        m = np.asarray(getattr(out, name))
        assert np.isfinite(m).all() and m.min() >= -1e-5 and m.max() <= 1 + 1e-5, (
            f"{name} outside [0, 1]"
        )
    pan = np.asarray(out.pan)
    assert np.isfinite(pan).all(), "pan not finite"
    return f"disp range [{disp.min():.2f}, {disp.max():.2f}] px"


def _check_kernel():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fal_net_tpu.models.falnet import _fused_med_available
    from fal_net_tpu.ops.med import med_outputs
    from fal_net_tpu.ops.med_pallas import med_outputs_fused

    # real Mosaic compile on TPU-family backends; interpret mode elsewhere
    # (same policy as the model's med_impl='auto' head selection)
    interp = not _fused_med_available()
    b, h, w, n = 1, 96, 256, 49
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((b, h, w, n)).astype(np.float32))
    image = jnp.asarray(rng.standard_normal((b, h, w, 3)).astype(np.float32))
    kw = dict(ret_disp=True, ret_pan=True, ret_subocc=True)
    ref = jax.jit(lambda lg, im: med_outputs(lg, im, 2.0, 300.0, **kw))(logits, image)
    fus = jax.jit(
        lambda lg, im: med_outputs_fused(lg, im, 2.0, 300.0, interpret=interp, **kw)
    )(logits, image)
    worst = ("", 0.0)
    for name, tol in [("disp", 2e-3), ("pan", 5e-3), ("maskL", 2e-3), ("maskR", 2e-3)]:
        d = float(
            np.abs(np.asarray(getattr(fus, name)) - np.asarray(getattr(ref, name))).max()
        )
        if d >= tol:
            raise AssertionError(f"fused-kernel {name} maxdiff {d:.2e} >= tol {tol:.0e}")
        if d > worst[1]:
            worst = (name, d)
    mode = "interpret" if interp else "compiled"
    return f"fused ({mode}) vs oracle worst {worst[0]} maxdiff {worst[1]:.1e}"


def _check_train_step():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fal_net_tpu.parallel.mesh import make_mesh
    from fal_net_tpu.train import Stage1Config, Trainer

    class SyntheticStereo:
        def __init__(self, n=8, h=64, w=128, disp=4):
            self.n, self.h, self.w, self.disp = n, h, w, disp

        def __len__(self):
            return self.n

        def get(self, index, rng):
            r = np.random.default_rng(index)
            left = r.random((self.h, self.w + self.disp, 3)).astype(np.float32)
            right = left[:, self.disp:, :]
            return {
                "left": left[:, : self.w] - 0.5,
                "right": right - 0.5,
                "max_disp": np.float32(30.0),
                "name": f"selfcheck_{index}",
            }

    cfg = Stage1Config(
        model="tiny", num_levels=5, crop_size=(64, 128), batch_size=4,
        workers=1, epochs=1, epoch_size=2, max_disp=30.0, min_disp=2.0,
        a_p=0.0, print_freq=1000,
    )
    tr = Trainer(cfg, stage="stage1", mesh=make_mesh(1),
                 train_dataset=SyntheticStereo())
    tr.setup()
    before = jax.tree.leaves(tr.state.params)[0]
    before = np.asarray(before).copy()
    metrics = tr.train_epoch(0)
    after = np.asarray(jax.tree.leaves(tr.state.params)[0])
    assert np.isfinite(metrics["loss"]), "train loss not finite"
    assert not np.allclose(before, after), "parameters did not update"
    return f"loss {metrics['loss']:.4f}, params updated"


def _check_throughput():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fal_net_tpu.models import create_model

    model = create_model("B", 49)
    batch, h, w = 8, 384, 1280
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((batch, h, w, 3)).astype(np.float32) * 0.3)
    variables = model.init(jax.random.PRNGKey(0), left, 2.0, 300.0, ret_disp=True)
    iters = 10

    @jax.jit
    def chained(variables, left):
        def body(_, carry):
            x, acc = carry
            disp = model.apply(variables, x, 2.0, 300.0, ret_disp=True).disp
            acc = acc + jnp.sum(disp)
            return x + (1e-12 * acc) * jnp.ones_like(x), acc

        return jax.lax.fori_loop(0, iters, body, (left, jnp.float32(0)))[1]

    float(chained(variables, left))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(chained(variables, left))
        best = min(best, time.time() - t0)
    return f"{iters * batch / best:.1f} imgs/s (384x1280 fp32 b8)"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--full", action="store_true",
                   help="also run the flagship-shape throughput phase")
    p.add_argument("--timeout", type=float, default=900.0,
                   help="per-phase watchdog in seconds (first compiles on a "
                   "remote backend can take minutes)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    phases = [
        ("backend", _check_backend),
        ("forward", _check_forward),
        ("fused kernel", _check_kernel),
        ("train step", _check_train_step),
    ]
    if args.full:
        phases.append(("throughput", _check_throughput))

    failed = False
    for name, fn in phases:
        ok, value, dt = _bounded(fn, args.timeout)
        if ok:
            print(f"  OK   {name:12s} {value}  [{dt:.1f}s]")
        else:
            failed = True
            kind = "TIMEOUT" if isinstance(value, TimeoutError) else "FAIL"
            print(f"  {kind} {name:12s} {value!r}  [{dt:.1f}s]")
            if isinstance(value, TimeoutError):
                # everything downstream shares the hung device; stop here
                print("  (backend unresponsive — skipping remaining phases)")
                break
    print("SELFCHECK:", "FAIL" if failed else "PASS")
    raise SystemExit(1 if failed else 0)


if __name__ == "__main__":
    main()
