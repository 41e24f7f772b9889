"""Benchmark: FAL_netB (N=49) disparity inference at 384x1280 on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec, "unit": "imgs/sec", "vs_baseline": ratio}

Baseline: the reference PyTorch implementation on CPU (the only hardware the
reference can run in this environment), disp-only forward, measured in this
container on 2026-08-16: 4753 ms/img = 0.210 imgs/sec (single CPU core,
torch 2.13 fp32).  BASELINE.json's north-star asks >= 5x this.

Timing method: K forward passes are chained ON DEVICE inside one jit (each
iteration's input depends on the previous output, so nothing can be elided
or overlapped away), then one device->host sync.  A bare per-call sync
through this environment's TPU relay costs ~28 ms and would otherwise
dominate; chaining measures sustained single-image throughput, i.e. how a
pipelined serving loop actually runs.
"""

import json
import time

import numpy as np

TORCH_CPU_BASELINE_IMGS_PER_SEC = 0.210
# v5e peak: 197 TFLOP/s bf16 MXU (fp32 runs through the same MXU at roughly
# half rate; we report MFU against the bf16 peak so the number stays honest
# about hardware headroom, matching Test_KITTI.py:186-208's role of making
# inference cost visible).
V5E_PEAK_FLOPS = 197e12


def _model_flops(model, variables, left) -> float:
    """Forward FLOPs per batch from XLA's cost analysis (conv+matmul+ew)."""
    import jax

    try:
        lowered = jax.jit(
            lambda v, x: model.apply(v, x, 2.0, 300.0, ret_disp=True).disp
        ).lower(variables, left)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def _time_chained(model, variables, left, iters=10, repeats=3) -> float:
    """Best wall-clock for `iters` data-dependent forwards in one jit."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(variables, left):
        def body(_, carry):
            x, acc = carry
            disp = model.apply(variables, x, 2.0, 300.0, ret_disp=True).disp
            acc = acc + jnp.sum(disp)
            # serialize iterations with a data dependency
            x = x + (1e-12 * acc) * jnp.ones_like(x)
            return x, acc

        _, acc = jax.lax.fori_loop(0, iters, body, (left, jnp.float32(0)))
        return acc

    float(chained(variables, left))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(chained(variables, left))
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    import os

    import jax

    # Test hook: FALNET_BENCH_PLATFORM=cpu lets the suite smoke-test the
    # driver-facing JSON contract in a subprocess without a TPU (the
    # sitecustomize ignores JAX_PLATFORMS, so the config update is the only
    # way to force CPU).  Must run before the first backend touch.
    plat = os.environ.get("FALNET_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    import jax.numpy as jnp

    from fal_net_tpu.models import create_model

    # Tiny-config hooks for the same smoke test; production defaults when
    # unset (the driver runs bench.py with a clean env).
    variant = os.environ.get("FALNET_BENCH_MODEL", "B")
    levels = int(os.environ.get("FALNET_BENCH_LEVELS", "49"))
    h, w = (int(s) for s in
            os.environ.get("FALNET_BENCH_HW", "384x1280").split("x"))
    batch = int(os.environ.get("FALNET_BENCH_BATCH", "8"))
    iters = int(os.environ.get("FALNET_BENCH_ITERS", "10"))
    secondaries = os.environ.get("FALNET_BENCH_SECONDARIES", "1") != "0"

    model = create_model(variant, levels)
    rng = np.random.default_rng(0)
    left = jnp.asarray(
        rng.standard_normal((batch, h, w, 3)).astype(np.float32) * 0.3
    )
    variables = model.init(jax.random.PRNGKey(0), left, 2.0, 300.0, ret_disp=True)

    best = _time_chained(model, variables, left, iters=iters)
    value = iters * batch / best

    # Secondary: batch-1 serving latency (per-image ms, same chained-timing
    # method so the ~28 ms relay sync doesn't pollute it) and MFU.
    left1 = left[:1]
    best1 = _time_chained(model, variables, left1, iters=iters)
    latency_ms = best1 / iters * 1e3
    flops = _model_flops(model, variables, left)
    mfu = (flops / batch) * value / V5E_PEAK_FLOPS if flops else 0.0

    # Secondaries: the measured best-throughput serving configs per dtype.
    # Round-5 fused-stem sweep (runs/probe_fused_sweep_r05.log): the fused
    # stem removed the 4x-padded d2s transpose that OOMed bf16 at b56+, and
    # bf16 now scales to b128 (292.7 b48 / 364.0 b80 / 403.7 b96 / 469.5
    # b128; b160+ compiles failed server-side).  fp32 peaks at b24 (270.6).
    # The fp32 b8 headline stays for round-over-round comparability.
    # Each secondary is fault-isolated: a failed big-batch compile must not
    # take down the headline measurement.
    def _try_best(model_, batch_, dtype_name):
        try:
            xb = jnp.concatenate([left] * (batch_ // batch))
            best_ = _time_chained(model_, variables, xb, iters=iters)
            return round(iters * batch_ / best_, 3)
        except Exception as e:  # pragma: no cover - relay-dependent
            import sys

            print(f"{dtype_name} b{batch_} secondary failed: {e}",
                  file=sys.stderr)
            return None

    bf16_batch = 128
    fp32_batch = 24
    bf16_value = fp32_value = None
    if secondaries:
        bf16_value = _try_best(
            create_model(variant, levels, dtype=jnp.bfloat16),
            bf16_batch, "bf16",
        )
        fp32_value = _try_best(model, fp32_batch, "fp32")

    print(
        json.dumps(
            {
                "metric": (
                    "FAL_netB N=49 384x1280 disparity maps/sec, single chip "
                    f"(batch {batch}, fp32)"
                ),
                "value": round(value, 3),
                "unit": "imgs/sec",
                "vs_baseline": round(value / TORCH_CPU_BASELINE_IMGS_PER_SEC, 2),
                "batch1_latency_ms": round(latency_ms, 2),
                "bf16_best_imgs_per_sec": bf16_value,
                "bf16_best_batch": bf16_batch,
                "fp32_best_imgs_per_sec": fp32_value,
                "fp32_best_batch": fp32_batch,
                "mfu_vs_bf16_peak": round(mfu, 4),
                "fwd_tflops_per_img": round(flops / batch / 1e12, 3)
                if flops
                else None,
            }
        )
    )


def _attempt_in_subprocess() -> None:
    """One bench attempt as a KILLED-on-timeout subprocess
    (BENCH_ATTEMPT_TIMEOUT_S env, default 1500 s — cached compiles finish
    in well under that).  A hung relay (observed: an outage where even
    trivial dispatches stalled for hours) thereby becomes a
    DEADLINE_EXCEEDED the transient-retry wrapper below can act on.

    A subprocess — not a watchdog thread — because an abandoned thread
    stays parked in the blocked C call: if the relay later recovered, it
    would resume and run a second bench concurrently with the retry
    (double JSON output, mutually corrupted timings, parallel compiles).
    Killing the child guarantees at most one attempt is alive."""
    import os
    import subprocess
    import sys

    # 2100 s: the bf16 b128 secondary's cold compile alone can run several
    # minutes through the relay; cached compiles finish in well under this.
    budget = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT_S", "2100"))
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--once"],
            timeout=budget,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        raise TimeoutError(
            f"DEADLINE_EXCEEDED: bench attempt exceeded {budget:.0f}s "
            "(hung dispatch — relay down?)"
        ) from None
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        # classify from the child's own traceback: transient runtime
        # errors get their retries, real bugs surface immediately
        from fal_net_tpu.utils.faults import TRANSIENT_MARKERS

        blob = proc.stderr + proc.stdout
        if any(m in blob for m in TRANSIENT_MARKERS):
            raise RuntimeError(
                f"UNAVAILABLE: transient bench-child failure "
                f"(exit {proc.returncode})"
            )
        raise RuntimeError(f"bench attempt failed with exit {proc.returncode}")


if __name__ == "__main__":
    import sys

    if "--once" in sys.argv:
        main()  # the actual measurement, run as a killable child
    else:
        # The TPU relay in this environment occasionally drops a call with
        # a transient FAILED_PRECONDITION/UNAVAILABLE; a retry has always
        # succeeded (see CLAUDE.md).  Bounded so real failures surface.
        from fal_net_tpu.utils.faults import retry_transient

        retry_transient(
            _attempt_in_subprocess, retries=2, backoff_s=5.0, describe="bench run"
        )
