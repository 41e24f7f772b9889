#!/usr/bin/env bash
# Per-round on-chip verification ritual (see CLAUDE.md / .claude/skills/verify).
# Run after any kernel/training/perf change, once the relay answers a probe.
# Usage: bash scripts/onchip_ritual.sh [quick|full]
#   quick (default): probe + selfcheck + bench
#   full:            + Mosaic kernel numerics + stage-1 + stage-2 on-chip
#                      convergence (~20-30 min total on a healthy relay)
set -u
cd "$(dirname "$0")/.."
MODE="${1:-quick}"

step() { echo; echo "=== $* ==="; }

step "probe (trivial matmul, 120s budget)"
if ! timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8,128))
print('probe ok:', float((x @ x.T).sum()))"; then
    echo "RELAY DOWN — aborting ritual (re-run when the probe passes)"
    exit 2
fi

# outer timeout must exceed selfcheck's worst case: 5 phases x the
# per-phase watchdog (--timeout), plus slack
step "selfcheck --full"
timeout 5400 python -m fal_net_tpu.cli.selfcheck --full --timeout 900 || exit 1

step "bench"
timeout 5400 python bench.py || exit 1

if [ "$MODE" = "full" ]; then
    step "stem_input_fuse A/B (probe_stem_fuse; informational — decides the flag default)"
    timeout 3600 python scripts/probe_stem_fuse.py || echo "probe_stem_fuse FAILED (non-fatal)"
    step "Mosaic kernel numerics (verify_tpu)"
    timeout 1800 python scripts/verify_tpu.py || exit 1
    step "fused-MED shape sweep incl. fresh odd-tile widths (probe_med_shapes)"
    timeout 5400 python scripts/probe_med_shapes.py || exit 1
    step "FAL_netA / FAL_netC on-chip, incl. training legs (verify_variants_tpu)"
    timeout 3600 python scripts/verify_variants_tpu.py || exit 1
    step "perceptual (a_p>0) step timing (probe_perceptual_step)"
    timeout 3600 python scripts/probe_perceptual_step.py || echo "probe_perceptual_step FAILED (non-fatal)"
    step "stage-1 on-chip convergence (verify_train_tpu)"
    timeout 2400 python scripts/verify_train_tpu.py || exit 1
    step "stage-2 on-chip convergence (verify_train_stage2_tpu)"
    timeout 2400 python scripts/verify_train_stage2_tpu.py || exit 1
fi

echo
echo "RITUAL PASS ($MODE)"
