"""Driver-facing bench.py contract.

The round driver runs ``python bench.py`` on real hardware and records the
single JSON line it prints (BENCH_r{N}.json).  This smoke test runs the
same script end to end in a subprocess on a tiny CPU configuration (env
hooks in bench.py) and pins the JSON schema, so a refactor can't silently
break the one artifact the driver consumes.
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_json_contract_tiny_cpu():
    env = dict(os.environ)
    env.update(
        {
            "PYTHONPATH": os.pathsep.join(
                p for p in [_REPO, env.get("PYTHONPATH", "")] if p
            ),
            "FALNET_BENCH_PLATFORM": "cpu",
            "FALNET_BENCH_MODEL": "tiny",
            "FALNET_BENCH_LEVELS": "5",
            "FALNET_BENCH_HW": "64x96",
            "FALNET_BENCH_BATCH": "2",
            "FALNET_BENCH_ITERS": "2",
            "FALNET_BENCH_SECONDARIES": "0",
        }
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py"), "--once"],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=_REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert lines, "bench printed nothing"
    record = json.loads(lines[-1])

    # the driver's required triple + ratio
    assert isinstance(record["metric"], str) and record["metric"]
    assert isinstance(record["value"], float) and record["value"] > 0
    assert record["unit"] == "imgs/sec"
    assert isinstance(record["vs_baseline"], float)

    # secondaries are always present as keys (None when skipped/failed —
    # fault isolation must not drop the field)
    for key in (
        "batch1_latency_ms",
        "bf16_best_imgs_per_sec",
        "bf16_best_batch",
        "fp32_best_imgs_per_sec",
        "fp32_best_batch",
        "mfu_vs_bf16_peak",
    ):
        assert key in record, key
    assert record["bf16_best_imgs_per_sec"] is None  # secondaries disabled
    assert record["fp32_best_imgs_per_sec"] is None
