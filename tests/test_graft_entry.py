"""Driver-facing __graft_entry__ contract.

The round driver (a) compile-checks ``entry()`` single-chip and (b) runs
``dryrun_multichip(N)`` with N virtual CPU devices to validate the
multi-chip sharding.  Both functions live in ``__graft_entry__.py`` at the
repo root and are otherwise exercised only by manual runs — these tests
pin them so a package refactor can't silently break the driver contract.
"""

import importlib.util
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_graft_entry():
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(_REPO, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_jittable_forward():
    """entry() -> (fn, example_args) must trace: abstract-eval is enough to
    catch API drift (arg mismatches, shape errors, renamed model kwargs)
    without paying a 384x1280 CPU compile."""
    import jax

    mod = _load_graft_entry()
    fn, args = mod.entry()
    out = jax.eval_shape(fn, *args)
    disp, pan = out
    assert disp.shape == (1, 384, 1280, 1), disp.shape
    assert pan.shape == (1, 384, 1280, 3), pan.shape
    assert disp.dtype == pan.dtype == jax.numpy.float32


@pytest.mark.slow
def test_dryrun_multichip_runs_in_subprocess():
    """dryrun_multichip(8) end to end, exactly as the driver invokes it
    (fresh process — it must set the virtual device count before the
    backend initializes).  Covers the 2-D ('data','spatial') branch with
    the fused MED head under shard_map (interpret mode on CPU)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [_REPO, env.get("PYTHONPATH", "")] if p
    )
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        ],
        capture_output=True,
        text=True,
        timeout=1500,
        env=env,
        cwd=_REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8)" in proc.stdout and "OK" in proc.stdout, (
        proc.stdout
    )
