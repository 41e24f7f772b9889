"""Test config: run JAX on a virtual 8-device CPU mesh.

Must set env vars before the first `import jax` anywhere in the test
process, so this lives at conftest import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The environment's sitecustomize force-registers the 'axon' TPU backend and
# overrides jax_platforms at interpreter startup; undo it so tests run on the
# virtual 8-device CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's wall-time is dominated by
# recompiling the same tiny models/steps across test processes; warm-cache
# reruns skip that entirely.  Disable with FALNET_TEST_COMPILE_CACHE=0
# (e.g. when timing compilation itself); point it elsewhere by setting the
# same variable to a directory.
_cache_dir = os.environ.get(
    "FALNET_TEST_COMPILE_CACHE",
    os.path.join(os.path.dirname(__file__), ".jax_cache"),
)
if _cache_dir != "0":
    # Salt the cache dir with the host CPU's feature set: XLA:CPU AOT
    # results encode target machine features at compile time, and this
    # container migrates between hosts across sessions — loading an entry
    # compiled for a different feature set logs cpu_aot_loader errors
    # ("could lead to ... SIGILL") and produced 1-ulp numeric drift that
    # flaked exact-tolerance tests.  A moved container now gets a fresh
    # cache instead of foreign executables.
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            _flags = next(
                (ln for ln in f if ln.startswith("flags")), ""
            )
    except OSError:
        _flags = ""
    _salt = hashlib.sha1(_flags.encode()).hexdigest()[:8]
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_cache_dir, _salt)
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
