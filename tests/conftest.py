"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's device-parameterized testing
(reference: newton/tests/unittest_utils.py:27-151) — there, tests run per
CUDA device; here, single-device jit plus an 8-device CPU mesh validates the
`jax.sharding` multi-chip path without TPU hardware.

The TPU tunnel plugin registers itself from ``sitecustomize.py`` (via
PYTHONPATH=.axon_site) at interpreter startup — BEFORE this file runs — and
initializes the axon backend. Re-exec'ing is not an option under pytest's
fd-level capture (the child's report would vanish into the capture tempfile),
so instead force the platform config and drop any already-created backends;
jax re-initializes on the CPU mesh at next use.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# Drop the axon (TPU tunnel) plugin from PYTHONPATH: importing it blocks on
# the single-tenant tunnel whenever another process is using the TPU, which
# stalls CPU test runs for minutes.
os.environ["PYTHONPATH"] = ""
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test (skip with -m 'not slow' for a quick run)")


jax.config.update("jax_enable_x64", False)

# Persistent XLA compilation cache: nearly all suite wall time is jit
# compilation of the same scenes run-over-run; with the cache warm the
# suite runs in a fraction of the cold time. Repo-local so CI/driver
# checkouts start cold but every later invocation is fast.
_cache_dir = os.path.join(os.path.dirname(__file__), "..",
                          ".jax_test_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass
jax.config.update("jax_platforms", "cpu")

if jax.devices()[0].platform != "cpu" or len(jax.devices()) < 8:
    # sitecustomize already initialized the axon backend: drop it and let
    # jax re-create clients under the forced-CPU config above
    from jax._src import xla_bridge as _xb

    _xb._clear_backends()
    assert jax.devices()[0].platform == "cpu" and len(jax.devices()) >= 8, (
        f"tests need the 8-device CPU mesh, got {jax.devices()}")
