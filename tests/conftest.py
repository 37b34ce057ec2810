"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's device-parameterized testing
(reference: newton/tests/unittest_utils.py:27-151) — there, tests run per
CUDA device; here, single-device jit plus an 8-device CPU mesh validates the
`jax.sharding` multi-chip path without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Drop the axon (TPU tunnel) plugin from PYTHONPATH: importing it blocks on
# the single-tenant tunnel whenever another process is using the TPU, which
# stalls CPU test runs for minutes.
os.environ["PYTHONPATH"] = ""
import sys

sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
