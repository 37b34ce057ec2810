"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's device-parameterized testing
(reference: newton/tests/unittest_utils.py:27-151) — there, tests run per
CUDA device; here, single-device jit plus an 8-device CPU mesh validates the
`jax.sharding` multi-chip path without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
