"""Test configuration: run everything on a virtual 8-device CPU mesh.

The axon TPU plugin force-sets jax_platforms at sitecustomize time, so the
JAX_PLATFORMS env var alone is not enough — we must also update the config
after importing jax (before any backend initialization).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy e2e tests (8-device dryrun, full-config matrix, "
        "multi-epoch training); deselect with -m 'not slow'")
