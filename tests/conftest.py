"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware.

Note: this machine's sitecustomize registers the real-TPU PJRT plugin and
programmatically sets jax_platforms="axon,cpu" at interpreter start, which
overrides JAX_PLATFORMS from the environment. Tests must never touch the
single-client TPU tunnel, so we reset the config to CPU here (conftest runs
before any test imports, and no jax backend has been initialized yet)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_ROOT = "/root/reference/quantisation"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
