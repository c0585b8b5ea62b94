"""Test harness: force an 8-device virtual CPU mesh BEFORE jax initializes
its backends.

This is the TPU-native answer to "distributed tests without a cluster"
(SURVEY.md §4.5): every sharded code path runs against 8 virtual CPU devices,
asserting sharded == single-device semantics.

NOTE: this environment boots a TPU PJRT plugin from sitecustomize and pins
JAX_PLATFORMS=axon in the process env, so the env var alone is NOT enough —
we must override via jax.config before the first backend initialization.
Running unit tests against the remote TPU tunnel is both slow (every tiny op
round-trips) and wrong (it would hold the chip hostage).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
