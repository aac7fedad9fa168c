"""Test harness config.

Runs before test collection imports jax anywhere else:

- forces the CPU backend with 8 virtual devices so sharding/collective
  tests exercise a multi-chip mesh without TPU hardware (SURVEY §4
  'multi-node without a real cluster');
- the env var alone is NOT enough in this image: an axon sitecustomize
  registers the tunneled TPU backend and sets ``jax_platforms=axon,cpu``
  programmatically, so we must override the config after import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
