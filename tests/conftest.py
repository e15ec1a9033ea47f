"""Test configuration: run everything on an 8-device virtual CPU mesh.

SURVEY.md §4 implication (d): multi-host paths are validated with
``xla_force_host_platform_device_count`` so no TPU pod is needed in CI.

NOTE: this environment pre-imports jax at interpreter startup (axon
sitecustomize) with JAX_PLATFORMS=axon, so the env var is already baked in by
the time conftest runs — ``jax.config.update`` is the effective override. The
XLA_FLAGS env is still read lazily at first backend init, so setting it here
works as long as no jax computation ran before pytest startup.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
