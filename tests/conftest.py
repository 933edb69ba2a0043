"""Test harness platform setup.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4): multi-chip sharding
is validated without a TPU slice, and CPU keeps compile times low.

Note: this image's sitecustomize registers the axon TPU backend and forces
``jax_platforms="axon,cpu"`` via jax.config at interpreter start, so the env
var alone is not enough — we must update the config back to cpu before any
backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
