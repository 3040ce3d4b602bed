"""Test fixtures: force CPU with an 8-device virtual mesh.

This is the standard JAX trick for testing N-device sharding without
hardware (SURVEY.md §4c): tests run on the host CPU backend with
xla_force_host_platform_device_count=8, so `jax.sharding.Mesh` tests
exercise real collectives.

Note: this image's sitecustomize registers an `axon` TPU backend and
forces jax_platforms=axon at import time; the env var alone does not
override it, so we set the config directly before any backend init.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
