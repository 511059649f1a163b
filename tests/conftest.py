"""Test configuration: force an 8-device virtual CPU mesh.

Tests always run on CPU (fast, deterministic, float64-capable for derivative
checks); sharding tests see 8 virtual devices.  Bench and production runs use
the real TPU.  Note: the environment's sitecustomize pre-imports jax with the
TPU platform selected, so the platform must be overridden via jax.config
(env vars are too late by conftest time).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
