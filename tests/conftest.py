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
# persistent compile cache: the suite's wall-clock is dominated by XLA
# compiles of the closed-loop scans; share them across runs (dir is
# .gitignore'd)
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
# required for the CPU backend to actually write entries (default entry-size
# gating skips them; verified empirically on jax 0.9)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Cap suite memory: one pytest process accumulates every module's XLA
    executables (the closed-loop scans are hundreds of MB each compiled in
    x64); the full suite has been seen dying with MemoryError late in the
    run.  Dropping compile caches after each module bounds the peak at the
    cost of a few recompiles."""
    yield
    jax.clear_caches()


# ---------------------------------------------------------------------------
# fast/slow split: `pytest -m fast` is the <5-min developer loop; the full
# run (default) includes the expensive closed-loop / FD-contract tests.
# Modules listed here are slow WHOLESALE (every test heavy by construction);
# individual heavy tests elsewhere carry @pytest.mark.slow directly.
# ---------------------------------------------------------------------------

_SLOW_MODULES = {
    "test_parity",      # module-scope 10-step MPC rollouts (f64 + f32)
    "test_mpc_inner",   # full-size assemble + solve + closed-loop RTI
    "test_sim_engine",  # closed-loop physics+WBQP+MPC scans
    "test_bilevel",     # QP-solve line searches + every-boundary FD contract
    "test_multihost",   # spawns 2 fresh interpreters (compile from scratch)
}


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: expensive test (excluded by -m fast)")
    config.addinivalue_line("markers", "fast: quick test (run with -m fast)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        if item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.fast)
