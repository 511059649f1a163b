"""Closed-loop push recovery — the reference's distr-rejection scenario.

Reference semantics (apps/a1_config_distr_rejection.yaml + mpc_sim_demo
.cpp:50,88): the MuJoCo robot starts at init_vel = 0.375 m/s forward base
velocity (the yaml's srb_init "2.5" is the SRB warm start's linear
MOMENTUM in kg m/s, not a velocity).  The acceptance bar is the robot
staying upright and arresting the push in the closed MuJoCo loop.

Run in a subprocess at production precision (f32, no x64): the conftest's
f64 default belongs to the derivative-contract tests, and this scenario
sits near the one-step capture limit where precision changes the outcome.
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_push_recovery_reference_scenario():
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    # production runs ONE device; the 8-virtual-device XLA flag
    # changes partitioning/fusion numerics enough to tip marginal
    # closed loops (measured: the Adam march falls under it)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "distr_rejection.py"),
         "--cpu", "--closed-loop"],
        capture_output=True, text=True, timeout=560, env=env, cwd=ROOT)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "RECOVERED" in proc.stdout
