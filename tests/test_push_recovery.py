"""Closed-loop push recovery — the reference's distr-rejection scenario.

Reference semantics (apps/a1_config_distr_rejection.yaml + mpc_sim_demo
.cpp:50,88): the MuJoCo robot starts at init_vel = 0.375 m/s forward base
velocity (the yaml's srb_init "2.5" is the SRB warm start's linear
MOMENTUM in kg m/s, not a velocity).  The acceptance bar is the robot
staying upright and arresting the push in the closed MuJoCo loop — and,
beyond the reference's single demo speed, a MONOTONE envelope: every
0.05-step from 0.30 to 0.60 m/s recovers (r3's envelope was
phase-sensitive — recovered 0.375/0.6, fell at 0.3/0.45/0.5/0.55/0.7;
fixed in r4 by the flight-phase schedule hold + widened early-touchdown
snap + capped stopping-point braking target, sim/closed_loop.py).

Run in a subprocess at production precision (f32, no x64): the conftest's
f64 default belongs to the derivative-contract tests.  The conftest's
8-virtual-device XLA_FLAGS are NOT scrubbed (r2/r3 carryover removed):
the recovery margin is now wide enough (z_min 0.29 vs the 0.15 bar across
the sweep) that partitioning/fusion numerics don't tip the outcome.
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_push_recovery_envelope_sweep():
    """Every 0.05-step from 0.30 to 0.60 m/s recovers (one process, one
    compile; scripts/distr_rejection.py --sweep exits 0 iff all do)."""
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "distr_rejection.py"),
         "--cpu", "--closed-loop", "--sweep=0.30:0.60:0.05"],
        capture_output=True, text=True, timeout=1500, env=env, cwd=ROOT)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert "SWEEP RECOVERED" in proc.stdout
