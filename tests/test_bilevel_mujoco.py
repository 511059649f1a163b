"""Bilevel gait optimization exercised against MuJoCo physics (VERDICT r3
item 3): the physics-parity counterpart of
tests/test_bilevel.py::test_gait_opt_reduces_cost_on_mistimed_schedule.

Reference: test/gait_opt_line_search.cpp:112-203 — the reference's gait-opt
acceptance evidence is an MPC + gait-opt ROLLOUT with a cost report, and
its rollout runs inside its simulator; the optimizer also lives inside the
controller its MuJoCo demos run (controllers/mpc_controller.cpp:286-399).

Subprocess at production precision (f32); the A/B logic lives in
scripts/gait_opt_experiment.py (exit 0 iff the gait-on arm stays upright
and its late-rollout planning cost beats the fixed mistimed schedule).
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_gait_opt_beats_fixed_schedule_in_mujoco():
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    proc = subprocess.run(
        [sys.executable,
         os.path.join(ROOT, "scripts", "gait_opt_experiment.py"),
         "3", "--cpu"],
        capture_output=True, text=True, timeout=2400, env=env, cwd=ROOT)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert "GAIT-OPT WINS" in proc.stdout
