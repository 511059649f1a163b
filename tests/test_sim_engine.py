"""On-device closed-loop simulation tests (sim/engine.py).

The whole stack — penalty-contact physics, whole-body QP, MPC real-time
iterations — as one jitted scan.  Small shapes keep compile time sane; the
contract is: runs, stays finite, and the standing robot stays upright.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bilevel_gait_gen_tpu.control import wbqp
from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import gait, solver
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.sim import engine
from bilevel_gait_gen_tpu.utils.config import MPCConfig


def test_physics_step_free_fall():
    model = a1.make_a1()
    sim = engine.SimConfig()
    q = jnp.asarray(a1.stand_config(), jnp.float64).at[2].set(1.0)
    v = jnp.zeros(model.nv)
    q2, v2 = engine.physics_step(model, sim, q, v,
                                 jnp.zeros(model.num_joints), 0.001)
    # airborne: base accelerates at -g
    np.testing.assert_allclose(float(v2[2]), -9.81e-3, rtol=1e-3)


def test_contact_forces_support():
    sim = engine.SimConfig()
    feet = jnp.array([[0.0, 0.0, 0.005]] * 4)   # penetrating
    vel = jnp.zeros((4, 3))
    f = engine.contact_forces(sim, feet, vel)
    assert np.all(np.asarray(f[:, 2]) > 0)
    feet_air = jnp.array([[0.0, 0.0, 0.1]] * 4)
    f2 = engine.contact_forces(sim, feet_air, vel)
    np.testing.assert_allclose(np.asarray(f2), 0.0)


def test_closed_loop_standing_small():
    """Standing schedule, 30 control ticks fully on device."""
    cfg = MPCConfig(num_nodes=6, num_phase_slots=4, phase_duration=0.5,
                    samples_per_stance=4, ee_node_start=1, ipm_iters=15,
                    init_run_iters=3, max_ls_iters=4, dt=0.05).validate()
    model = a1.make_a1()
    q0 = jnp.asarray(a1.stand_config(), jnp.float32).at[2].add(-0.007)
    params = srb.make_srb_params(model, q0)
    x0 = srb.reconstruct_state(params, q0, jnp.zeros(model.nv, jnp.float32))
    feet0 = rbd.ee_positions(model, q0).astype(jnp.float32)
    sched = gait.make_standing(cfg)
    traj = default_trajectory(cfg, sched, x0, feet0[:, :2])
    state = solver.SolverState(
        traj=traj, ee_box=jnp.asarray(cfg.ee_box_size, jnp.float32))
    x_des = srb.manifold_to_tangent(x0)
    state, stats = solver.create_initial_run(cfg, params, state, x0, feet0,
                                             x_des)
    assert bool(stats.solved)

    sim = engine.SimConfig(substeps=2)
    wb = wbqp.WBQPConfig(ipm_iters=10)
    run = jax.jit(lambda st, q, v: engine.closed_loop(
        model, params, cfg, wb, sim, st, q, v, x_des,
        n_ticks=30, control_dt=0.004, mpc_every=10))
    st_out, log = run(state, q0, jnp.zeros(model.nv, jnp.float32))
    qs = np.asarray(log.q)
    assert np.all(np.isfinite(qs))
    z = qs[:, 2]
    assert z.min() > 0.2, z.min()
    assert abs(z[-1] - 0.293) < 0.06


def test_closed_loop_with_gait_opt_compiles():
    """Tiny closed loop with the bilevel gait-opt cadence wired in
    (MPCUpdate 3-phase cycle).  Checks compile + finiteness."""
    cfg = MPCConfig(num_nodes=4, num_phase_slots=4, phase_duration=0.5,
                    samples_per_stance=3, ee_node_start=1, ipm_iters=8,
                    init_run_iters=1, max_ls_iters=2, ls_alphas=2,
                    dt=0.05).validate()
    model = a1.make_a1()
    q0 = jnp.asarray(a1.stand_config(), jnp.float32).at[2].add(-0.007)
    params = srb.make_srb_params(model, q0)
    x0 = srb.reconstruct_state(params, q0, jnp.zeros(model.nv, jnp.float32))
    feet0 = rbd.ee_positions(model, q0).astype(jnp.float32)
    traj = default_trajectory(cfg, gait.make_standing(cfg), x0, feet0[:, :2])
    state = solver.SolverState(
        traj=traj, ee_box=jnp.asarray(cfg.ee_box_size, jnp.float32))
    x_des = srb.manifold_to_tangent(x0)

    sim = engine.SimConfig(substeps=1)
    wb = wbqp.WBQPConfig(ipm_iters=8)
    st_out, log = engine.closed_loop(
        model, params, cfg, wb, sim, state, q0,
        jnp.zeros(model.nv, jnp.float32), x_des,
        n_ticks=6, control_dt=0.01, mpc_every=2, gait_opt_every=2)
    assert np.all(np.isfinite(np.asarray(log.q)))
    assert np.all(np.isfinite(np.asarray(st_out.traj.sched.bounds)))


@pytest.mark.slow
def test_closed_loop_standing_5s():
    """Sustained standing on the penalty ground: 5 s / 100 MPC steps with
    bounded COM error (the round-1 engine collapsed within ~0.5 s; fixed by
    the static-support force carrier + chained standing schedule +
    equilibrium IK settle — docs/DESIGN.md 'Round-2 resolution')."""
    dtype = jnp.float32
    cfg = MPCConfig(ipm_iters=18, force_carrier=True).validate()
    wb_cfg = wbqp.WBQPConfig(torque_bound=30.0)
    sim = engine.SimConfig()
    model = a1.make_a1()
    q0 = engine.settled_stand(model, sim, jnp.asarray(a1.stand_config(),
                                                      dtype))
    params = srb.make_srb_params(model, q0)
    from bilevel_gait_gen_tpu.control import mpc_controller
    x0 = mpc_controller.reconstruct_srb_state(
        model, params, q0, jnp.zeros(model.nv, dtype))
    feet0 = rbd.ee_positions(model, q0).astype(dtype)
    traj = default_trajectory(cfg, gait.make_standing(cfg), x0,
                              feet0[:, :2])
    st = solver.SolverState(traj=traj,
                            ee_box=jnp.asarray(cfg.ee_box_size, dtype))
    x_des = srb.manifold_to_tangent(x0)
    st, stats = jax.jit(lambda s, x, e: solver.create_initial_run(
        cfg, params, s, x, e, x_des))(st, x0, feet0)
    assert bool(stats.solved)

    n_ticks = 5000
    st_out, log = jax.jit(lambda s, q, v: engine.closed_loop(
        model, params, cfg, wb_cfg, sim, s, q, v, x_des,
        n_ticks=n_ticks, control_dt=0.001, mpc_every=50,
        contact_sync=True))(st, q0, jnp.zeros(model.nv, dtype))
    q = np.asarray(log.q)
    solved = np.asarray(log.solved)[np.arange(0, n_ticks, 50)]
    assert solved.mean() > 0.95, solved.mean()
    z0 = float(q0[2])          # base height; log.q[:, 2] is the base z
    assert q[:, 2].min() > z0 - 0.06, q[:, 2].min()
    assert q[:, 2].max() < z0 + 0.06, q[:, 2].max()
    assert np.abs(q[:, 0:2]).max() < 0.10, np.abs(q[:, 0:2]).max()


@pytest.mark.slow
def test_closed_loop_trot_5s():
    """Sustained TROT on the penalty ground: 5 s / 100 MPC steps with
    bounded COM error and >95% solved — the round-2 acceptance bar for the
    all-on-device path (VERDICT item 3; reference analog: the 9500-step
    MuJoCo loop, test/simulation_mpc.cpp:186).  Recipe: static-support
    carrier + 0.15 s double-support overlap + warm-started IPM +
    contact_sync with hysteresis gating (docs/DESIGN.md 'Round-2
    resolution'); measured to survive 10 s.

    Runs in a SUBPROCESS with x64 disabled: the production engine is pure
    f32, and the suite's jax_enable_x64 changes scalar widths enough to
    alter XLA fusion and (chaotically) the rollout — the contract under
    test is the production configuration."""
    import json
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = r'''
import sys, json
sys.path.insert(0, sys.argv[1])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", sys.argv[1] + "/.jax_cache")
import jax.numpy as jnp, numpy as np
from bilevel_gait_gen_tpu.control import wbqp
from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import gait, solver
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.sim import engine
from bilevel_gait_gen_tpu.utils.config import MPCConfig
dtype = jnp.float32
cfg = MPCConfig(ipm_iters=18, force_carrier=True, double_support=0.15,
                carrier_ramp=0.15, swing_height=0.05).validate()
wb_cfg = wbqp.WBQPConfig(torque_bound=30.0)
sim = engine.SimConfig()
model = a1.make_a1()
q0 = engine.settled_stand(model, sim, jnp.asarray(a1.stand_config(), dtype))
params = srb.make_srb_params(model, q0)
from bilevel_gait_gen_tpu.control import mpc_controller
x0 = mpc_controller.reconstruct_srb_state(model, params, q0, jnp.zeros(model.nv, dtype))
feet0 = rbd.ee_positions(model, q0).astype(dtype)
traj = default_trajectory(cfg, gait.make_trot(cfg), x0, feet0[:, :2])
st = solver.make_state(cfg, traj, jnp.asarray(cfg.ee_box_size, dtype))
x_des = srb.manifold_to_tangent(x0)
st, stats = jax.jit(lambda s, x, e: solver.create_initial_run(
    cfg, params, s, x, e, x_des))(st, x0, feet0)
n_ticks = 5000
st_out, log = jax.jit(lambda s, q, v: engine.closed_loop(
    model, params, cfg, wb_cfg, sim, s, q, v, x_des,
    n_ticks=n_ticks, control_dt=0.001, mpc_every=50,
    contact_sync=True))(st, q0, jnp.zeros(model.nv, dtype))
q = np.asarray(log.q)
solved = np.asarray(log.solved)[np.arange(0, n_ticks, 50)]
print("RESULT " + json.dumps({
    "init_solved": bool(stats.solved),
    "solved_frac": float(solved.mean()),
    "z0": float(q0[2]),
    "z_min": float(q[:, 2].min()), "z_max": float(q[:, 2].max()),
    "xy_max": float(np.abs(q[:, 0:2]).max()),
    "finite": bool(np.all(np.isfinite(q)))}))
'''
    env = dict(os.environ)
    # the engine is the DEVICE-side production loop: deployment runs it on
    # one TPU chip, so the contract under test is the single-device
    # compilation (like the f32 pin above).  Under the suite's 8-virtual-
    # device host flag the same rollout diverges (reduction-order
    # numerics); the MuJoCo parity loops carry margin for that and run
    # de-scrubbed (test_adam_walk, test_push_recovery) — the engine's
    # margin work is tracked in PARITY.md.
    env["XLA_FLAGS"] = ""
    out = subprocess.run([sys.executable, "-c", script, repo],
                         capture_output=True, text=True, timeout=1500,
                         env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    assert line, out.stdout[-2000:]
    r = json.loads(line[-1][len("RESULT "):])
    assert r["init_solved"], r
    assert r["finite"], r
    assert r["solved_frac"] > 0.95, r
    assert r["z_min"] > r["z0"] - 0.11, r       # bounded COM error
    assert r["xy_max"] < 0.20, r


@pytest.mark.slow
def test_closed_loop_bilevel_trot_3s():
    """The COMPLETE flagship loop fully on device in one scan: penalty
    physics + whole-body QP + MPC RTIs + bilevel gait-opt updates every 5
    MPC steps (the reference's gait_opt_freq cadence,
    mpc_controller.cpp:286-399 + a1_config_distr_rejection.yaml).  The
    robot must keep trotting AND the optimized contact times must actually
    move from the initial schedule."""
    import json
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = r'''
import sys, json
sys.path.insert(0, sys.argv[1])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", sys.argv[1] + "/.jax_cache")
import jax.numpy as jnp, numpy as np
from bilevel_gait_gen_tpu.control import mpc_controller, wbqp
from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import gait, solver
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.sim import engine
from bilevel_gait_gen_tpu.utils.config import MPCConfig
dtype = jnp.float32
cfg = MPCConfig(ipm_iters=18, force_carrier=True, double_support=0.15,
                carrier_ramp=0.15, swing_height=0.05,
                ls_alphas=4).validate()
wb_cfg = wbqp.WBQPConfig(torque_bound=30.0)
sim = engine.SimConfig()
model = a1.make_a1()
q0 = engine.settled_stand(model, sim, jnp.asarray(a1.stand_config(), dtype))
params = srb.make_srb_params(model, q0)
x0 = mpc_controller.reconstruct_srb_state(model, params, q0, jnp.zeros(model.nv, dtype))
feet0 = rbd.ee_positions(model, q0).astype(dtype)
# MISTIMED trot (every phase stretched 1.25x): a well-timed nominal
# trot gives the optimizer nothing to fix, and the r4 acceptance gates
# (cold alpha=0 lane + converged-RTI sanity floor) then correctly reject
# every candidate (measured dlen ~ 5e-7); the contract under test is that
# the optimizer moves MISTIMED contact times while the robot stays up.
sched0 = gait.GaitSchedule(bounds=gait.make_trot(cfg).bounds * 1.25)
traj = default_trajectory(cfg, sched0, x0, feet0[:, :2])
bounds0 = np.asarray(traj.sched.bounds)
st = solver.make_state(cfg, traj, jnp.asarray(cfg.ee_box_size, dtype))
x_des = srb.manifold_to_tangent(x0)
st, stats = jax.jit(lambda s, x, e: solver.create_initial_run(
    cfg, params, s, x, e, x_des))(st, x0, feet0)
n_ticks = 3000
st_out, log = jax.jit(lambda s, q, v: engine.closed_loop(
    model, params, cfg, wb_cfg, sim, s, q, v, x_des,
    n_ticks=n_ticks, control_dt=0.001, mpc_every=50, gait_opt_every=5,
    contact_sync=True))(st, q0, jnp.zeros(model.nv, dtype))
q = np.asarray(log.q)
solved = np.asarray(log.solved)[np.arange(0, n_ticks, 50)]
# schedule drift beyond pure window advancement: compare phase LENGTHS
def lens(b):
    return np.diff(b, axis=-1)
dlen = np.abs(lens(np.asarray(st_out.traj.sched.bounds)) - lens(bounds0)).max()
print("RESULT " + json.dumps({
    "solved_frac": float(solved.mean()),
    "z0": float(q0[2]),
    "z_min": float(q[:, 2].min()),
    "xy_max": float(np.abs(q[:, 0:2]).max()),
    "dlen": float(dlen),
    "finite": bool(np.all(np.isfinite(q)))}))
'''
    env = dict(os.environ)
    # the engine is the DEVICE-side production loop: deployment runs it on
    # one TPU chip, so the contract under test is the single-device
    # compilation (like the f32 pin above).  Under the suite's 8-virtual-
    # device host flag the same rollout diverges (reduction-order
    # numerics); the MuJoCo parity loops carry margin for that and run
    # de-scrubbed (test_adam_walk, test_push_recovery) — the engine's
    # margin work is tracked in PARITY.md.
    env["XLA_FLAGS"] = ""
    out = subprocess.run([sys.executable, "-c", script, repo],
                         capture_output=True, text=True, timeout=1500,
                         env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("RESULT ")][0]
    res = json.loads(line[len("RESULT "):])
    assert res["finite"]
    assert res["solved_frac"] > 0.9, res
    assert res["z_min"] > res["z0"] - 0.1, res
    assert res["xy_max"] < 0.3, res
    # the gait optimizer actually moved the contact times (phase lengths
    # changed, not just the receding-horizon shift)
    assert res["dlen"] > 1e-4, res
