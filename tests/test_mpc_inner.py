"""Inner-MPC integration tests: assembly + IPM + SQP on the real A1 setup.

Reference analog: "Basic MPC" integration test (test/mpc_test.cpp:41-120) —
build the MPC from the real config, run CreateInitialRun + GetRealTimeUpdate,
and check the solution is sane (converged QP, small dynamics defect,
physically plausible forces).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import gait, qp as qp_mod, solver
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory, ravel_u
from bilevel_gait_gen_tpu.ops import pdip, spline
from bilevel_gait_gen_tpu.utils.config import MPCConfig

CFG = MPCConfig().validate()
MODEL = a1.make_a1()
Q0 = jnp.array(a1.stand_config(), dtype=jnp.float64)
PARAMS = srb.make_srb_params(MODEL, Q0)

# srb_init from the reference config: standing at 0.3 m
X0 = srb.reconstruct_state(PARAMS, Q0, jnp.zeros(MODEL.nv, jnp.float64))
X_DES = X0


def setup_state():
    sched = gait.make_trot(CFG)
    feet0 = rbd.ee_positions(MODEL, Q0)
    traj = default_trajectory(CFG, sched, X0, feet0[:, :2])
    return solver.SolverState(
        traj=traj, ee_box=jnp.asarray(CFG.ee_box_size, jnp.float64)), feet0


def test_assemble_shapes_and_finite():
    state, feet0 = setup_state()
    x_des = srb.manifold_to_tangent(X_DES)
    qp = qp_mod.assemble(CFG, PARAMS, state.traj, X0, jnp.array(0.0), feet0,
                         x_des, state.ee_box)
    n_u = CFG.num_u
    assert qp.H.shape == (n_u, n_u)
    for arr in [qp.H, qp.q, qp.A, qp.b, qp.G, qp.h, qp.S, qp.c]:
        assert np.all(np.isfinite(np.asarray(arr)))
    # H PSD
    w = np.linalg.eigvalsh(np.asarray(qp.H))
    assert w.min() > 0
    # EE start rows reproduce current feet
    assert qp.A.shape[0] == 4 * CFG.num_ee


def test_initial_run_converges():
    state, feet0 = setup_state()
    x_des = srb.manifold_to_tangent(X_DES)
    state2, stats = solver.create_initial_run(CFG, PARAMS, state, X0, feet0,
                                              x_des)
    assert bool(stats.solved)
    # absolute gap; relative to the ~3e3 cost scale this is ~5e-8 (the
    # Newton-Schulz-tracked inverse plateaus slightly above exact solves)
    assert float(stats.qp_gap) < 1e-3
    # dynamics defect small after the initial SQP
    assert float(stats.defect_l1) < 2e-2, float(stats.defect_l1)

    # physical sanity: average total vertical force over the horizon ~ m g
    # (instantaneous force oscillates by construction: the force spline is
    # pinned to zero at every contact boundary)
    traj = state2.traj
    ts = jnp.linspace(0.0, 0.99, 100)
    fz = jax.vmap(lambda t: jnp.sum(spline.forces_all(
        traj.sched.bounds, traj.f_nodes, t, CFG.num_force_polys)[:, 2]))(ts)
    mg = float(PARAMS.mass) * 9.81
    assert abs(float(jnp.mean(fz)) - mg) < 0.15 * mg, (float(jnp.mean(fz)), mg)
    # trajectory stays near standing height
    z = np.asarray(traj.x_man[:, 2])
    assert np.all(np.abs(z - 0.3) < 0.1), z

    # friction cone respected at samples
    mu = CFG.friction_coef
    for t in [0.05, 0.15, 0.25]:
        f = np.asarray(spline.forces_all(traj.sched.bounds, traj.f_nodes,
                                         jnp.array(t), CFG.num_force_polys))
        for e in range(4):
            if f[e, 2] > 1.0:
                assert abs(f[e, 0]) <= mu * f[e, 2] + 1e-4
                assert abs(f[e, 1]) <= mu * f[e, 2] + 1e-4


def test_real_time_iteration_tracks():
    """A few receding-horizon iterations keep the defect bounded and the
    contact-consistent forces alive (GetRealTimeUpdate semantics)."""
    state, feet0 = setup_state()
    x_des = srb.manifold_to_tangent(X_DES)
    state, _ = solver.create_initial_run(CFG, PARAMS, state, X0, feet0, x_des)

    step = jax.jit(lambda st, x0, t0, ee: solver.solve_step(
        CFG, PARAMS, st, x0, t0, ee, x_des))

    x_cur = X0
    for k in range(1, 6):
        t0 = jnp.asarray(0.05 * k, jnp.float64)
        # simulate perfectly following the plan: take the next state
        x_cur = state.traj.x_man[1]
        feet = jax.vmap(lambda b, fh: spline.foot_position(
            b, fh, t0, CFG.swing_height, CFG.foot_offset))(
            state.traj.sched.bounds, state.traj.footholds)
        state, stats = step(state, x_cur, t0, feet)
        assert bool(stats.solved), k
        # a single warm-started real-time iteration carries a small defect
        # (~4e-4 per state entry), exactly like the reference's RTI scheme
        assert float(stats.defect_l1) < 0.5
    z = np.asarray(state.traj.x_man[:, 2])
    assert np.all(np.abs(z - 0.3) < 0.12)


def test_rk2_integrator_initial_run():
    """RK2 discretization option (#13) also converges on the trot problem."""
    import dataclasses
    cfg2 = dataclasses.replace(CFG, integrator="rk2")
    state, feet0 = setup_state()
    x_des = srb.manifold_to_tangent(X_DES)
    state2, stats = solver.create_initial_run(cfg2, PARAMS, state, X0, feet0,
                                              x_des)
    assert bool(stats.solved)
    # the RTI drives the *linearized* midpoint dynamics to zero; the true
    # midpoint defect keeps a second-order remainder (~1e-3 per entry)
    assert float(stats.defect_l1) < 0.5, float(stats.defect_l1)
