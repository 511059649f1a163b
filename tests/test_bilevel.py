"""Bilevel (outer-loop) tests: gradient through the QP, projection step,
batched line search.

Reference contract: the "Model Partials" integration test finite-differences
the bilevel pipeline (test/mpc_test.cpp:120-270, tol 1e-4); here the whole
dH/dtheta is one jax.grad, checked against finite differences of the actual
solved QP objective.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import bilevel, gait, qp as qp_mod, solver
from bilevel_gait_gen_tpu.mpc.gait import GaitSchedule
from bilevel_gait_gen_tpu.mpc.trajectory import Trajectory, default_trajectory
from bilevel_gait_gen_tpu.ops import pdip
from bilevel_gait_gen_tpu.utils.config import MPCConfig

CFG = MPCConfig().validate()
MODEL = a1.make_a1()
Q0 = jnp.array(a1.stand_config(), dtype=jnp.float64)
PARAMS = srb.make_srb_params(MODEL, Q0)
X0 = jnp.zeros(13).at[2].set(0.3).at[9].set(1.0)


def converged_state():
    feet0 = rbd.ee_positions(MODEL, Q0)
    traj = default_trajectory(CFG, gait.make_trot(CFG), X0, feet0[:, :2])
    st = solver.SolverState(traj=traj,
                            ee_box=jnp.asarray(CFG.ee_box_size, jnp.float64))
    x_des = srb.manifold_to_tangent(X0)
    st, _ = solver.create_initial_run(CFG, PARAMS, st, X0, feet0, x_des)
    return st, feet0, x_des


STATE, FEET0, X_DES = converged_state()


def outer_cost_at(bounds):
    traj_b = Trajectory(x_man=STATE.traj.x_man, f_nodes=STATE.traj.f_nodes,
                        footholds=STATE.traj.footholds,
                        sched=GaitSchedule(bounds=bounds))
    qp = qp_mod.assemble(CFG, PARAMS, traj_b, X0, jnp.array(0.0), FEET0,
                         X_DES, STATE.ee_box)
    sol = pdip.solve(qp.H, qp.q, qp.A, qp.b, qp.G, qp.h, iters=40, tol=1e-12)
    return float(0.5 * sol.x @ qp.H @ sol.x + qp.q @ sol.x + qp.cost_const)


def test_outer_gradient_matches_fd():
    g = np.asarray(bilevel.outer_gradient(
        CFG, PARAMS, STATE.traj, X0, jnp.array(0.0), FEET0, X_DES,
        STATE.ee_box))
    assert np.all(np.isfinite(g))
    b0 = np.asarray(STATE.traj.sched.bounds, dtype=np.float64)
    eps = 1e-5
    # spot-check free (future) boundaries across both trot pairs (kept small:
    # each FD sample is two full QP solves)
    checked = 0
    for ee in [0, 1]:
        for i in [1, 2]:
            if b0[ee, i] <= 0.0 or b0[ee, i] >= CFG.horizon:
                continue
            bp, bm = b0.copy(), b0.copy()
            bp[ee, i] += eps
            bm[ee, i] -= eps
            fd = (outer_cost_at(jnp.asarray(bp))
                  - outer_cost_at(jnp.asarray(bm))) / (2 * eps)
            denom = max(1.0, abs(fd), abs(g[ee, i]))
            assert abs(g[ee, i] - fd) / denom < 5e-2, (
                f"theta[{ee},{i}]: ift={g[ee, i]:.4f} fd={fd:.4f}")
            checked += 1
    assert checked >= 3


def test_contact_time_step_respects_constraints():
    g = jnp.ones_like(STATE.traj.sched.bounds) * -1.0  # push all later
    d = bilevel.contact_time_step(CFG, STATE.traj.sched, g, jnp.array(0.0))
    d_np = np.asarray(d)
    b0 = np.asarray(STATE.traj.sched.bounds)
    # pinned past boundaries don't move
    assert np.all(np.abs(d_np[b0 <= 0.0]) < 1e-6)
    # trust region respected
    assert np.max(np.abs(d_np)) <= CFG.trust_region + 1e-6
    # new times keep ordering
    b1 = b0 + d_np
    assert np.all(np.diff(b1, axis=1) > -1e-6)


def test_line_search_improves_or_keeps():
    g = bilevel.outer_gradient(CFG, PARAMS, STATE.traj, X0, jnp.array(0.0),
                               FEET0, X_DES, STATE.ee_box)
    d = bilevel.contact_time_step(CFG, STATE.traj.sched, g, jnp.array(0.0))
    res = bilevel.line_search(CFG, PARAMS, STATE, d, X0, jnp.array(0.0),
                              FEET0, X_DES)
    assert np.isfinite(float(res.cost))
    # alpha=0 is in the grid, so the winner can never be worse than staying
    _, stats0 = solver.solve_step(CFG, PARAMS, STATE, X0, jnp.array(0.0),
                                  FEET0, X_DES, shift_window=False)
    assert float(res.cost) <= float(stats0.cost) + 1e-6
