"""Centroidal MPC variant tests (reference MPCCentroidal, components #3/#4):
per-node composite inertia, FK-constrained joint velocities, solvable QP.
"""
import jax
import jax.numpy as jnp
import numpy as np

from bilevel_gait_gen_tpu.control import ik
from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import centroidal, gait
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.utils.config import MPCConfig

CFG = MPCConfig(num_nodes=8, ipm_iters=25).validate()
MODEL = a1.make_a1()
Q0 = jnp.array(a1.stand_config(), dtype=jnp.float64)
PARAMS = srb.make_srb_params(MODEL, Q0)
X0 = jnp.zeros(13).at[2].set(0.3).at[9].set(1.0)


def test_node_inertias_config_dependent():
    configs = jnp.stack([Q0, Q0.at[7].add(0.5), Q0.at[8].add(0.8)])
    Irs = centroidal.node_inertias(MODEL, configs)
    assert Irs.shape == (3, 3, 3)
    # moving a leg changes the composite inertia
    assert float(jnp.abs(Irs[1] - Irs[0]).max()) > 1e-4
    for I in np.asarray(Irs):
        assert np.all(np.linalg.eigvalsh(I) > 0)


def test_centroidal_qp_solves():
    feet0 = rbd.ee_positions(MODEL, Q0)
    traj = default_trajectory(CFG, gait.make_trot(CFG), X0, feet0[:, :2])
    configs = jnp.stack([Q0] * (CFG.num_nodes + 1))
    x_des = srb.manifold_to_tangent(X0)
    cqp = centroidal.assemble_centroidal(
        CFG, MODEL, PARAMS, traj, configs, X0, jnp.array(0.0), feet0,
        x_des, jnp.asarray(CFG.ee_box_size, jnp.float64))
    assert np.all(np.isfinite(np.asarray(cqp.H)))
    u, vj, sol = centroidal.solve_centroidal(cqp, iters=40, tol=1e-10)
    assert float(sol.gap) < 1e-5, float(sol.gap)
    assert float(sol.pri_res) < 1e-4, float(sol.pri_res)
    vj = vj.reshape(CFG.num_nodes, MODEL.num_joints)
    # joint velocities respect the bounds
    assert np.all(np.abs(np.asarray(vj)) <= float(MODEL.velocity_limit[0]) + 1e-6)
    # FK consistency at node 1: J_j vj ~ ee_vel - J_base twist
    qk = configs[1]
    J = rbd.ee_jacobians(MODEL, qk)
    got = np.asarray(jnp.einsum('eij,j->ei', J[:, :, 6:], vj[1]))
    assert np.all(np.isfinite(got))


def test_per_node_inertia_enters_dynamics():
    """The centroidal QP's dynamics must differ from the SRB QP's when the
    node configurations differ (configuration-dependent Ir_k, reference
    MPCCentroidal/CentroidalModel), and coincide when they don't."""
    from bilevel_gait_gen_tpu.mpc import qp as qp_mod
    feet0 = rbd.ee_positions(MODEL, Q0)
    traj = default_trajectory(CFG, gait.make_trot(CFG), X0, feet0[:, :2])
    x_des = srb.manifold_to_tangent(X0)
    box = jnp.asarray(CFG.ee_box_size, jnp.float64)
    base = qp_mod.assemble(CFG, PARAMS, traj, X0, jnp.array(0.0), feet0,
                           x_des, box)
    # same config at every node, nominal => identical to the SRB assembly
    Irs_same = centroidal.node_inertias(
        MODEL, jnp.stack([Q0] * (CFG.num_nodes + 1)))
    same = qp_mod.assemble(CFG, PARAMS, traj, X0, jnp.array(0.0), feet0,
                           x_des, box, node_inertia=Irs_same)
    # dynamics enter the condensed QP through H (cost over the propagated
    # states) and the EE-box G rows, not the foothold equality rows
    np.testing.assert_allclose(np.asarray(same.H), np.asarray(base.H),
                               atol=1e-9)
    # a bent leg at later nodes changes the dynamics rows
    configs = jnp.stack([Q0.at[7].add(0.4 * (k / CFG.num_nodes))
                         for k in range(CFG.num_nodes + 1)])
    Irs_bent = centroidal.node_inertias(MODEL, configs)
    bent = qp_mod.assemble(CFG, PARAMS, traj, X0, jnp.array(0.0), feet0,
                           x_des, box, node_inertia=Irs_bent)
    assert float(jnp.abs(bent.H - base.H).max()) > 1e-6


def test_centroidal_rti_loop_converges():
    """The full centroidal RTI (VERDICT r4 item 4): init run to
    convergence, then advancing real-time iterations that keep full Armijo
    steps, tiny defects, and a passing quality gate — MPCCentroidal::Solve
    semantics (mpc/mpc_centroidal.cpp) on the RTI skeleton."""
    cfg = MPCConfig(num_nodes=6, num_phase_slots=4, phase_duration=0.5,
                    samples_per_stance=4, ee_node_start=1, ipm_iters=20,
                    init_run_iters=3, max_ls_iters=6, dt=0.05).validate()
    x0 = srb.reconstruct_state(PARAMS, Q0, jnp.zeros(MODEL.nv, jnp.float64))
    feet0 = rbd.ee_positions(MODEL, Q0)
    traj = default_trajectory(cfg, gait.make_standing(cfg), x0,
                              feet0[:, :2])
    x_des = srb.manifold_to_tangent(x0)
    st = centroidal.make_centroidal_state(
        cfg, MODEL, traj, jnp.asarray(cfg.ee_box_size, jnp.float64), Q0)
    st, stats = jax.jit(lambda s: centroidal.create_initial_run_centroidal(
        cfg, MODEL, PARAMS, s, x0, feet0, x_des))(st)
    assert bool(stats.solved)
    assert float(stats.defect_l1) < 1e-6
    assert float(stats.alpha) == 1.0
    step = jax.jit(lambda s, t: centroidal.solve_centroidal_step(
        cfg, MODEL, PARAMS, s, x0, t, feet0, x_des))
    for i in range(3):
        st, stats = step(st, jnp.asarray(0.05 * (i + 1), jnp.float64))
        assert bool(stats.solved), i
        assert float(stats.alpha) >= 0.5, i
        assert float(stats.defect_l1) < 1e-2, i
    # joint velocities stay inside the bounds (JointBox rows)
    assert float(jnp.abs(st.vj).max()) <= float(MODEL.velocity_limit[0])


def test_centroidal_fk_rows_fd_contract():
    """FD contract on the FK constraint rows (VERDICT r4 item 4): the
    joint-velocity jacobian block in the FK equalities must match finite
    differences of the foot positions w.r.t. the joints (the linearization
    the reference takes from Pinocchio, mpc/mpc_centroidal.cpp
    JointForwardKinematics)."""
    feet0 = rbd.ee_positions(MODEL, Q0)
    traj = default_trajectory(CFG, gait.make_trot(CFG), X0, feet0[:, :2])
    configs = jnp.stack([Q0] * (CFG.num_nodes + 1))
    x_des = srb.manifold_to_tangent(X0)
    cqp = centroidal.assemble_centroidal(
        CFG, MODEL, PARAMS, traj, configs, X0, jnp.array(0.0), feet0,
        x_des, jnp.asarray(CFG.ee_box_size, jnp.float64))
    N, nj, E = CFG.num_nodes, MODEL.num_joints, CFG.num_ee
    p0 = cqp.A.shape[0] - N * 3 * E
    # FK block for node k: rows p0 + k*3E .. p0 + (k+1)*3E over joint
    # velocity vars n_spline + k*nj ..
    k = 1
    blk = np.asarray(cqp.A[p0 + k * 3 * E:p0 + (k + 1) * 3 * E,
                           cqp.n_spline + k * nj:cqp.n_spline
                           + (k + 1) * nj])
    # finite-difference d(foot)/d(joint angle) at configs[k]
    eps = 1e-6
    qk = np.asarray(configs[k])
    J_fd = np.zeros((E, 3, nj))
    for j in range(nj):
        qp_ = qk.copy(); qp_[7 + j] += eps
        qm_ = qk.copy(); qm_[7 + j] -= eps
        J_fd[:, :, j] = (np.asarray(rbd.ee_positions(MODEL, jnp.asarray(qp_)))
                         - np.asarray(rbd.ee_positions(
                             MODEL, jnp.asarray(qm_)))) / (2 * eps)
    np.testing.assert_allclose(blk, J_fd.reshape(3 * E, nj), atol=1e-5)


import pytest


@pytest.mark.slow
def test_centroidal_closed_loop_stand():
    """Closed-loop standing acceptance for the centroidal RTI (VERDICT r4
    item 4 "done" bar): 1.5 s of on-device penalty physics + WBQP driven
    by solve_centroidal_step at the production standing recipe
    (force carrier + settled start + hysteresis contact latch, the same
    envelope the SRB 5 s stand runs in, test_sim_engine.py).  Bar: the
    same +-0.06 m height envelope as the SRB test, bounded drift.
    """
    from bilevel_gait_gen_tpu.control import mpc_controller, wbqp as wbqp_mod
    from bilevel_gait_gen_tpu.sim import engine as engine_mod

    cfg = MPCConfig(ipm_iters=18, force_carrier=True).validate()
    wb_cfg = wbqp_mod.WBQPConfig(torque_bound=30.0)
    sim = engine_mod.SimConfig()
    q0 = engine_mod.settled_stand(
        MODEL, sim, jnp.asarray(a1.stand_config(), jnp.float32))
    params = srb.make_srb_params(MODEL, q0)
    v0 = jnp.zeros(MODEL.nv, jnp.float32)
    x0 = srb.reconstruct_state(params, q0, v0)
    feet0 = rbd.ee_positions(MODEL, q0).astype(jnp.float32)
    traj = default_trajectory(cfg, gait.make_standing(cfg), x0,
                              feet0[:, :2])
    x_des = srb.manifold_to_tangent(x0)
    st = centroidal.make_centroidal_state(
        cfg, MODEL, traj, jnp.asarray(cfg.ee_box_size, jnp.float32), q0)
    st, stats0 = jax.jit(lambda s: centroidal.create_initial_run_centroidal(
        cfg, MODEL, params, s, x0, feet0, x_des))(st)
    assert bool(stats0.solved)

    control_dt, mpc_every, n_ticks = 0.001, 50, 1500
    sub_dt = control_dt / sim.substeps

    def tick(carry, i):
        q, v, stc, t0, mc = carry
        t = i.astype(jnp.float32) * control_dt
        feet_z = rbd.ee_positions(MODEL, q)[:, 2]
        enter = feet_z < sim.foot_radius + sim.contact_enter_margin
        stay = feet_z < sim.foot_radius + sim.contact_exit_margin
        mc = enter | (mc & stay)

        def do_mpc(args):
            q_, v_, s_, _ = args
            x_srb = srb.reconstruct_state(params, q_, v_)
            feet = rbd.ee_positions(MODEL, q_)
            s2, _ = centroidal.solve_centroidal_step(
                cfg, MODEL, params, s_, x_srb, t, feet, x_des)
            return s2, t

        stc, t0 = jax.lax.cond(i % mpc_every == 0, do_mpc,
                               lambda a: (a[2], a[3]), (q, v, stc, t0))
        tau = mpc_controller.control_action(MODEL, params, cfg, wb_cfg,
                                            stc.traj, q, v, t, t0, mc)

        def sub(c2, _):
            q_, v_ = c2
            return engine_mod.physics_step(MODEL, sim, q_, v_, tau,
                                           sub_dt), None

        (q, v), _ = jax.lax.scan(sub, (q, v), None, length=sim.substeps)
        return (q, v, stc, t0, mc), q

    mc0 = feet0[:, 2] < sim.foot_radius + sim.contact_enter_margin
    (qT, vT, _, _, _), qs = jax.jit(lambda c: jax.lax.scan(
        tick, c, jnp.arange(n_ticks)))(
        (q0, v0, st, jnp.asarray(0.0, jnp.float32), mc0))
    qs = np.asarray(qs)
    assert np.all(np.isfinite(qs))
    z0 = float(q0[2])
    # the SRB 5 s stand envelope (test_closed_loop_standing_5s): +-0.06 m
    assert qs[:, 2].min() > z0 - 0.06, qs[:, 2].min()
    assert qs[:, 2].max() < z0 + 0.06, qs[:, 2].max()
    assert np.abs(qs[:, 0:2]).max() < 0.10, np.abs(qs[:, 0:2]).max()
