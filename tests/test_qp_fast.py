"""Fast (closed-form weights) vs autodiff reference QP assembly.

assemble() must produce the same condensed QP as assemble_ad() — same H, q,
A, b, G, h up to float tolerance — including after an SQP step (nonzero
spline vars) and under differentiation w.r.t. the contact times.
"""
import jax
import jax.numpy as jnp
import numpy as np

from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import gait, qp as qp_mod, solver
from bilevel_gait_gen_tpu.mpc.gait import GaitSchedule
from bilevel_gait_gen_tpu.mpc.trajectory import Trajectory, default_trajectory
from bilevel_gait_gen_tpu.utils.config import MPCConfig

CFG = MPCConfig().validate()
MODEL = a1.make_a1()
Q0 = jnp.array(a1.stand_config(), dtype=jnp.float64)
PARAMS = srb.make_srb_params(MODEL, Q0)
X0 = srb.reconstruct_state(PARAMS, Q0, jnp.zeros(MODEL.nv, jnp.float64))


def _setup(perturb=False):
    feet0 = rbd.ee_positions(MODEL, Q0)
    traj = default_trajectory(CFG, gait.make_trot(CFG), X0, feet0[:, :2])
    if perturb:
        rng = np.random.default_rng(0)
        traj = Trajectory(
            x_man=traj.x_man + 0.01 * jnp.asarray(
                rng.standard_normal(traj.x_man.shape)),
            f_nodes=traj.f_nodes + jnp.asarray(
                rng.standard_normal(traj.f_nodes.shape)),
            footholds=traj.footholds + 0.02 * jnp.asarray(
                rng.standard_normal(traj.footholds.shape)),
            sched=traj.sched)
    return traj, feet0


def _compare(traj, feet0, t0):
    x_des = srb.manifold_to_tangent(X0)
    box = jnp.asarray(CFG.ee_box_size, jnp.float64)
    qp_f = qp_mod.assemble(CFG, PARAMS, traj, X0, t0, feet0, x_des, box)
    qp_a = qp_mod.assemble_ad(CFG, PARAMS, traj, X0, t0, feet0, x_des, box)
    for name, a, b in [("H", qp_f.H, qp_a.H), ("q", qp_f.q, qp_a.q),
                       ("A", qp_f.A, qp_a.A), ("b", qp_f.b, qp_a.b),
                       ("G", qp_f.G, qp_a.G), ("h", qp_f.h, qp_a.h),
                       ("S", qp_f.S, qp_a.S), ("c", qp_f.c, qp_a.c)]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7,
            rtol=1e-6, err_msg=f"mismatch in {name}")


def test_fast_assembly_matches_ad_initial():
    traj, feet0 = _setup(perturb=False)
    _compare(traj, feet0, jnp.array(0.0))


def test_fast_assembly_matches_ad_perturbed():
    traj, feet0 = _setup(perturb=True)
    _compare(traj, feet0, jnp.array(0.0))


def test_fast_assembly_matches_ad_shifted_window():
    """After a receding-horizon shift (mid-phase t0)."""
    traj, feet0 = _setup(perturb=True)
    _compare(traj, feet0, jnp.array(0.17))


def test_fast_assembly_grad_wrt_bounds_matches():
    """d(QP objective at fixed u)/d(theta) agrees between the two paths."""
    traj, feet0 = _setup(perturb=True)
    x_des = srb.manifold_to_tangent(X0)
    box = jnp.asarray(CFG.ee_box_size, jnp.float64)
    u = jnp.asarray(np.random.default_rng(1).standard_normal(CFG.num_u))

    def obj(asm, bounds):
        t2 = Trajectory(x_man=traj.x_man, f_nodes=traj.f_nodes,
                        footholds=traj.footholds,
                        sched=GaitSchedule(bounds=bounds))
        qp = asm(CFG, PARAMS, t2, X0, jnp.array(0.0), feet0, x_des, box)
        return 0.5 * u @ qp.H @ u + qp.q @ u + jnp.sum(qp.G @ u - qp.h)

    g_f = jax.grad(lambda b: obj(qp_mod.assemble, b))(traj.sched.bounds)
    g_a = jax.grad(lambda b: obj(qp_mod.assemble_ad, b))(traj.sched.bounds)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_a), atol=1e-5,
                               rtol=1e-4)


def test_raibert_rows_match_and_constrain():
    """Raibert heuristic (AddRaibertHeuristic, mpc_single_rigid_body.cpp:
    939-1017): fast and autodiff assemblies agree, the extra rows appear
    only with the flag on, and an active row evaluates to
    foot_xy(td) - com_xy(node) - kappa h_xy(node) = hip_offset."""
    import dataclasses
    rcfg = dataclasses.replace(CFG, raibert=True, raibert_vel_gain=0.1)
    traj, feet0 = _setup(perturb=True)
    x_des = srb.manifold_to_tangent(X0)
    box = jnp.asarray(CFG.ee_box_size, jnp.float64)
    t0 = jnp.array(0.0)
    qp_f = qp_mod.assemble(rcfg, PARAMS, traj, X0, t0, feet0, x_des, box)
    qp_a = qp_mod.assemble_ad(rcfg, PARAMS, traj, X0, t0, feet0, x_des, box)
    np.testing.assert_allclose(np.asarray(qp_f.A), np.asarray(qp_a.A),
                               atol=1e-7, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(qp_f.b), np.asarray(qp_a.b),
                               atol=1e-7, rtol=1e-6)

    qp_off = qp_mod.assemble(CFG, PARAMS, traj, X0, t0, feet0, x_des, box)
    E = CFG.num_ee
    NT = traj.sched.bounds[:, 0::2].shape[1]
    assert qp_f.A.shape[0] == qp_off.A.shape[0] + E * NT * 2

    # semantic check on one active row: EE 1 (starts in contact) has its
    # second touchdown (even boundary index 2) inside the horizon
    ee, j = 1, 1
    td_t = float(traj.sched.bounds[ee, 2 * j])
    assert 0.0 < td_t < CFG.horizon
    node = int(np.floor(td_t / CFG.dt - 1e-2 / CFG.dt))
    t_st = float(traj.sched.bounds[ee, 2 * j + 1] - traj.sched.bounds[ee, 2 * j])
    kappa = rcfg.raibert_vel_gain * t_st / (2.0 * float(PARAMS.mass))
    row0 = qp_off.A.shape[0] + (ee * NT + j) * 2
    u = jnp.asarray(np.random.default_rng(2).standard_normal(CFG.num_u))
    from bilevel_gait_gen_tpu.ops import spline as spline_mod
    _, fh = qp_mod.make_unravel(rcfg)(u)
    foot = spline_mod.foot_position(traj.sched.bounds[ee], fh[ee],
                                    jnp.asarray(td_t), rcfg.swing_height,
                                    rcfg.foot_offset)[:2]
    x_node = qp_f.S[node] @ u + qp_f.c[node]
    expect = foot - x_node[0:2] - kappa * x_node[3:5]
    got = qp_f.A[row0:row0 + 2] @ u - qp_f.b[row0:row0 + 2] \
        + np.asarray(PARAMS.hip_offset_raw)[ee]
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=1e-6, rtol=1e-5)
