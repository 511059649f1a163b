"""Centroidal-dynamics MPC variant (the reference's MPCCentroidal, #3/#4).

TPU-native re-design of mpc/mpc_centroidal.cpp + models/centroidal_model.cpp:
the same condensed-QP machinery as the SRB path, with two centroidal
upgrades:

* configuration-dependent rotational inertia: Ir_k is the composite
  rigid-body inertia about the COM evaluated at each node's full-body
  configuration (the role of Pinocchio's centroidal momentum map in the
  reference), instead of the SRB's constant nominal inertia;
* joint velocities as decision variables, tied to the foot splines by
  linearized forward-kinematics constraints J(q_k) [v_base; v_j] = ee_vel
  (reference Constraints::JointForwardKinematics) and box-bounded
  (Constraints::JointBox / vel_bounds).

Decision vector: u_c = [spline vars (as SRB) | v_j for nodes 0..N-1].
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bilevel_gait_gen_tpu.mpc import qp as qp_mod
from bilevel_gait_gen_tpu.mpc.trajectory import Trajectory, ravel_u
from bilevel_gait_gen_tpu.models import rbd, srb
from bilevel_gait_gen_tpu.models.rbd import RobotModel
from bilevel_gait_gen_tpu.ops import pdip, spline
from bilevel_gait_gen_tpu.utils.config import MPCConfig


class CentroidalQP(NamedTuple):
    base: qp_mod.CondensedQP   # spline-variable part (with per-node Ir)
    H: jax.Array               # full H incl. joint-velocity block
    q: jax.Array
    A: jax.Array
    b: jax.Array
    G: jax.Array
    h: jax.Array
    n_spline: int


def node_inertias(model: RobotModel, configs: jax.Array) -> jax.Array:
    """[N+1, 3, 3] composite inertia about the COM per node configuration
    (replaces the CMM evaluation, centroidal_model.cpp)."""
    return jax.vmap(lambda q: rbd.composite_inertia_about_com(model, q))(
        configs)


def assemble_centroidal(cfg: MPCConfig, model: RobotModel,
                        params: srb.SRBParams, traj: Trajectory,
                        configs: jax.Array, x0_man: jax.Array,
                        t0: jax.Array, ee_pos0: jax.Array,
                        x_des_tan: jax.Array, ee_box_size: jax.Array,
                        vel_weight: float = 0.1) -> CentroidalQP:
    """Build the centroidal QP.

    configs: [N+1, nq] whole-body configurations along the previous
    trajectory (IK output; reference keeps them in Trajectory
    full_config_).  The spline-variable block reuses the SRB assembly with
    the PER-NODE composite inertia Ir_k in the dynamics linearization
    (assemble's node_inertia path); the joint-velocity block appends FK
    equality rows and velocity bounds.
    """
    N = cfg.num_nodes
    dt = cfg.dt
    dtype = x0_man.dtype
    E = cfg.num_ee
    nj = model.num_joints
    nv_blk = N * nj

    # per-node inertia: configuration-dependent Ir_k in the dynamics
    # linearization itself (reference MPCCentroidal evaluates the CMM at
    # each node's configuration), plus the mean for the velocity-coupling
    # rows below
    Irs = node_inertias(model, configs)                  # [N+1, 3, 3]
    Ir_mean = jnp.mean(Irs, axis=0)
    params_c = dataclasses.replace(
        params, inertia=Ir_mean, inertia_inv=jnp.linalg.inv(Ir_mean))

    base = qp_mod.assemble(cfg, params, traj, x0_man, t0, ee_pos0,
                           x_des_tan, ee_box_size, node_inertia=Irs)
    n_s = base.H.shape[0]
    n = n_s + nv_blk

    # ---- extend cost: small quadratic on joint velocities ----------------
    H = jnp.zeros((n, n), dtype)
    H = H.at[:n_s, :n_s].set(base.H)
    H = H.at[n_s:, n_s:].set(
        (vel_weight + cfg.diag_reg) * jnp.eye(nv_blk, dtype=dtype))
    q = jnp.concatenate([base.q, jnp.zeros(nv_blk, dtype)])

    # ---- FK velocity constraints (JointForwardKinematics) ----------------
    # J_j(q_k) v_j[k] = ee_vel_spline(t_k) - J_base(q_k) v_base(x_k)
    # linearized at the previous configs; v_base from the SRB state map.
    times = t0 + dt * jnp.arange(N, dtype=dtype)

    def fk_rows(k):
        qk = configs[k]
        J = rbd.ee_jacobians(model, qk)                  # [E, 3, 6+nj]
        # spline foot velocity at t_k (finite difference of the pure eval)
        eps = jnp.asarray(1e-4, dtype)
        f0 = spline.foot_positions_all(traj.sched.bounds, traj.footholds,
                                       times[k], cfg.swing_height,
                                       cfg.foot_offset)
        f1 = spline.foot_positions_all(traj.sched.bounds, traj.footholds,
                                       times[k] + eps, cfg.swing_height,
                                       cfg.foot_offset)
        ee_vel = (f1 - f0) / eps                         # [E, 3]
        # base twist from the tangent state at node k: v = h/m, omega from w
        x_k = srb.manifold_to_tangent(traj.x_man[k])
        v_base = x_k[3:6] / params.mass
        omega = params_c.inertia_inv @ x_k[9:12]
        tw = jnp.concatenate([v_base, omega])
        rhs = (ee_vel - jnp.einsum('eiv,v->ei', J[:, :, :6], tw)).reshape(-1)
        return J[:, :, 6:].reshape(3 * E, nj), rhs

    J_blocks, rhs_blocks = jax.vmap(fk_rows)(jnp.arange(N))
    # model constants (jacobians, velocity limits) may be f64 under x64;
    # pin the QP to the state dtype so downstream scans stay type-stable
    J_blocks = J_blocks.astype(dtype)
    rhs_blocks = rhs_blocks.astype(dtype)
    # block-diagonal FK rows over nodes
    A_fk = jnp.zeros((N, 3 * E, N, nj), dtype)
    idx_k = jnp.arange(N)
    A_fk = A_fk.at[idx_k, :, idx_k].set(J_blocks)
    A_fk = A_fk.reshape(N * 3 * E, nv_blk)
    A_fk_full = jnp.concatenate(
        [jnp.zeros((A_fk.shape[0], n_s), dtype), A_fk], axis=1)
    b_fk = rhs_blocks.reshape(-1)

    p0 = base.A.shape[0]
    A = jnp.zeros((p0 + A_fk_full.shape[0], n), dtype)
    A = A.at[:p0, :n_s].set(base.A)
    A = A.at[p0:].set(A_fk_full)
    b = jnp.concatenate([base.b, b_fk])

    # ---- inequalities: base rows + velocity bounds (vel_bounds yaml) -----
    m0 = base.G.shape[0]
    vb = jnp.tile(model.velocity_limit.astype(dtype), (N,))
    G = jnp.zeros((m0 + 2 * nv_blk, n), dtype)
    G = G.at[:m0, :n_s].set(base.G)
    G = G.at[m0:m0 + nv_blk, n_s:].set(jnp.eye(nv_blk, dtype=dtype))
    G = G.at[m0 + nv_blk:, n_s:].set(-jnp.eye(nv_blk, dtype=dtype))
    h = jnp.concatenate([base.h, vb, vb])

    return CentroidalQP(base=base, H=H, q=q, A=A, b=b, G=G, h=h,
                        n_spline=n_s)


def solve_centroidal(cqp: CentroidalQP, *, iters: int = 25,
                     tol: float = 1e-9):
    """Solve the centroidal QP; returns (spline vars u, joint vels [N, nj],
    solution)."""
    sol = pdip.solve(cqp.H, cqp.q, cqp.A, cqp.b, cqp.G, cqp.h, iters=iters,
                     tol=tol)
    u = sol.x[:cqp.n_spline]
    vj = sol.x[cqp.n_spline:]
    return u, vj, sol


# ----------------------------------------------------------------------------
# Real-time-iteration loop for the centroidal variant (VERDICT r4 item 4:
# promote the one-shot assembly to a full MPC — reference MPCCentroidal::
# Solve, mpc/mpc_centroidal.cpp, same SQP skeleton as the SRB path)
# ----------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CentroidalState:
    """Warm-start carry of the centroidal RTI (the reference's prev_traj_/
    prev_qp_sol_ for MPCCentroidal, mpc/include/mpc_centroidal.h:15-225)."""
    traj: Trajectory
    ee_box: jax.Array
    configs: jax.Array                       # [N+1, nq] node configurations
    qp_warm: "pdip.QPSolution | None" = None
    vj: "jax.Array | None" = None            # [N, nj] last joint velocities


def make_centroidal_state(cfg: MPCConfig, model: RobotModel,
                          traj: Trajectory, ee_box: jax.Array,
                          q0: jax.Array) -> CentroidalState:
    """Fresh centroidal carry: node configs seeded with q0, zero joint
    velocities (filled by the first solve)."""
    N = cfg.num_nodes
    return CentroidalState(
        traj=traj, ee_box=ee_box,
        configs=jnp.stack([q0] * (N + 1)),
        vj=jnp.zeros((N, model.num_joints), ee_box.dtype))


def ik_node_configs(model: RobotModel, cfg: MPCConfig, params: srb.SRBParams,
                    traj: Trajectory, t0: jax.Array,
                    q_guess: jax.Array) -> jax.Array:
    """[N+1, nq] whole-body configurations along the trajectory via DLS IK
    (the reference's Trajectory full-body config arrays, mpc/include/
    trajectory.h:165-166, filled by IK from the SRB plan)."""
    from bilevel_gait_gen_tpu.control import ik as ik_mod
    from bilevel_gait_gen_tpu.ops import quat as quat_ops
    N = cfg.num_nodes
    dtype = q_guess.dtype
    times = t0 + cfg.dt * jnp.arange(N + 1, dtype=dtype)

    def one(x_man, t):
        feet = spline.foot_positions_all(traj.sched.bounds, traj.footholds,
                                         t, cfg.swing_height, cfg.foot_offset)
        quat = quat_ops.normalize(x_man[6:10])
        base_pos = x_man[0:3] - quat_ops.to_matrix(quat) @ params.com_offset
        return ik_mod.solve_ik(model, base_pos, quat, feet, q_guess)

    return jax.vmap(one)(traj.x_man, times)


def _defect_l1_centroidal(cfg: MPCConfig, params: srb.SRBParams,
                          Irs: jax.Array, xs_tan: jax.Array, f_nodes,
                          footholds, bounds, t0) -> jax.Array:
    """L1 nonlinear integration defect with the PER-NODE composite inertia
    (the centroidal model's configuration-dependent Ir_k; merit analog of
    solver._defect_l1 / reference GetEqualityConstraintValues)."""
    dt = cfg.dt
    times = t0 + dt * jnp.arange(cfg.num_nodes, dtype=xs_tan.dtype)
    Ir_inv = jnp.linalg.inv(Irs)

    def node_defect(k):
        params_k = dataclasses.replace(params, inertia=Irs[k],
                                       inertia_inv=Ir_inv[k])
        x_next = srb.discrete_step(params_k, xs_tan[k], f_nodes, footholds,
                                   bounds, times[k], dt, cfg)
        return xs_tan[k + 1] - x_next

    d = jax.vmap(node_defect)(jnp.arange(cfg.num_nodes))
    return jnp.sum(jnp.abs(d))


def solve_centroidal_step(cfg: MPCConfig, model: RobotModel,
                          params: srb.SRBParams, state: CentroidalState,
                          x0_man: jax.Array, t0: jax.Array,
                          ee_pos0: jax.Array, x_des_tan: jax.Array,
                          shift_window: bool = True):
    """One centroidal real-time iteration: window shift, node IK,
    per-node-inertia relinearization, QP (splines + joint velocities under
    FK rows), L1-merit Armijo line search, convex update, quality gate —
    the MPCCentroidal::Solve loop (mpc/mpc_centroidal.cpp) on the same
    RTI skeleton as mpc/solver.py::solve_step.

    Returns (CentroidalState, solver.SolveStats).
    """
    from bilevel_gait_gen_tpu.mpc import gait as gait_mod
    from bilevel_gait_gen_tpu.mpc import solver as solver_mod
    from bilevel_gait_gen_tpu.mpc.trajectory import make_unravel

    traj = state.traj
    unravel = make_unravel(cfg)
    dtype = x0_man.dtype
    N = cfg.num_nodes
    nj = model.num_joints

    if shift_window:
        n_past = gait_mod.past_cycles(traj.sched, t0)
        sched = gait_mod.advance_window(traj.sched, t0, cfg)
        f_nodes, footholds = gait_mod.roll_spline_vars(
            traj.f_nodes, traj.footholds, n_past)
        traj = Trajectory(x_man=traj.x_man, f_nodes=f_nodes,
                          footholds=footholds, sched=sched)

    # node configurations by IK from the (shifted) plan — the linearization
    # point for the composite inertia and the FK rows
    configs = ik_node_configs(model, cfg, params, traj, t0,
                              state.configs[0])
    Irs = node_inertias(model, configs)

    cqp = assemble_centroidal(cfg, model, params, traj, configs, x0_man,
                              t0, ee_pos0, x_des_tan, state.ee_box)
    sol = pdip.solve(cqp.H, cqp.q, cqp.A, cqp.b, cqp.G, cqp.h,
                     iters=cfg.ipm_iters, tol=cfg.ipm_tol,
                     warm=state.qp_warm)

    n_s = cqp.n_spline
    u_prev = ravel_u(traj.f_nodes, traj.footholds)
    xs_prev = jax.vmap(srb.manifold_to_tangent)(traj.x_man)
    u_star = sol.x[:n_s]
    vj_star = sol.x[n_s:].reshape(N, nj)
    xs_star = qp_mod.recover_states(cqp.base, u_star)
    p_u = u_star - u_prev
    p_x = xs_star - xs_prev

    # merit line search on the per-node-inertia defect (same Armijo policy
    # as the SRB RTI)
    mu = jnp.asarray(cfg.merit_mu, dtype)

    def merit_at(alpha):
        u_a = u_prev + alpha * p_u
        xs_a = xs_prev + alpha * p_x
        fn_a, fh_a = unravel(u_a)
        defect = _defect_l1_centroidal(cfg, params, Irs, xs_a, fn_a, fh_a,
                                       traj.sched.bounds, t0)
        cost = qp_mod.cost_value(cfg, xs_a, u_a, x_des_tan)
        return mu * defect + cost, defect, cost

    alphas = 0.5 ** jnp.arange(cfg.max_ls_iters + 1, dtype=dtype)
    merits, defects, costs = jax.vmap(merit_at)(alphas)
    merit0, defect0, cost0 = merit_at(jnp.zeros((), dtype))

    scale = 1.0 + jnp.maximum(jnp.max(jnp.abs(cqp.q)), jnp.abs(cost0))
    good = ((sol.gap < 1e-3 * scale) & (sol.pri_res < 1e-3 * scale)
            & jnp.all(jnp.isfinite(sol.x)))

    grad_cost = cqp.H[:n_s, :n_s] @ u_prev + cqp.q[:n_s]
    dir_deriv = jnp.dot(grad_cost, p_u) - mu * defect0
    armijo_ok = (merit0 - merits) >= -1e-5 * alphas * dir_deriv
    first_ok = jnp.argmax(armijo_ok)
    alpha = jnp.where(jnp.any(armijo_ok), alphas[first_ok],
                      jnp.zeros((), dtype))
    alpha = jnp.where(good, alpha, jnp.zeros((), dtype))

    u_new = jnp.where(good, u_prev + alpha * p_u, u_prev)
    xs_new = jnp.where(good, xs_prev + alpha * p_x, xs_prev)
    fn_new, fh_new = unravel(u_new)
    x_man_new = jax.vmap(srb.tangent_to_manifold)(xs_new)
    traj_new = Trajectory(x_man=x_man_new, f_nodes=fn_new,
                          footholds=fh_new, sched=traj.sched)

    nominal = jnp.asarray(cfg.ee_box_size, dtype)
    ee_box = jnp.where(good,
                       jnp.maximum(nominal, state.ee_box - 0.05),
                       state.ee_box + 0.05)

    new_warm = None
    if state.qp_warm is not None:
        reset = good & (alpha == 0.0)
        new_warm = sol._replace(
            gap=jnp.where(reset, jnp.asarray(jnp.inf, dtype), sol.gap))

    sel = jnp.argmin(jnp.abs(alphas - alpha))
    at0 = alpha == 0.0
    stats = solver_mod.SolveStats(
        cost=jnp.where(at0, cost0, costs[sel]),
        merit=jnp.where(at0, merit0, merits[sel]),
        defect_l1=jnp.where(at0, defect0, defects[sel]),
        step_norm=jnp.linalg.norm(p_u) * alpha, alpha=alpha,
        qp_gap=sol.gap, qp_pri=sol.pri_res, qp_dua=sol.dua_res,
        solved=good)
    # carry structure must match the input's (scan): vj stays None if the
    # caller did not allocate it (make_centroidal_state does)
    vj_out = None
    if state.vj is not None:
        vj_out = jnp.where(good, vj_star, state.vj)
    new_state = CentroidalState(traj=traj_new, ee_box=ee_box,
                                configs=configs, qp_warm=new_warm,
                                vj=vj_out)
    return new_state, stats


def create_initial_run_centroidal(cfg: MPCConfig, model: RobotModel,
                                  params: srb.SRBParams,
                                  state: CentroidalState, x0_man: jax.Array,
                                  ee_pos0: jax.Array, x_des_tan: jax.Array,
                                  t0: jax.Array | float = 0.0):
    """SQP-to-convergence init for the centroidal RTI (MPC::CreateInitialRun
    cadence, <= cfg.init_run_iters iterations)."""
    t0 = jnp.asarray(t0, x0_man.dtype)

    def body(st, _):
        st, stats = solve_centroidal_step(cfg, model, params, st, x0_man,
                                          t0, ee_pos0, x_des_tan,
                                          shift_window=False)
        return st, stats

    state, stats = jax.lax.scan(body, state, None, length=cfg.init_run_iters)
    return state, jax.tree.map(lambda a: a[-1], stats)
