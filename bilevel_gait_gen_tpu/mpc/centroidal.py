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
    vb = jnp.tile(model.velocity_limit, (N,))
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
