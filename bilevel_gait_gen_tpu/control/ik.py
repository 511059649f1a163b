"""Damped-least-squares inverse kinematics as a fixed-iteration scan (L7).

Replaces SingleRigidBodyModel::InverseKinematics
(mpc/models/single_rigid_body_model.cpp:314-425): match the floating base to
the SRB state and each foot to its spline target, iterating a damped
Gauss-Newton step with joint-limit clamping.  Fixed iteration count so it
jits/vmaps cleanly (the controller calls it at 1 kHz on interpolated MPC
targets, controllers/mpc_controller.cpp:414-511).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from bilevel_gait_gen_tpu.models import rbd
from bilevel_gait_gen_tpu.models.rbd import RobotModel
from bilevel_gait_gen_tpu.ops import quat as quat_ops


def solve_ik(model: RobotModel, base_pos: jax.Array, base_quat: jax.Array,
             feet_des: jax.Array, q_guess: jax.Array, *,
             iters: int = 15, damping: float = 1e-4) -> jax.Array:
    """Whole-body configuration tracking base pose + foot positions.

    base_pos [3], base_quat [4] (xyzw), feet_des [E, 3]; q_guess [nq].
    The base part of the result is pinned exactly; joints solve the foot
    targets by damped least squares on the EE jacobian block.
    """
    nj = model.num_joints

    def body(qj, _):
        q = jnp.concatenate([base_pos, base_quat, qj])
        feet = rbd.ee_positions(model, q)                 # [E, 3]
        J = rbd.ee_jacobians(model, q)[:, :, 6:]          # [E, 3, nj]
        r = (feet_des - feet).reshape(-1)                 # [3E]
        Jf = J.reshape(-1, nj)                            # [3E, nj]
        # damped least squares: dq = J^T (J J^T + lam I)^{-1} r
        JJt = Jf @ Jf.T + damping * jnp.eye(Jf.shape[0], dtype=qj.dtype)
        dq = Jf.T @ jnp.linalg.solve(JJt, r)
        qj_new = jnp.clip(qj + dq, model.joint_lower, model.joint_upper)
        return qj_new, jnp.linalg.norm(r)

    qj, res = jax.lax.scan(body, q_guess[7:], None, length=iters)
    return jnp.concatenate([base_pos, quat_ops.normalize(base_quat), qj])


def ik_velocities(model: RobotModel, q: jax.Array, base_vel: jax.Array,
                  base_omega: jax.Array, feet_vel: jax.Array,
                  damping: float = 1e-6) -> jax.Array:
    """Generalized velocity consistent with base twist + foot velocities.

    Reference: MPCController::GetTargetsFromTraj differentiates the IK
    solution numerically; here the velocity-level problem is solved exactly:
    J_j qdot_j = v_foot - J_base [v; w].
    """
    nj = model.num_joints
    J = rbd.ee_jacobians(model, q)                        # [E, 3, nv]
    base_tw = jnp.concatenate([base_vel, base_omega])
    r = (feet_vel - jnp.einsum('eiv,v->ei', J[:, :, :6], base_tw)).reshape(-1)
    Jj = J[:, :, 6:].reshape(-1, nj)
    JJt = Jj @ Jj.T + damping * jnp.eye(Jj.shape[0], dtype=q.dtype)
    qd_j = Jj.T @ jnp.linalg.solve(JJt, r)
    return jnp.concatenate([base_vel, base_omega, qd_j])
