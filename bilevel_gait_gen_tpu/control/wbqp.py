"""Whole-body QP torque controller (1 kHz low-level layer, L7).

Replaces controller::QPControl (controllers/qp_control.cpp): decision
variables [qddot (nv), lambda (3 per contact slot)], constraints
{floating-base dynamics, stationary contacts, torque limits, friction
pyramid + fz >= 0}, costs {leg PD tracking, torso PD (pos + ang), force
tracking} (design comment controllers/include/qp_control.h:14-47).  Contact
on/off becomes row masking (fixed shapes) instead of per-tick resizing, and
the QP reuses the same dense interior-point kernel as the MPC — so the
whole 1 kHz layer vmaps over scenario batches for on-device simulation.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from bilevel_gait_gen_tpu.models import rbd
from bilevel_gait_gen_tpu.models.rbd import RobotModel
from bilevel_gait_gen_tpu.ops import pdip
from bilevel_gait_gen_tpu.ops import quat as quat_ops
from bilevel_gait_gen_tpu.utils.precision import highest_matmul_precision


@dataclasses.dataclass(frozen=True)
class WBQPConfig:
    """Gains/weights from the reference YAML (apps/a1_configuration.yaml:
    base_pos_gains, base_ang_gains, kp/kd_joint_gains, *_tracking_weight)."""
    kd_base_pos: float = 3000.0
    kp_base_pos: float = 9000.0
    kd_base_ang: float = 100.0
    kp_base_ang: float = 1000.0
    kp_joint: float = 1200.0    # reference 20-node gain set (a1 yaml:104)
    kd_joint: float = 300.0
    leg_weight: float = 10.0
    torso_weight: float = 1000.0
    # the reference ships force_tracking_weight=1; closed-loop MuJoCo trot
    # is substantially more robust at 10 (delivered GRFs then track the MPC
    # plan through the zero-force phase transitions: 4 s+ in-place trot with
    # ~1 cm drift vs falling at weight 1), so that is the default
    force_weight: float = 10.0
    friction_coef: float = 0.5
    torque_bound: float = 30.0
    # reference uses the classical constraint J qdd = -Jdot qd (alpha = 0,
    # qp_control.cpp:198-222); a small alpha adds foot-velocity damping
    contact_damp: float = 0.0
    ipm_iters: int = 15


@highest_matmul_precision
def compute_torques(model: RobotModel, cfg: WBQPConfig, q: jax.Array,
                    v: jax.Array, contact: jax.Array, q_des: jax.Array,
                    v_des: jax.Array, f_des: jax.Array) -> jax.Array:
    """Solve the whole-body QP and recover joint torques [nj].

    contact: [E] bool flags — pass desired AND measured contact (the
    reference gates the stationary-contact rows on
    `contact.in_contact_ && des_contact_.in_contact_`,
    qp_control.cpp:207-210: constraining a foot that is not actually on the
    ground launches the leg into the floor and bounces the robot); f_des:
    [E, 3] MPC force targets (zeroed for swing legs).  Reference flow:
    QPControl::ComputeControlAction (qp_control.cpp:74-137) then
    RecoverControlInputs (:417+).
    """
    nv = model.nv
    nj = model.num_joints
    E = model.num_ee
    dtype = q.dtype
    n = nv + 3 * E

    M = rbd.mass_matrix(model, q)
    h = rbd.bias_forces(model, q, v)
    J = rbd.ee_jacobians(model, q)                     # [E, 3, nv]

    # Jdot v via jvp of the foot velocity along the configuration flow
    def foot_vel(dq):
        qq = rbd.integrate_config(q, dq)
        Jq = rbd.ee_jacobians(model, qq)
        return jnp.einsum('eiv,v->ei', Jq, v)

    _, Jdot_v = jax.jvp(foot_vel, (jnp.zeros(nv, dtype),), (v,))

    cm = contact.astype(dtype)                         # [E]

    # ---------------- equalities ------------------------------------------
    # floating-base dynamics: M_f qdd - sum_e J_e^T[:6] lam_e = -h_f
    A_dyn = jnp.zeros((6, n), dtype)
    A_dyn = A_dyn.at[:, :nv].set(M[:6])
    for e in range(E):
        A_dyn = A_dyn.at[:, nv + 3 * e: nv + 3 * (e + 1)].set(
            -J[e, :, :6].T * cm[e])
    b_dyn = -h[:6]

    # stationary contacts: J_e qdd = -Jdot v - alpha J v  (masked rows)
    Jv = jnp.einsum('eiv,v->ei', J, v)
    A_con = (J * cm[:, None, None]).reshape(3 * E, nv)
    A_con = jnp.concatenate([A_con, jnp.zeros((3 * E, 3 * E), dtype)], axis=1)
    b_con = ((-Jdot_v - cfg.contact_damp * Jv) * cm[:, None]).reshape(-1)
    # swing legs: pin lambda_e = 0 instead (their contact rows are masked)
    A_lam = jnp.zeros((3 * E, n), dtype)
    sw = (1.0 - cm)
    for e in range(E):
        A_lam = A_lam.at[3 * e: 3 * e + 3, nv + 3 * e: nv + 3 * e + 3].set(
            sw[e] * jnp.eye(3, dtype=dtype))
    A = jnp.concatenate([A_dyn, A_con, A_lam])
    b = jnp.concatenate([b_dyn, b_con, jnp.zeros(3 * E, dtype)])

    # ---------------- inequalities ----------------------------------------
    # torque limits: tau = M_a qdd + h_a - sum J^T[6:] lam in [-bound, bound]
    Jt_a = jnp.concatenate([(J[e, :, 6:].T * cm[e]) for e in range(E)],
                           axis=1)                      # [nj, 3E]
    T_rows = jnp.concatenate([M[6:], -Jt_a], axis=1)    # [nj, n]
    G_tau = jnp.concatenate([T_rows, -T_rows])
    h_tau = jnp.concatenate([cfg.torque_bound - h[6:],
                             cfg.torque_bound + h[6:]])

    # friction pyramid + fz >= 0 on stance feet (masked for swing)
    pyr = jnp.array([[1, 0, -cfg.friction_coef],
                     [-1, 0, -cfg.friction_coef],
                     [0, 1, -cfg.friction_coef],
                     [0, -1, -cfg.friction_coef],
                     [0, 0, -1.0]], dtype)
    G_fr = jnp.zeros((5 * E, n), dtype)
    for e in range(E):
        G_fr = G_fr.at[5 * e: 5 * e + 5, nv + 3 * e: nv + 3 * e + 3].set(
            pyr * cm[e])
    h_fr = jnp.zeros(5 * E, dtype)

    G = jnp.concatenate([G_tau, G_fr])
    h_vec = jnp.concatenate([h_tau, h_fr])

    # ---------------- costs -----------------------------------------------
    # desired accelerations (PD): legs + torso (AddLegTrackingCost /
    # AddTorsoCost, qp_control.cpp:273-322)
    qdd_des_j = (cfg.kp_joint * (q_des[7:] - q[7:])
                 + cfg.kd_joint * (v_des[6:] - v[6:]))
    base_pos_err = q_des[0:3] - q[0:3]
    base_ang_err = quat_ops.log3(quat_ops.multiply(
        quat_ops.conjugate(q[3:7]), quat_ops.normalize(q_des[3:7])))
    qdd_des_b = jnp.concatenate([
        cfg.kp_base_pos * base_pos_err + cfg.kd_base_pos * (v_des[0:3] - v[0:3]),
        cfg.kp_base_ang * base_ang_err + cfg.kd_base_ang * (v_des[3:6] - v[3:6]),
    ])

    wt = jnp.concatenate([jnp.full(6, cfg.torso_weight, dtype),
                          jnp.full(nj, cfg.leg_weight, dtype)])
    qdd_des = jnp.concatenate([qdd_des_b, qdd_des_j])
    wf = jnp.full(3 * E, cfg.force_weight, dtype)
    H = jnp.diag(jnp.concatenate([wt, wf])) + 1e-6 * jnp.eye(n, dtype=dtype)
    qlin = jnp.concatenate([-wt * qdd_des, -wf * (f_des.reshape(-1))])

    sol = pdip.solve(H, qlin, A, b, G, h_vec, iters=cfg.ipm_iters, tol=1e-8)
    qdd = sol.x[:nv]
    lam = sol.x[nv:].reshape(E, 3) * cm[:, None]

    # torque recovery by inverse dynamics (RecoverControlInputs)
    tau = M[6:] @ qdd + h[6:] - jnp.einsum('eiv,ei->v', J[:, :, 6:], lam)
    return jnp.clip(tau, -cfg.torque_bound, cfg.torque_bound)


@highest_matmul_precision
def pd_grav_comp(model: RobotModel, q: jax.Array, v: jax.Array,
                 q_des: jax.Array, v_des: jax.Array,
                 kp: float = 60.0, kd: float = 5.0) -> jax.Array:
    """Standing fallback: PD + gravity compensation
    (controllers/pd_grav_comp.cpp:1-124)."""
    g = rbd.bias_forces(model, q, jnp.zeros(model.nv, q.dtype))
    return (kp * (q_des[7:] - q[7:]) + kd * (v_des[6:] - v[6:]) + g[6:])
