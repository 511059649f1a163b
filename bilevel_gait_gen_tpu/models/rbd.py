"""Minimal rigid-body kinematics/dynamics in pure JAX.

TPU-native replacement for the reference's Pinocchio dependency (reference:
mpc/models/model.cpp — URDF load, frame map, EE jacobians, operational-space
inertia, nonlinear effects; mpc/models/centroidal_model.cpp — CMM/composite
inertia).  Instead of porting Featherstone recursions imperatively, we lean
on autodiff:

* forward kinematics is a pure function of the configuration;
* geometric Jacobians are ``jax.jacfwd`` of FK through an exponential
  perturbation of the floating base (so they are proper *geometric*
  jacobians, not quaternion-coordinate ones);
* the joint-space mass matrix is assembled as sum_i J_i^T M_i J_i (all small
  dense matmuls -> MXU-friendly and trivially vmapped);
* Coriolis/gravity bias is derived from the Lagrangian with jvp/grad
  (h = Mdot v - dT/dq + g), replacing RNEA.

Conventions: configurations q = [p_base(3), quat_xyzw(4), q_joints(nj)];
velocities v = [v_base_world(3), omega_base_body(3), qd_joints(nj)].
The kinematic tree is static Python data (hashable) so models can be closed
over in jitted functions; only numeric arrays live in the pytree.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bilevel_gait_gen_tpu.ops import quat as quat_ops

GRAVITY = jnp.array([0.0, 0.0, -9.81])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RobotModel:
    """Kinematic tree with one floating base link (index 0) + revolute joints.

    Static (metadata) fields describe the topology; array fields carry the
    numeric parameters.  Fixed joints are folded into their parent links at
    build time (see urdf.py).
    """
    # static topology
    parent: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    ee_link: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    hip_link: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    ee_names: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))
    joint_names: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))

    # per-link numeric parameters; link 0 is the floating base.
    joint_trans: jax.Array     # [L, 3] joint origin in parent frame
    joint_axis: jax.Array      # [L, 3] revolute axis in child frame (row 0 unused)
    mass: jax.Array            # [L]
    com: jax.Array             # [L, 3] link COM in link frame
    inertia: jax.Array         # [L, 3, 3] rotational inertia about link COM
    ee_offset: jax.Array       # [E, 3] end-effector point in its link frame
    joint_lower: jax.Array     # [nj]
    joint_upper: jax.Array     # [nj]
    effort_limit: jax.Array    # [nj]
    velocity_limit: jax.Array  # [nj]

    @property
    def num_links(self) -> int:
        return len(self.parent)

    @property
    def num_joints(self) -> int:
        return len(self.parent) - 1

    @property
    def nv(self) -> int:
        return 6 + self.num_joints

    @property
    def nq(self) -> int:
        return 7 + self.num_joints

    @property
    def num_ee(self) -> int:
        return len(self.ee_link)

    @property
    def total_mass(self) -> jax.Array:
        return jnp.sum(self.mass)


# ----------------------------------------------------------------------------
# Forward kinematics
# ----------------------------------------------------------------------------

def fk_links(model: RobotModel, q: jax.Array) -> tuple[jax.Array, jax.Array]:
    """World rotation [L, 3, 3] and position [L, 3] of every link frame."""
    base_p = q[0:3]
    base_R = quat_ops.to_matrix(quat_ops.normalize(q[3:7]))
    qj = q[7:]

    Rs = [base_R]
    ps = [base_p]
    for i in range(1, model.num_links):
        par = model.parent[i]
        Rp, pp = Rs[par], ps[par]
        p_i = pp + Rp @ model.joint_trans[i]
        ang = qj[i - 1]
        R_joint = _axis_angle_matrix(model.joint_axis[i], ang)
        Rs.append(Rp @ R_joint)
        ps.append(p_i)
    return jnp.stack(Rs), jnp.stack(ps)


def _axis_angle_matrix(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Rodrigues rotation about a (unit) axis."""
    K = quat_ops.skew(axis)
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3, dtype=axis.dtype) + s * K + (1.0 - c) * (K @ K)


def ee_positions(model: RobotModel, q: jax.Array) -> jax.Array:
    """[E, 3] world positions of the end-effector points."""
    Rs, ps = fk_links(model, q)
    links = jnp.array(model.ee_link)
    R_ee = Rs[links]
    p_ee = ps[links]
    return p_ee + jnp.einsum('eij,ej->ei', R_ee, model.ee_offset)


def hip_positions(model: RobotModel, q: jax.Array) -> jax.Array:
    """[E, 3] world positions of the hip joint frames (for the EE box).

    Reference: SingleRigidBodyModel::GetCOMToHip
    (single_rigid_body_model.cpp:258-308).
    """
    Rs, ps = fk_links(model, q)
    return ps[jnp.array(model.hip_link)]


def com_position(model: RobotModel, q: jax.Array) -> jax.Array:
    """Whole-body COM in world frame."""
    Rs, ps = fk_links(model, q)
    coms = ps + jnp.einsum('lij,lj->li', Rs, model.com)
    return jnp.sum(model.mass[:, None] * coms, axis=0) / model.total_mass


# ----------------------------------------------------------------------------
# Tangent-space perturbation (for geometric jacobians / integration)
# ----------------------------------------------------------------------------

def integrate_config(q: jax.Array, dq: jax.Array) -> jax.Array:
    """q boxplus dq with dq = [dp_world(3), omega_body(3), dqj]."""
    p = q[0:3] + dq[0:3]
    quat = quat_ops.box_plus(q[3:7], dq[3:6])
    return jnp.concatenate([p, quat, q[7:] + dq[6:]])


def _fk_tangent(model: RobotModel, q: jax.Array, dq: jax.Array):
    qq = integrate_config(q, dq)
    return fk_links(model, qq)


def link_jacobians(model: RobotModel, q: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Geometric jacobians of every link frame.

    Returns (Jv [L, 3, nv], Jw [L, 3, nv]): world-frame linear / angular
    velocity of each link frame per unit generalized velocity.
    """
    zero = jnp.zeros(model.nv, dtype=q.dtype)

    def pos_fn(dq):
        _, ps = _fk_tangent(model, q, dq)
        return ps

    def rot_vec_fn(dq):
        Rs, _ = _fk_tangent(model, q, dq)
        return Rs

    Jp = jax.jacfwd(pos_fn)(zero)                        # [L, 3, nv]
    JR = jax.jacfwd(rot_vec_fn)(zero)                    # [L, 3, 3, nv]
    Rs, _ = fk_links(model, q)
    # omega_hat = dR R^T:  dRRt[l, i, j, v] = sum_a JR[l,i,a,v] * Rs[l,j,a]
    dRRt = jnp.einsum('liav,lja->lijv', JR, Rs)
    wx = 0.5 * (dRRt[:, 2, 1, :] - dRRt[:, 1, 2, :])
    wy = 0.5 * (dRRt[:, 0, 2, :] - dRRt[:, 2, 0, :])
    wz = 0.5 * (dRRt[:, 1, 0, :] - dRRt[:, 0, 1, :])
    Jw = jnp.stack([wx, wy, wz], axis=1)                 # [L, 3, nv]
    return Jp, Jw


def frame_jacobian(model: RobotModel, q: jax.Array, link: int,
                   offset: jax.Array) -> jax.Array:
    """[3, nv] world-frame linear jacobian of a point on a link."""
    def fn(dq):
        Rs, ps = _fk_tangent(model, q, dq)
        return ps[link] + Rs[link] @ offset
    return jax.jacfwd(fn)(jnp.zeros(model.nv, dtype=q.dtype))


def ee_jacobians(model: RobotModel, q: jax.Array) -> jax.Array:
    """[E, 3, nv] linear jacobians of the end-effector points."""
    def fn(dq):
        Rs, ps = _fk_tangent(model, q, dq)
        links = jnp.array(model.ee_link)
        return ps[links] + jnp.einsum('eij,ej->ei', Rs[links], model.ee_offset)
    return jax.jacfwd(fn)(jnp.zeros(model.nv, dtype=q.dtype))


# ----------------------------------------------------------------------------
# Dynamics: mass matrix, bias forces (Lagrangian autodiff)
# ----------------------------------------------------------------------------

def mass_matrix(model: RobotModel, q: jax.Array) -> jax.Array:
    """Joint-space inertia matrix M(q) = sum_i J_i^T M_i J_i  [nv, nv].

    Replaces pinocchio::crba (used by QPControl::ComputeDynamicsTerms,
    controllers/qp_control.cpp:156+).
    """
    Jp, Jw = link_jacobians(model, q)
    Rs, _ = fk_links(model, q)
    # COM jacobian of each link: d/dv (p_link + R c) = Jp - skew(R c) @ Jw
    rc = jnp.einsum('lij,lj->li', Rs, model.com)         # [L, 3]
    Jc = Jp + jnp.einsum('lij,ljv->liv', -_skew_batch(rc), Jw)
    # world-frame rotational inertia Iw_l = R_l I_l R_l^T
    Iw = jnp.einsum('lij,ljk,lmk->lim', Rs, model.inertia, Rs)
    M = (jnp.einsum('l,liv,liw->vw', model.mass, Jc, Jc)
         + jnp.einsum('liv,lij,ljw->vw', Jw, Iw, Jw))
    return 0.5 * (M + M.T)


def _skew_batch(v: jax.Array) -> jax.Array:
    return jax.vmap(quat_ops.skew)(v)


def kinetic_energy(model: RobotModel, q: jax.Array, v: jax.Array) -> jax.Array:
    return 0.5 * v @ mass_matrix(model, q) @ v


def potential_energy(model: RobotModel, q: jax.Array) -> jax.Array:
    Rs, ps = fk_links(model, q)
    coms = ps + jnp.einsum('lij,lj->li', Rs, model.com)
    return -jnp.sum(model.mass * (coms @ GRAVITY.astype(q.dtype)))


def bias_forces(model: RobotModel, q: jax.Array, v: jax.Array) -> jax.Array:
    """Nonlinear effects h(q, v) with M(q) qdd + h(q, v) = tau + J^T f.

    Lagrangian identity: h = Mdot v - (1/2) d/dq (v^T M v) + g, with both
    configuration derivatives taken in the tangent space.  Replaces
    pinocchio::nonLinearEffects (controllers/qp_control.cpp, model.cpp).
    """
    zero = jnp.zeros(model.nv, dtype=q.dtype)

    def Mv(dq):
        return mass_matrix(model, integrate_config(q, dq)) @ v

    # Mdot v = directional derivative of (M v) along the flow dq/dt = v
    _, Mdot_v = jax.jvp(Mv, (zero,), (v,))

    def T_of_dq(dq):
        return kinetic_energy(model, integrate_config(q, dq), v)

    dT_dq = jax.grad(T_of_dq)(zero)

    def U_of_dq(dq):
        return potential_energy(model, integrate_config(q, dq))

    g = jax.grad(U_of_dq)(zero)
    return Mdot_v - dT_dq + g


def composite_inertia_about_com(model: RobotModel, q: jax.Array) -> jax.Array:
    """3x3 rotational inertia of the whole robot about its COM (world axes).

    Replaces the pinocchio centroidal-map derivation of Ir_
    (single_rigid_body_model.cpp:32-37).
    """
    Rs, ps = fk_links(model, q)
    coms = ps + jnp.einsum('lij,lj->li', Rs, model.com)
    com = jnp.sum(model.mass[:, None] * coms, axis=0) / model.total_mass
    Iw = jnp.einsum('lij,ljk,lmk->lim', Rs, model.inertia, Rs)
    r = coms - com[None, :]
    r2 = jnp.sum(r * r, axis=-1)
    par = model.mass[:, None, None] * (
        r2[:, None, None] * jnp.eye(3) - jnp.einsum('li,lj->lij', r, r))
    return jnp.sum(Iw + par, axis=0)


def velocity_to_qdot(q: jax.Array, v: jax.Array) -> jax.Array:
    """Map generalized velocity to dq/dt (quaternion rate), for integrators."""
    quat = q[3:7]
    w = v[3:6]
    # qdot = 0.5 * quat * (w, 0)
    wq = jnp.concatenate([w, jnp.zeros(1, dtype=q.dtype)])
    qd = 0.5 * quat_ops.multiply(quat, wq)
    return jnp.concatenate([v[0:3], qd, v[6:]])
