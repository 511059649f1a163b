"""Single-rigid-body (SRB) model: the production MPC dynamics.

TPU-native counterpart of the reference's SingleRigidBodyModel
(mpc/models/single_rigid_body_model.cpp).  Same state convention:

  manifold state  [13]: [p(3), h_lin(3), quat_xyzw(4), w(3)]
  tangent  state  [12]: [p(3), h_lin(3), log3(quat)(3), w(3)]

and the same continuous dynamics (CalcDynamics, :222-256):

  pdot     = h / m
  hdot     = m g + sum_e f_e
  qdot_tan = Ir^{-1} w
  wdot     = -w x (Ir w) + sum_e (r_e - p) x f_e

The reference's hand-coded linearization GetLinearDynamics (:55-169) and the
contact-time partial ComputeLinearizationPartialWrtContactTimes (:458-555)
are replaced by `jax.jacfwd` / `jax.grad` of `dynamics` — the spline forces
and foot positions enter through pure functions of (u, theta, t).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from bilevel_gait_gen_tpu.models import rbd
from bilevel_gait_gen_tpu.models.rbd import RobotModel
from bilevel_gait_gen_tpu.ops import quat as quat_ops
from bilevel_gait_gen_tpu.ops import spline
from bilevel_gait_gen_tpu.utils.config import MPCConfig

GRAVITY = jnp.array([0.0, 0.0, -9.81])

POS = slice(0, 3)
LIN_MOM = slice(3, 6)
QUAT = slice(6, 10)      # manifold
ORI_TAN = slice(6, 9)    # tangent
ANG = slice(9, 12)       # tangent
ANG_MAN = slice(10, 13)  # manifold


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SRBParams:
    """Constant physical parameters, precomputed host-side once.

    Reference analog: SingleRigidBodyModel ctor (:20-42) pulling robot mass
    and composite rotational inertia Ir from Pinocchio, plus the hip-offset
    table GetCOMToHip (:258-308) used by the EE-box constraints.
    """
    mass: jax.Array          # scalar
    inertia: jax.Array       # [3,3] composite rotational inertia at nominal q
    inertia_inv: jax.Array   # [3,3]
    hip_offset: jax.Array    # [E, 2] xy offsets from COM to EE-box center
    # body-frame offset from the floating-base origin to the whole-body COM
    # at the nominal configuration.  The SRB state's p IS the COM (the
    # reference builds its SRB from Pinocchio's centroidal frame); using
    # the base origin instead puts every torque arm (r_e - p) off by the
    # base->COM offset — negligible for A1 (~mm), fatal for the Adam biped
    # (7 cm vertical, 2.6 cm fore-aft: a ~10 Nm phantom pitch torque).
    com_offset: jax.Array    # [3]
    # raw COM->hip xy offsets WITHOUT the EE-box margins (the reference's
    # GetCOMToHip used by the Raibert heuristic's constant term,
    # mpc_single_rigid_body.cpp:1009; hip_offset above is the margin-widened
    # EE-box center)
    hip_offset_raw: jax.Array  # [E, 2]


def make_srb_params(model: RobotModel, nominal_q: jax.Array,
                    box_x_margin: float = 0.025,
                    box_y_margin: float = 0.1) -> SRBParams:
    """Build SRB constants from the full model at a nominal configuration.

    The xy margins replicate the reference's hand-tuned widening of the hip
    offsets (single_rigid_body_model.cpp:289-303: y += 0.1*sign(y),
    x += 0.025).
    """
    dtype = nominal_q.dtype
    Ir = rbd.composite_inertia_about_com(model, nominal_q).astype(dtype)
    hips = rbd.hip_positions(model, nominal_q)       # [E, 3] world
    com = rbd.com_position(model, nominal_q)
    R0 = quat_ops.to_matrix(quat_ops.normalize(nominal_q[3:7]))
    com_offset = R0.T @ (com - nominal_q[0:3])
    off = hips[:, :2] - com[None, :2]
    off_x = off[:, 0] + box_x_margin
    off_y = off[:, 1] + jnp.sign(off[:, 1]) * box_y_margin
    return SRBParams(
        mass=model.total_mass.astype(dtype),
        inertia=Ir,
        inertia_inv=jnp.linalg.inv(Ir).astype(dtype),
        hip_offset=jnp.stack([off_x, off_y], axis=-1).astype(dtype),
        com_offset=com_offset.astype(dtype),
        hip_offset_raw=off.astype(dtype),
    )


def reconstruct_state(params: SRBParams, q: jax.Array,
                      v: jax.Array) -> jax.Array:
    """SRB manifold state [p, h, quat, w] from the full robot (q, v).

    p is the whole-body COM (base origin + rotated nominal base->COM
    offset) and h its linear momentum m*(v_base + w x R c) — the reference
    reconstructs from Pinocchio's centroidal frame
    (mpc_controller.cpp:229-271).  Every consumer of an SRB state (tests,
    demos, bench) must build x0 through here: a base-origin p is
    inconsistent with the COM-relative EE-box/TD rows and can render the
    QP infeasible by ~the base->COM offset.
    """
    quat = quat_ops.normalize(q[3:7])
    R = quat_ops.to_matrix(quat)
    c_world = R @ params.com_offset
    p = q[0:3] + c_world
    omega_world = R @ v[3:6]
    v_com = v[0:3] + jnp.cross(omega_world, c_world)
    h = params.mass * v_com
    # angular momentum about the COM in world axes: w = R (Ir omega_body)
    w = R @ (params.inertia @ v[3:6])
    return jnp.concatenate([p, h, quat, w])


# ----------------------------------------------------------------------------
# Manifold <-> tangent (reference :179-220; quat_ref = Identity as in
# production code, single_rigid_body_model.cpp:183)
# ----------------------------------------------------------------------------

def manifold_to_tangent(x_man: jax.Array) -> jax.Array:
    return jnp.concatenate([
        x_man[0:6],
        quat_ops.log3(x_man[QUAT]),
        x_man[ANG_MAN],
    ])


def tangent_to_manifold(x_tan: jax.Array) -> jax.Array:
    return jnp.concatenate([
        x_tan[0:6],
        quat_ops.exp3(x_tan[ORI_TAN]),
        x_tan[ANG],
    ])


# ----------------------------------------------------------------------------
# Dynamics
# ----------------------------------------------------------------------------

def dynamics(params: SRBParams, x_tan: jax.Array,
             f_nodes: jax.Array, footholds: jax.Array,
             bounds: jax.Array, t: jax.Array, cfg: MPCConfig) -> jax.Array:
    """Continuous tangent-state derivative xdot [12].

    f_nodes [E, S, F-1, 3, 2], footholds [E, S+1, 2], bounds [E, P+1].
    Differentiable in every argument including the phase boundaries (the
    bilevel decision variables).
    """
    p = x_tan[POS]
    h = x_tan[LIN_MOM]
    w = x_tan[ANG]

    forces = spline.forces_all(bounds, f_nodes, t, cfg.num_force_polys)
    if cfg.force_carrier:
        forces = forces + spline.carrier_forces(
            bounds, t, params.mass * 9.81, cfg.carrier_ramp)
    feet = spline.foot_positions_all(bounds, footholds, t,
                                     cfg.swing_height, cfg.foot_offset)

    pdot = h / params.mass
    g = GRAVITY.astype(x_tan.dtype)
    hdot = params.mass * g + jnp.sum(forces, axis=0)
    qdot = params.inertia_inv @ w
    wdot = (-jnp.cross(w, params.inertia @ w)
            + jnp.sum(jnp.cross(feet - p[None, :], forces), axis=0))
    return jnp.concatenate([pdot, hdot, qdot, wdot])


def discrete_step(params: SRBParams, x_tan: jax.Array,
                  f_nodes: jax.Array, footholds: jax.Array,
                  bounds: jax.Array, t: jax.Array, dt: float,
                  cfg: MPCConfig) -> jax.Array:
    """One integration step.  "euler" is the reference production path
    (RKIntegrator::CalcIntegral actually does Euler, mpc/rk_integrator.cpp:
    14-30; discretization A = I + dt*Ac, mpc_single_rigid_body.cpp:246-248);
    "rk2" is the midpoint method the reference keeps commented out."""
    k1 = dynamics(params, x_tan, f_nodes, footholds, bounds, t, cfg)
    if cfg.integrator == "rk2":
        k2 = dynamics(params, x_tan + 0.5 * dt * k1, f_nodes, footholds,
                      bounds, t + 0.5 * dt, cfg)
        return x_tan + dt * k2
    return x_tan + dt * k1


def linearize(params: SRBParams, x_tan: jax.Array,
              f_nodes: jax.Array, footholds: jax.Array, u_unravel,
              u_flat: jax.Array, bounds: jax.Array, t: jax.Array,
              cfg: MPCConfig):
    """Continuous-time (A, B, C) with xdot ~= A x + B u + C.

    Replaces GetLinearDynamics (single_rigid_body_model.cpp:55-169).
    `u_unravel` maps the flat input vector back to (f_nodes, footholds);
    the passed f_nodes/footholds are ignored except through u_flat.
    """
    def f_of_x(x):
        return dynamics(params, x, f_nodes, footholds, bounds, t, cfg)

    def f_of_u(u):
        fn, fh = u_unravel(u)
        return dynamics(params, x_tan, fn, fh, bounds, t, cfg)

    A = jax.jacfwd(f_of_x)(x_tan)
    B = jax.jacfwd(f_of_u)(u_flat)
    C = f_of_x(x_tan) - A @ x_tan - B @ u_flat
    return A, B, C
