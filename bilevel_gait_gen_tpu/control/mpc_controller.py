"""MPC controller: the mid-level brain wiring MPC <-> whole-body control.

Replaces controller::MPCController (controllers/mpc_controller.cpp).  The
reference splits this across two host threads (1 kHz control vs free-running
MPC) synchronized by five mutexes; the TPU-native design makes both pure
functions so the closed loop can run entirely on device as a scan (sim) or
as a host asyncio pair with device double-buffering (hardware):

* `reconstruct_srb_state`: (q, v) -> SRB manifold state (ReconstructState,
  mpc_controller.cpp:229-271): momentum from mass * base velocity, angular
  momentum from the composite inertia.
* `targets_from_traj`: interpolate the MPC trajectory at time t, run IK for
  the desired configuration/velocity and pull spline force targets
  (GetTargetsFromTraj, :414-511).
* `control_action`: the 1 kHz step = targets + whole-body QP torques.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from bilevel_gait_gen_tpu.control import ik as ik_mod
from bilevel_gait_gen_tpu.control import wbqp
from bilevel_gait_gen_tpu.models import rbd, srb
from bilevel_gait_gen_tpu.models.rbd import RobotModel
from bilevel_gait_gen_tpu.mpc import gait as gait_mod
from bilevel_gait_gen_tpu.mpc.trajectory import Trajectory
from bilevel_gait_gen_tpu.utils.precision import highest_matmul_precision
from bilevel_gait_gen_tpu.ops import quat as quat_ops
from bilevel_gait_gen_tpu.ops import spline
from bilevel_gait_gen_tpu.utils.config import MPCConfig


@highest_matmul_precision
def reconstruct_srb_state(model: RobotModel, params: srb.SRBParams,
                          q: jax.Array, v: jax.Array) -> jax.Array:
    """SRB manifold state from the full robot (q, v) — see
    srb.reconstruct_state (reference mpc_controller.cpp:229-271)."""
    return srb.reconstruct_state(params, q, v)


def interpolate_state(traj: Trajectory, t: jax.Array, t0: jax.Array,
                      dt: float) -> jax.Array:
    """Linear interpolation of the manifold states between nodes (the
    reference indexes the nearest node, GetTargetConfig mpc.cpp:707-710;
    interpolation is strictly better at 1 kHz)."""
    N = traj.x_man.shape[0] - 1
    s = jnp.clip((t - t0) / dt, 0.0, N - 1e-6)
    k = jnp.floor(s).astype(jnp.int32)
    a = s - k
    x0 = traj.x_man[k]
    x1 = traj.x_man[jnp.minimum(k + 1, N)]
    x = (1 - a) * x0 + a * x1
    # keep the quaternion valid
    return x.at[6:10].set(quat_ops.normalize(x[6:10]))


def targets_from_traj(model: RobotModel, cfg: MPCConfig, traj: Trajectory,
                      t: jax.Array, t0: jax.Array,
                      q_guess: jax.Array,
                      com_offset: jax.Array | None = None):
    """(q_des, v_des, f_des, contact) at time t from the MPC solution.

    com_offset: body-frame base->COM offset (SRBParams.com_offset) — the
    plan's p is the COM; the IK pins the base origin."""
    x = interpolate_state(traj, t, t0, cfg.dt)
    feet = spline.foot_positions_all(traj.sched.bounds, traj.footholds, t,
                                     cfg.swing_height, cfg.foot_offset)
    base_pos = x[0:3]
    if com_offset is not None:
        base_pos = base_pos - quat_ops.to_matrix(
            quat_ops.normalize(x[6:10])) @ com_offset
    q_des = ik_mod.solve_ik(model, base_pos, x[6:10], feet, q_guess)

    # foot velocities from the spline (finite difference of the pure eval)
    eps = jnp.asarray(1e-4, x.dtype)
    feet2 = spline.foot_positions_all(traj.sched.bounds, traj.footholds,
                                      t + eps, cfg.swing_height,
                                      cfg.foot_offset)
    feet_vel = (feet2 - feet) / eps
    contact = gait_mod.contact_flags(traj.sched, t)
    f_des = spline.forces_all(traj.sched.bounds, traj.f_nodes, t,
                              cfg.num_force_polys)
    if cfg.force_carrier:
        f_des = f_des + spline.carrier_forces(
            traj.sched.bounds, t, model.total_mass * 9.81, cfg.carrier_ramp)
    f_des = f_des * contact[:, None]
    return x, q_des, feet_vel, f_des, contact


@highest_matmul_precision
def control_action(model: RobotModel, params: srb.SRBParams, cfg: MPCConfig,
                   wb_cfg: wbqp.WBQPConfig, traj: Trajectory, q: jax.Array,
                   v: jax.Array, t: jax.Array, t0: jax.Array,
                   measured_contact: jax.Array | None = None) -> jax.Array:
    """One low-level control tick -> joint torques [nj]
    (MPCController::ComputeControlAction, mpc_controller.cpp:120-227).

    measured_contact: [E] bool from the simulator/robot; the stationary-
    contact rows only apply to feet that are BOTH scheduled and actually in
    contact (reference qp_control.cpp:207-210).
    """
    x, q_des, feet_vel, f_des, contact = targets_from_traj(
        model, cfg, traj, t, t0, q, params.com_offset)
    if measured_contact is not None:
        contact = contact & measured_contact
    f_des = f_des * contact[:, None]
    R = quat_ops.to_matrix(x[6:10])
    omega_body = jnp.linalg.solve(params.inertia, R.T @ x[10:13])
    # plan h is the COM momentum; base velocity = v_com - w x (R c)
    v_com = x[3:6] / params.mass
    base_vel = v_com - jnp.cross(R @ omega_body, R @ params.com_offset)
    v_des = ik_mod.ik_velocities(model, q_des, base_vel, omega_body, feet_vel)
    return wbqp.compute_torques(model, wb_cfg, q, v, contact, q_des, v_des,
                                f_des)


def control_action_full(model: RobotModel, params: srb.SRBParams,
                        cfg: MPCConfig, wb_cfg: wbqp.WBQPConfig,
                        traj: Trajectory, q: jax.Array, v: jax.Array,
                        t: jax.Array, t0: jax.Array,
                        measured_contact: jax.Array | None = None):
    """Like :func:`control_action` but also returns the motor-level targets
    (tau, q_des joints, dq_des joints, contact) — the command tuple the
    hardware layer ships to the robot MCU alongside the gain schedule
    (reference AssignConfig/Vel/TorqueToMotors, hardware_robot.cpp:531-616).
    """
    x, q_des, feet_vel, f_des, contact = targets_from_traj(
        model, cfg, traj, t, t0, q, params.com_offset)
    if measured_contact is not None:
        contact = contact & measured_contact
    f_des = f_des * contact[:, None]
    R = quat_ops.to_matrix(x[6:10])
    omega_body = jnp.linalg.solve(params.inertia, R.T @ x[10:13])
    v_com = x[3:6] / params.mass
    base_vel = v_com - jnp.cross(R @ omega_body, R @ params.com_offset)
    v_des = ik_mod.ik_velocities(model, q_des, base_vel, omega_body, feet_vel)
    tau = wbqp.compute_torques(model, wb_cfg, q, v, contact, q_des, v_des,
                               f_des)
    return tau, q_des[7:], v_des[6:], contact
