"""On-device closed-loop simulation (L8): JAX articulated dynamics with
soft ground contact.

Replaces the reference's MuJoCo closed loop (simulation/mujoco_sim/
simulator.cpp + SimulationRobot) for the all-on-device path: the physics
step is pure JAX (forward dynamics via the rbd mass matrix/bias + penalty
ground contact at the feet), so the ENTIRE control stack — simulator, 1 kHz
whole-body QP, MPC real-time iterations, bilevel gait updates — runs as one
jitted scan and vmaps over thousands of scenarios.  A host-side MuJoCo
bridge (sim/mujoco_bridge.py) provides the physics-parity path.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bilevel_gait_gen_tpu.control import mpc_controller, wbqp
from bilevel_gait_gen_tpu.models import rbd, srb
from bilevel_gait_gen_tpu.models.rbd import RobotModel
from bilevel_gait_gen_tpu.mpc import gait as gait_mod
from bilevel_gait_gen_tpu.mpc import solver as solver_mod
from bilevel_gait_gen_tpu.ops import spline
from bilevel_gait_gen_tpu.utils.config import MPCConfig
from bilevel_gait_gen_tpu.utils.precision import highest_matmul_precision


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Penalty contact model + integration parameters."""
    contact_kp: float = 12000.0
    contact_kd: float = 120.0
    friction_mu: float = 0.6
    tangent_vel_reg: float = 0.05   # m/s smoothing of the friction direction
    foot_radius: float = 0.02      # A1 foot collision sphere
    substeps: int = 4              # physics substeps per control tick
    joint_damping: float = 0.1
    # measured-contact gating with HYSTERESIS (DESIGN.md stability fix #2):
    # a foot ENTERS contact when it sinks below foot_radius + enter_margin
    # and only LEAVES when it rises above foot_radius + exit_margin.  The
    # old single 2 mm threshold dropped the WBQP's stationary-contact rows
    # whenever a penalty-ground dip bounced a stance foot a hair above it,
    # feeding the hop/sag limit cycle.
    contact_enter_margin: float = 0.001
    contact_exit_margin: float = 0.006


def settled_stand(model: RobotModel, sim: SimConfig,
                  q_nominal: jax.Array) -> jax.Array:
    """Static-equilibrium standing configuration on the penalty ground.

    The raw stand configs have feet up to ~4 mm non-coplanar, so settling
    by a plain base-z drop leaves some feet over-penetrated (measured:
    ground forces [74, 74, 34, 34] N vs the even 34 N the plan assumes —
    an 80 N net upward kick plus a pitch moment at t=0 that the closed
    loop then has to fight).  This solves IK for every foot at the SAME
    penetration m*g / (E * contact_kp), so the ground exactly carries the
    weight at t=0.
    """
    from bilevel_gait_gen_tpu.control import ik as ik_mod
    feet = rbd.ee_positions(model, q_nominal)
    E = feet.shape[0]
    pen = model.total_mass * 9.81 / (E * sim.contact_kp)
    z_target = sim.foot_radius - pen
    feet_t = feet.at[:, 2].set(z_target)
    base_pos = q_nominal[0:3].at[2].add(
        -(jnp.mean(feet[:, 2]) - z_target))
    return ik_mod.solve_ik(model, base_pos, q_nominal[3:7], feet_t,
                           q_nominal, iters=30)


def contact_forces(sim: SimConfig, feet: jax.Array,
                   feet_vel: jax.Array) -> jax.Array:
    """[E, 3] penalty ground forces at the foot points (flat ground z=0)."""
    pen = sim.foot_radius - feet[:, 2]                 # >0 when penetrating
    active = pen > 0.0
    fz = jnp.where(active,
                   sim.contact_kp * pen
                   - sim.contact_kd * feet_vel[:, 2] * jnp.sqrt(
                       jnp.maximum(pen, 0.0) / sim.foot_radius),
                   0.0)
    fz = jnp.maximum(fz, 0.0)
    vt = feet_vel[:, :2]
    vnorm = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + sim.tangent_vel_reg ** 2)
    ft = -vt * (sim.friction_mu * fz / vnorm)[:, None]
    return jnp.concatenate([ft, fz[:, None]], axis=-1)


def physics_step(model: RobotModel, sim: SimConfig, q: jax.Array,
                 v: jax.Array, tau: jax.Array, dt: float):
    """One semi-implicit Euler step of the articulated dynamics."""
    M = rbd.mass_matrix(model, q)
    h = rbd.bias_forces(model, q, v)
    J = rbd.ee_jacobians(model, q)
    feet = rbd.ee_positions(model, q)
    feet_vel = jnp.einsum('eiv,v->ei', J, v)
    f_c = contact_forces(sim, feet, feet_vel)
    tau_full = jnp.concatenate([jnp.zeros(6, q.dtype), tau])
    damping = jnp.concatenate([jnp.zeros(6, q.dtype),
                               jnp.full(model.num_joints, sim.joint_damping,
                                        q.dtype)])
    rhs = tau_full - h - damping * v + jnp.einsum('eiv,ei->v', J, f_c)
    qdd = jnp.linalg.solve(M, rhs)
    v_new = v + dt * qdd
    q_new = rbd.integrate_config(q, dt * v_new)
    return q_new, v_new


class SimLog(NamedTuple):
    q: jax.Array          # [T, nq]
    v: jax.Array          # [T, nv]
    srb_state: jax.Array  # [T, 13]
    tau: jax.Array        # [T, nj]
    cost: jax.Array       # [T]
    solved: jax.Array     # [T]


@highest_matmul_precision
def closed_loop(model: RobotModel, params: srb.SRBParams, cfg: MPCConfig,
                wb_cfg: wbqp.WBQPConfig, sim: SimConfig,
                state0: solver_mod.SolverState, q0: jax.Array, v0: jax.Array,
                x_des_tan: jax.Array, *, n_ticks: int, control_dt: float,
                mpc_every: int, gait_opt_every: int = 0,
                contact_sync: bool = False) -> tuple[solver_mod.SolverState,
                                                     SimLog]:
    """Full closed loop as one scan: physics + 1 kHz torque QP + MPC RTI,
    optionally with bilevel gait updates on a cadence.

    Reference analog: Simulator::RunSimulator / SimpleSimulation with the
    MPC thread folded in (apps/mpc_sim_demo.cpp flow); `mpc_every` plays the
    free-running MPC thread's update cadence and `gait_opt_every` (in MPC
    updates, 0 = off) the reference's gait_opt_freq 3-phase cycle
    (MPCController::MPCUpdate, mpc_controller.cpp:286-399).

    Cost note for BATCHED rollouts: when this loop is vmapped over
    scenarios, the `lax.cond` gait-opt/RTI branch lowers to a select that
    executes BOTH branches every MPC tick, so the full gait_opt_update
    (lanes + IFT gradient) is paid on every tick instead of every
    `gait_opt_every`-th — numerically correct but ~lanes x more expensive.
    For batched cadence benchmarking use bench.py's fused cadence (the
    gait tick hoisted out of the per-tick cond, one update per cycle of
    `gait_opt_every` RTIs); vmapped acceptance tests here keep the cond
    because their tick counts are tiny.
    """
    from bilevel_gait_gen_tpu.mpc import bilevel as bilevel_mod

    dtype = q0.dtype
    sub_dt = control_dt / sim.substeps

    def tick(carry, i):
        q, v, st, t0, mc_prev, trust = carry
        t = i.astype(dtype) * control_dt

        # hysteresis contact gating (DESIGN.md stability fix #2): latch
        # stance through penalty-ground micro-bounces instead of toggling
        # on a single position threshold every tick
        feet_z = rbd.ee_positions(model, q)[:, 2]
        enter = feet_z < sim.foot_radius + sim.contact_enter_margin
        stay = feet_z < sim.foot_radius + sim.contact_exit_margin
        mc = enter | (mc_prev & stay)

        def do_mpc(args):
            q_, v_, st_, _, trust_ = args
            x_srb = mpc_controller.reconstruct_srb_state(model, params, q_, v_)
            feet = rbd.ee_positions(model, q_)
            if contact_sync:
                # early-touchdown schedule sync (MPC::AdjustForCurrentContacts,
                # mpc/mpc.cpp:1195-1203), as the MuJoCo loop does per MPC
                # step, fed by the LATCHED contact state so a mid-dip bounce
                # cannot snap the bounds and degenerate the QP
                sched2 = gait_mod.adjust_for_current_contacts(
                    st_.traj.sched, mc, t,
                    window=cfg.contact_snap_window)
                st_ = dataclasses.replace(
                    st_, traj=dataclasses.replace(st_.traj, sched=sched2))
            if gait_opt_every > 0:
                # gait_opt_update EMBEDS the production RTI (reference phase
                # (b) "solve + derivatives", mpc_controller.cpp:518-573), so
                # it replaces solve_step on gait-opt ticks
                def do_gait(st3):
                    # trust radius carried across updates: rejected steps
                    # shrink it, strong agreement grows it (the reference's
                    # radius adaptation, gait_optimizer.cpp:568-579)
                    res = bilevel_mod.gait_opt_update(cfg, params, st3,
                                                      x_srb, t, feet,
                                                      x_des_tan,
                                                      trust=trust_)
                    return (res.state, res.rti_stats.cost,
                            res.rti_stats.solved, res.trust)

                def do_rti(st3):
                    st2, stats = solver_mod.solve_step(cfg, params, st3,
                                                       x_srb, t, feet,
                                                       x_des_tan)
                    return st2, stats.cost, stats.solved, trust_

                mpc_idx = i // mpc_every
                st2, cost, solved, trust2 = jax.lax.cond(
                    (mpc_idx % gait_opt_every == 0) & (mpc_idx > 0),
                    do_gait, do_rti, st_)
            else:
                st2, stats = solver_mod.solve_step(cfg, params, st_, x_srb,
                                                   t, feet, x_des_tan)
                cost, solved, trust2 = stats.cost, stats.solved, trust_
            return st2, t, cost, solved, trust2

        def no_mpc(args):
            _, _, st_, t0_, trust_ = args
            return (st_, t0_, jnp.asarray(jnp.nan, dtype),
                    jnp.asarray(True), trust_)

        st, t0, cost, solved, trust = jax.lax.cond(
            i % mpc_every == 0, do_mpc, no_mpc, (q, v, st, t0, trust))

        tau = mpc_controller.control_action(model, params, cfg, wb_cfg,
                                            st.traj, q, v, t, t0, mc)

        def sub(carry2, _):
            q_, v_ = carry2
            q_, v_ = physics_step(model, sim, q_, v_, tau, sub_dt)
            return (q_, v_), None

        (q, v), _ = jax.lax.scan(sub, (q, v), None, length=sim.substeps)
        x_srb = mpc_controller.reconstruct_srb_state(model, params, q, v)
        return (q, v, st, t0, mc, trust), SimLog(q=q, v=v, srb_state=x_srb,
                                                 tau=tau, cost=cost,
                                                 solved=solved)

    mc0 = rbd.ee_positions(model, q0)[:, 2] < (sim.foot_radius
                                               + sim.contact_enter_margin)
    (q, v, st, t0, _, _), log = jax.lax.scan(
        tick, (q0, v0, state0, jnp.asarray(0.0, dtype), mc0,
               jnp.asarray(cfg.trust_region, dtype)),
        jnp.arange(n_ticks))
    return st, log
