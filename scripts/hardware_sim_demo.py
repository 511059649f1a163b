"""End-to-end MPC-over-UDP demo: the full hardware stack against a
simulated robot.

Reference analog: hardware/hardware_interface.cpp driving the real A1 over
the Unitree UDP link.  Here the two sides run in one process over loopback
UDP with the exact wire format the hardware layer ships:

  controller side  — control.hardware.HardwareRobot (state estimator LPF
                     chains, Stand-ramp state machine, torque sanity check,
                     swing/stance gain schedule) whose control_fn is the
                     jitted device MPC + whole-body QP stack;
  robot side       — MuJoCo physics playing the robot MCU: it streams state
                     packets (joints + IMU), receives command packets
                     (q_des, dq_des, kp, kd, tau_ff), and runs the
                     motor-level PD law tau = tau_ff + kp (q_des - q)
                     + kd (dq_des - dq) exactly like the Unitree firmware.

A "mocap" update (base position truth at 240 Hz) feeds the COM estimator,
matching the reference's OptiTrack thread (hardware_robot.cpp:479-501).

Usage: python scripts/hardware_sim_demo.py [seconds] [--cpu] [--trot]
Exits 0 iff the robot is still upright at the end.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from bilevel_gait_gen_tpu import runtime
from bilevel_gait_gen_tpu.control import hardware as hw
from bilevel_gait_gen_tpu.control import mpc_controller, wbqp
from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import gait, solver
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.sim.closed_loop import settled_start
from bilevel_gait_gen_tpu.sim.mujoco_bridge import MujocoLoop
from bilevel_gait_gen_tpu.utils.config import MPCConfig


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 \
        and not sys.argv[1].startswith("--") else 2.0
    dtype = jnp.float32
    cfg = MPCConfig(ipm_iters=18, double_support=0.1, force_carrier=True,
                    carrier_ramp=0.1).validate()
    wb_cfg = wbqp.WBQPConfig()
    model = a1.make_a1()
    nj = model.num_joints

    q0_np = settled_start(model, np.asarray(a1.stand_config(), np.float64))
    q0 = jnp.asarray(q0_np, dtype)
    params = srb.make_srb_params(model, q0)
    x0 = srb.reconstruct_state(params, q0, jnp.zeros(model.nv, dtype))
    feet0 = rbd.ee_positions(model, q0).astype(dtype)
    sched = (gait.make_trot(cfg) if "--trot" in sys.argv
             else gait.make_standing(cfg))
    traj = default_trajectory(cfg, sched, x0, feet0[:, :2])
    state = solver.SolverState(traj=traj,
                               ee_box=jnp.asarray(cfg.ee_box_size, dtype))
    x_des = srb.manifold_to_tangent(x0)

    print("initial MPC run ...")
    init_run = jax.jit(lambda st, x, ee: solver.create_initial_run(
        cfg, params, st, x, ee, x_des))
    state, stats = init_run(state, x0, feet0)
    jax.block_until_ready(stats.cost)
    print(f"  solved={bool(stats.solved)}")

    mpc_step = jax.jit(lambda st, x, t, ee: solver.solve_step(
        cfg, params, st, x, t, ee, x_des))
    ctrl_full = jax.jit(
        lambda tr, q, v, t, t0, mc: mpc_controller.control_action_full(
            model, params, cfg, wb_cfg, tr, q, v, t, t0, mc))

    # ---- the UDP link (reference: Unitree SDK UDP at 2 kHz) --------------
    ctrl_ep = runtime.UdpEndpoint("127.0.0.1", 48831, "127.0.0.1", 48832)
    robot_ep = runtime.UdpEndpoint("127.0.0.1", 48832, "127.0.0.1", 48831)

    loop = MujocoLoop(model, timestep=0.001)
    loop.set_state(q0_np, np.zeros(model.nv))

    holder = {"state": state, "t0": 0.0, "n_mpc": 0, "fails": 0,
              "q_full": np.asarray(q0_np, np.float32),
              "v_full": np.zeros(model.nv, np.float32),
              "contact": np.ones(cfg.num_ee, bool)}

    def control_fn(q_j, dq, quat, gyro, vcom, t, mode):
        """HardwareRobot's control callback: full q from IMU quat + mocap
        base, joints from the wire; runs the MPC at cfg.dt cadence."""
        base_p = holder["q_full"][0:3]
        qj = jnp.asarray(np.concatenate([base_p, quat, q_j]), dtype)
        vj = jnp.asarray(np.concatenate([vcom, gyro, dq]), dtype)
        if t >= holder["t0"] + cfg.dt or holder["n_mpc"] == 0:
            x_srb = srb.reconstruct_state(params, qj, vj)
            feet = rbd.ee_positions(model, qj)
            # early-touchdown schedule sync (AdjustForCurrentContacts)
            st_in = holder["state"]
            sched2 = gait.adjust_for_current_contacts(
                st_in.traj.sched, jnp.asarray(holder["contact"]),
                jnp.asarray(t, dtype))
            st_in = dataclasses.replace(
                st_in, traj=dataclasses.replace(st_in.traj, sched=sched2))
            st, stats = mpc_step(st_in, x_srb,
                                 jnp.asarray(t, dtype), feet)
            jax.block_until_ready(st.traj.x_man)
            holder["state"] = st
            holder["t0"] = t
            holder["n_mpc"] += 1
            if not bool(stats.solved):
                holder["fails"] += 1
        tau, q_des_j, dq_des_j, contact = ctrl_full(
            holder["state"].traj, qj, vj, jnp.asarray(t, dtype),
            jnp.asarray(holder["t0"], dtype),
            jnp.asarray(holder["contact"]))
        return (np.asarray(tau), np.asarray(q_des_j),
                np.asarray(dq_des_j), np.asarray(contact))

    robot = hw.HardwareRobot(
        nj, ctrl_ep, control_fn,
        est_cfg=hw.EstimatorConfig(control_hz=1000.0),
        torque_limit=33.5,
        stand_config=np.asarray(q0_np[7:], np.float64))
    robot.set_mode(hw.Mode.MPC)

    n_steps = int(seconds * 1000)
    print(f"running {n_steps} ticks over loopback UDP ...")
    t_start = time.time()
    mj = loop._mujoco
    for k in range(n_steps):
        t = k * 0.001
        q_full, v_full = loop.get_state()
        holder["q_full"], holder["v_full"] = q_full, v_full
        holder["contact"] = loop.contacts()
        # mocap thread at 240 Hz (OptiTrackMonitor)
        if k % 4 == 0:
            robot.estimator.mocap_update(
                np.asarray(q_full[0:3], np.float64), t)
        # robot MCU: stream the state packet
        robot_ep.send(hw.pack_state(
            k, np.asarray(q_full[7:], np.float64),
            np.asarray(v_full[6:], np.float64), np.zeros(nj),
            np.asarray(q_full[3:7], np.float64),
            np.asarray(v_full[3:6], np.float64), np.zeros(3)))
        # controller tick: recv -> estimate -> MPC/WBQP -> send command
        if not robot.step_once(t):
            continue
        # robot MCU: recv command, run the motor PD law, step physics
        pkt = None
        for _ in range(100):
            pkt = robot_ep.recv(4096)
            if pkt is not None:
                break
            time.sleep(0.0002)
        if pkt is None:
            continue
        payload = np.frombuffer(pkt[8:], np.float32).reshape(nj, 5)
        q_des, dq_des, kp, kd, tau_ff = payload.T
        q_j = np.asarray(q_full[7:], np.float64)
        dq_j = np.asarray(v_full[6:], np.float64)
        tau_motor = tau_ff + kp * (q_des - q_j) + kd * (dq_des - dq_j)
        loop.mj_data.ctrl[:] = np.clip(tau_motor, -33.5, 33.5)
        mj.mj_step(loop.mj_model, loop.mj_data)
    wall = time.time() - t_start

    q_full, _ = loop.get_state()
    z = float(q_full[2])
    z0 = float(q0_np[2])
    upright = z > 0.55 * z0
    print(f"wall {wall:.1f}s; MPC solves {holder['n_mpc']} "
          f"(fails {holder['fails']})")
    print(f"final z {z:.3f} (start {z0:.3f}) xy "
          f"{np.abs(np.asarray(q_full[:2])).max():.3f}")
    print("UPRIGHT" if upright else "FELL")
    return 0 if upright else 1


if __name__ == "__main__":
    raise SystemExit(main())
