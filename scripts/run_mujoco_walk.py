"""Closed-loop trot in host MuJoCo with the full device controller.

Equivalent of the reference's mpc_sim demo (apps/mpc_sim_demo.cpp): MPC
real-time iterations at the MPC rate + whole-body QP torques at the control
rate, MuJoCo physics on the host.

Usage: python scripts/run_mujoco_walk.py [seconds] [--cpu]
"""
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

from bilevel_gait_gen_tpu.control import mpc_controller, wbqp
from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import gait, solver
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.sim.mujoco_bridge import MujocoLoop
from bilevel_gait_gen_tpu.utils.config import MPCConfig


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else 2.0
    dtype = jnp.float32
    cfg = MPCConfig(ipm_iters=18).validate()
    wb_cfg = wbqp.WBQPConfig()

    model = a1.make_a1()
    q0_np = np.asarray(a1.stand_config(), np.float64)
    q0_np[2] -= 0.007  # settle all feet into ground contact
    q0 = jnp.asarray(q0_np, dtype)
    params = srb.make_srb_params(model, q0)

    x0 = jnp.zeros(13, dtype).at[2].set(0.3).at[9].set(1.0)
    feet0 = rbd.ee_positions(model, q0).astype(dtype)
    traj = default_trajectory(cfg, gait.make_trot(cfg), x0, feet0[:, :2])
    state = solver.SolverState(traj=traj,
                               ee_box=jnp.asarray(cfg.ee_box_size, dtype))
    x_des = srb.manifold_to_tangent(x0)

    print("initial MPC run ...")
    t_start = time.time()
    init_run = jax.jit(lambda st, x, ee: solver.create_initial_run(
        cfg, params, st, x, ee, x_des))
    state, stats = init_run(state, x0, feet0)
    jax.block_until_ready(stats.cost)
    print(f"  done in {time.time()-t_start:.1f}s; defect={float(stats.defect_l1):.2e} solved={bool(stats.solved)}")

    mpc_step = jax.jit(lambda st, x, t, ee: solver.solve_step(
        cfg, params, st, x, t, ee, x_des))
    ctrl = jax.jit(lambda traj, q, v, t, t0, mc: mpc_controller.control_action(
        model, params, cfg, wb_cfg, traj, q, v, t, t0, mc))

    loop = MujocoLoop(model, timestep=0.001)
    loop.set_state(np.asarray(q0), np.zeros(model.nv))

    mpc_period = cfg.dt     # one RTI per MPC node period (reference cadence)
    holder = {"state": state, "t0": 0.0, "n_mpc": 0, "mpc_ms": 0.0,
              "ctrl_ms": 0.0, "n_ctrl": 0, "fails": 0}

    def control_fn(q, v, t):
        qj = jnp.asarray(q, dtype)
        vj = jnp.asarray(v, dtype)
        if t >= holder["t0"] + mpc_period or t == 0.0:
            tm = time.perf_counter()
            x_srb = mpc_controller.reconstruct_srb_state(model, params, qj, vj)
            feet = rbd.ee_positions(model, qj)
            st, stats = mpc_step(holder["state"], x_srb,
                                 jnp.asarray(t, dtype), feet)
            jax.block_until_ready(stats.cost)
            holder["state"] = st
            holder["t0"] = t
            holder["n_mpc"] += 1
            holder["mpc_ms"] += (time.perf_counter() - tm) * 1e3
            if not bool(stats.solved):
                holder["fails"] += 1
        tm = time.perf_counter()
        mc = jnp.asarray(loop.contacts())
        tau = ctrl(holder["state"].traj, qj, vj, jnp.asarray(t, dtype),
                   jnp.asarray(holder["t0"], dtype), mc)
        tau = np.asarray(tau)
        holder["ctrl_ms"] += (time.perf_counter() - tm) * 1e3
        holder["n_ctrl"] += 1
        return tau

    n_steps = int(seconds * 1000)
    print(f"running {n_steps} MuJoCo steps ...")
    t_start = time.time()
    qs, vs, taus = loop.run(control_fn, n_steps, control_decimation=1)
    wall = time.time() - t_start

    z = qs[:, 2]
    xy = qs[:, 0:2]
    print(f"wall {wall:.1f}s for {seconds}s sim")
    print(f"MPC solves: {holder['n_mpc']} (avg {holder['mpc_ms']/max(holder['n_mpc'],1):.1f} ms) fails: {holder['fails']}")
    print(f"ctrl ticks: {holder['n_ctrl']} (avg {holder['ctrl_ms']/max(holder['n_ctrl'],1):.2f} ms)")
    print(f"z: start {z[0]:.3f} min {z.min():.3f} max {z.max():.3f} end {z[-1]:.3f}")
    print(f"xy drift: {np.abs(xy).max(axis=0)}")
    upright = z.min() > 0.15
    print("WALKED" if upright else "FELL")
    np.save("/tmp/walk_qs.npy", qs)
    return 0 if upright else 1


if __name__ == "__main__":
    raise SystemExit(main())
