"""Closed-loop gait-optimization experiment (reference
test/gait_opt_line_search.cpp: N-step MPC + gait-opt rollout with cost
report).  Runs the MuJoCo closed loop with a bilevel contact-time update
every `gait_opt_freq` MPC solves and reports the cost trend and the
optimized contact schedule.

Usage: python scripts/gait_opt_experiment.py [seconds] [--cpu]
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

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from bilevel_gait_gen_tpu.control import mpc_controller, wbqp
from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import bilevel, gait, solver
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.sim.mujoco_bridge import MujocoLoop
from bilevel_gait_gen_tpu.utils.config import MPCConfig


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    seconds = float(args[0]) if args else 2.0
    gait_opt_freq = 5          # bilevel update every 5 MPC solves
    dtype = jnp.float32
    cfg = MPCConfig(ipm_iters=18, ls_alphas=10).validate()
    wb_cfg = wbqp.WBQPConfig()
    model = a1.make_a1()
    q0_np = np.asarray(a1.stand_config(), np.float64)
    q0_np[2] -= 0.007
    q0 = jnp.asarray(q0_np, dtype)
    params = srb.make_srb_params(model, q0)
    x0 = srb.reconstruct_state(params, q0, jnp.zeros(model.nv, dtype))
    feet0 = rbd.ee_positions(model, q0).astype(dtype)
    traj = default_trajectory(cfg, gait.make_trot(cfg), x0, feet0[:, :2])
    state = solver.SolverState(traj=traj,
                               ee_box=jnp.asarray(cfg.ee_box_size, dtype))
    x_des = srb.manifold_to_tangent(x0)
    state, _ = jax.jit(lambda s, x, e: solver.create_initial_run(
        cfg, params, s, x, e, x_des))(state, x0, feet0)

    mpc_step = jax.jit(lambda st, x, t, ee: solver.solve_step(
        cfg, params, st, x, t, ee, x_des))
    gait_step = jax.jit(lambda st, x, t, ee: bilevel.gait_opt_update(
        cfg, params, st, x, t, ee, x_des))
    ctrl = jax.jit(lambda tr, q, v, t, t0, mc: mpc_controller.control_action(
        model, params, cfg, wb_cfg, tr, q, v, t, t0, mc))

    loop = MujocoLoop(model, timestep=0.001)
    loop.set_state(q0_np, np.zeros(model.nv))
    holder = {"state": state, "t0": 0.0, "n": 0, "costs": [],
              "alphas": [], "g_ms": 0.0, "n_g": 0}

    def control_fn(q, v, t):
        qj = jnp.asarray(q, dtype)
        vj = jnp.asarray(v, dtype)
        if t >= holder["t0"] + cfg.dt or t == 0.0:
            x_srb = mpc_controller.reconstruct_srb_state(model, params, qj, vj)
            feet = rbd.ee_positions(model, qj)
            if holder["n"] > 0 and holder["n"] % gait_opt_freq == 0:
                # the bilevel update embeds the production RTI (reference
                # phase (b)), so it replaces mpc_step on gait ticks
                tm = time.perf_counter()
                res = gait_step(holder["state"], x_srb,
                                jnp.asarray(t, dtype), feet)
                jax.block_until_ready(res.cost)
                holder["state"] = res.state
                holder["alphas"].append(float(res.alpha))
                holder["g_ms"] += (time.perf_counter() - tm) * 1e3
                holder["n_g"] += 1
                stats = res.rti_stats
            else:
                st2, stats = mpc_step(holder["state"], x_srb,
                                      jnp.asarray(t, dtype), feet)
                holder["state"] = st2
            holder["t0"] = t
            holder["n"] += 1
            holder["costs"].append(float(stats.cost))
        mc = jnp.asarray(loop.contacts())
        return np.asarray(ctrl(holder["state"].traj, qj, vj,
                               jnp.asarray(t, dtype),
                               jnp.asarray(holder["t0"], dtype), mc))

    n_steps = int(seconds * 1000)
    t_start = time.time()
    qs, vs, taus = loop.run(control_fn, n_steps, control_decimation=1)
    wall = time.time() - t_start

    z = qs[:, 2]
    costs = np.array(holder["costs"])
    k = len(costs) // 3
    print(f"wall {wall:.0f}s; MPC solves {holder['n']}, gait updates "
          f"{holder['n_g']} (avg {holder['g_ms']/max(holder['n_g'],1):.0f} ms)")
    print(f"z min {z.min():.3f} end {z[-1]:.3f} -> "
          f"{'WALKED' if z.min() > 0.15 else 'FELL'}")
    print(f"cost: first third {costs[:k].mean():.1f} last third "
          f"{costs[-k:].mean():.1f}")
    print(f"line-search alphas chosen: {holder['alphas']}")
    b = np.asarray(holder["state"].traj.sched.bounds)
    print("final contact boundaries (per EE):")
    for e in range(cfg.num_ee):
        print(f"  ee{e}: {np.round(b[e] - b[e][0], 3)}")


if __name__ == "__main__":
    main()
