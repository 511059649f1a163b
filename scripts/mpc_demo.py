"""Open-loop MPC + gait-optimization demo (reference apps/mpc_demo.cpp):
run the initial SQP, a stretch of real-time iterations fed back on the
plan, and bilevel gait updates; export plan plots.

Usage: python scripts/mpc_demo.py [--cpu] [--gait-opt]
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

from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import bilevel, gait, solver
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.ops import spline
from bilevel_gait_gen_tpu.sim import viz
from bilevel_gait_gen_tpu.utils.config import MPCConfig
from bilevel_gait_gen_tpu.utils.stats import make_ring, record, print_table


def main():
    dtype = jnp.float32
    cfg = MPCConfig(ipm_iters=18).validate()
    model = a1.make_a1()
    q0 = jnp.asarray(a1.stand_config(), dtype)
    params = srb.make_srb_params(model, q0)
    x0 = srb.reconstruct_state(params, q0, jnp.zeros(model.nv, dtype))
    feet0 = rbd.ee_positions(model, q0).astype(dtype)
    traj = default_trajectory(cfg, gait.make_trot(cfg), x0, feet0[:, :2])
    state = solver.SolverState(traj=traj,
                               ee_box=jnp.asarray(cfg.ee_box_size, dtype))
    x_des = srb.manifold_to_tangent(x0)

    print("CreateInitialRun ...")
    state, stats = jax.jit(lambda s, x, e: solver.create_initial_run(
        cfg, params, s, x, e, x_des))(state, x0, feet0)
    print(f"  solved={bool(stats.solved)} defect={float(stats.defect_l1):.2e} "
          f"cost={float(stats.cost):.2f}")

    step = jax.jit(lambda st, x, t, ee: solver.solve_step(
        cfg, params, st, x, t, ee, x_des))
    ring = make_ring()

    n_iters = 20
    t_solve = 0.0
    for k in range(1, n_iters + 1):
        t0 = jnp.asarray(cfg.dt * k, dtype)
        x_cur = state.traj.x_man[1]
        feet = jax.vmap(lambda b, fh: spline.foot_position(
            b, fh, t0, cfg.swing_height, cfg.foot_offset))(
            state.traj.sched.bounds, state.traj.footholds)
        tm = time.perf_counter()
        state, stats = step(state, x_cur, t0, feet)
        jax.block_until_ready(stats.cost)
        dt_ms = (time.perf_counter() - tm) * 1e3
        t_solve += dt_ms
        ring = record(ring, k, dt_ms, stats)
    print(f"{n_iters} real-time iterations, avg {t_solve / n_iters:.1f} ms")
    print_table(ring, last=10)

    if "--gait-opt" in sys.argv:
        print("bilevel gait update ...")
        tm = time.perf_counter()
        res = jax.jit(lambda st, x, t, ee: bilevel.gait_opt_update(
            cfg, params, st, x, t, ee, x_des))(
            state, state.traj.x_man[0], jnp.asarray(cfg.dt * n_iters, dtype),
            feet)
        jax.block_until_ready(res.cost)
        print(f"  alpha={float(res.alpha):.2f} cost={float(res.cost):.2f} "
              f"|grad|={float(res.grad_norm):.3f} "
              f"({(time.perf_counter() - tm):.1f}s incl compile)")
        state = res.state

    path = viz.plot_plan(state.traj, cfg, t0=float(cfg.dt * n_iters),
                         path="/tmp/mpc_plan.png")
    print("plan plot:", path)


if __name__ == "__main__":
    main()
