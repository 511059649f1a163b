"""Batch-size / kernel sweep of the inner-RTI throughput (tuning aid).

Measures steady-state warm-started batched solve_step wall-clock at several
batch sizes for both QP kernels; prints a line per point.  Used to pick the
bench.py defaults (the chip is latency-bound at small batch: throughput
keeps rising until the MXU saturates).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import gait, solver
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.parallel import mesh as mesh_mod
from bilevel_gait_gen_tpu.utils.config import MPCConfig


def run(batch, kernel, n_rep=8):
    cfg = MPCConfig(ipm_iters=10, ipm_exact_every=3,
                    qp_kernel=kernel).validate()
    dtype = jnp.float32
    model = a1.make_a1()
    q0 = jnp.asarray(a1.stand_config(), dtype)
    params = srb.make_srb_params(model, q0)
    x0 = srb.reconstruct_state(params, q0, jnp.zeros(model.nv, dtype))
    feet0 = rbd.ee_positions(model, q0).astype(dtype)
    traj = default_trajectory(cfg, gait.make_trot(cfg), x0, feet0[:, :2])
    state = solver.make_state(cfg, traj, jnp.asarray(cfg.ee_box_size, dtype))
    x_des = srb.manifold_to_tangent(x0)

    key = jax.random.PRNGKey(0)
    pert = 0.02 * jax.random.normal(key, (batch, 13), dtype)
    x0s = x0[None, :] + pert.at[:, 6:10].set(0.0)
    states = jax.tree.map(lambda a: jnp.stack([a] * batch), state)
    feets = jnp.stack([feet0] * batch)
    step = mesh_mod.batched_solve_step(cfg, params)
    t0 = jnp.asarray(0.0, dtype)

    states, stats = step(states, x0s, t0, feets, x_des)
    jax.block_until_ready(stats.cost)
    t_start = time.perf_counter()
    for _ in range(n_rep):
        states, stats = step(states, x0s, t0, feets, x_des)
    jax.block_until_ready(stats.cost)
    el = time.perf_counter() - t_start
    lat = el / n_rep * 1e3
    print(f"kernel={kernel:7s} batch={batch:5d} latency={lat:8.2f} ms  "
          f"throughput={batch * n_rep / el:9.1f} solves/s  "
          f"solved={float(np.asarray(stats.solved).mean()):.3f}", flush=True)


if __name__ == "__main__":
    kernels = os.environ.get("SWEEP_KERNELS", "xla").split(",")
    batches = [int(b) for b in
               os.environ.get("SWEEP_BATCHES", "128,256,512,1024").split(",")]
    for k in kernels:
        for b in batches:
            run(b, k)
