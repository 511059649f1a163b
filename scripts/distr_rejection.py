"""Disturbance-rejection scenario batch (reference
apps/a1_config_distr_rejection.yaml: initial COM velocity pushes up to
2.5 m/s).  The reference runs ONE scenario; here the scenario axis is a
batch sharded over the device mesh — the TPU-native headline capability.

Usage: python scripts/distr_rejection.py [batch] [--cpu]
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

from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import gait, solver
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.parallel import mesh as mesh_mod
from bilevel_gait_gen_tpu.utils.config import MPCConfig


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    BATCH = int(args[0]) if args else 256
    dtype = jnp.float32
    cfg = MPCConfig(ipm_iters=18).validate()
    model = a1.make_a1()
    q0 = jnp.asarray(a1.stand_config(), dtype)
    params = srb.make_srb_params(model, q0)
    feet0 = rbd.ee_positions(model, q0).astype(dtype)
    x_nom = jnp.zeros(13, dtype).at[2].set(0.3).at[9].set(1.0)
    x_des = srb.manifold_to_tangent(x_nom)

    # perturbed initial linear momenta: |v| up to 2.5 m/s in random xy dirs
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    speeds = jax.random.uniform(k1, (BATCH,), dtype, 0.0, 2.5)
    angles = jax.random.uniform(k2, (BATCH,), dtype, 0.0, 2 * np.pi)
    vx = speeds * jnp.cos(angles)
    vy = speeds * jnp.sin(angles)
    x0s = jnp.tile(x_nom[None, :], (BATCH, 1))
    x0s = x0s.at[:, 3].set(params.mass * vx).at[:, 4].set(params.mass * vy)

    traj = default_trajectory(cfg, gait.make_trot(cfg), x_nom, feet0[:, :2])
    state1 = solver.SolverState(traj=traj,
                                ee_box=jnp.asarray(cfg.ee_box_size, dtype))
    states = jax.tree.map(lambda a: jnp.stack([a] * BATCH), state1)
    feets = jnp.stack([feet0] * BATCH)

    mesh = mesh_mod.make_mesh()
    print(f"devices: {jax.devices()}  batch: {BATCH}")
    if len(jax.devices()) > 1:
        states = mesh_mod.shard_batch(states, mesh)
        x0s = mesh_mod.shard_batch(x0s, mesh)
        feets = mesh_mod.shard_batch(feets, mesh)

    run = mesh_mod.batched_initial_run(cfg, params)
    t0 = time.perf_counter()
    states2, stats = run(states, x0s, feets, x_des)
    jax.block_until_ready(stats.cost)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    states2, stats = run(states, x0s, feets, x_des)
    jax.block_until_ready(stats.cost)
    t_steady = time.perf_counter() - t0

    solved = np.asarray(stats.solved)
    defect = np.asarray(stats.defect_l1)
    # recovery = plan returns within 5 cm of nominal height at the horizon end
    z_end = np.asarray(states2.traj.x_man[:, -1, 2])
    vz_end = np.asarray(states2.traj.x_man[:, -1, 5]) / float(params.mass)
    recovered = solved & (np.abs(z_end - 0.3) < 0.05) & (np.abs(vz_end) < 0.5)

    print(f"first run (incl compile): {t_first:.1f}s, steady: {t_steady*1e3:.0f} ms "
          f"-> {BATCH * cfg.init_run_iters / t_steady:.0f} MPC solves/s")
    print(f"solved: {solved.mean()*100:.1f}%  recovered: {recovered.mean()*100:.1f}%")
    by_speed = [(f"{lo:.1f}-{hi:.1f}",
                 recovered[(np.asarray(speeds) >= lo)
                           & (np.asarray(speeds) < hi)].mean() * 100)
                for lo, hi in [(0, 1.0), (1.0, 1.8), (1.8, 2.5)]]
    for rng_s, pct in by_speed:
        print(f"  |v| {rng_s} m/s: {pct:.1f}% recovered")


if __name__ == "__main__":
    main()
