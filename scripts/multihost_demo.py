"""Multi-process (multi-host-style) smoke test on local CPU processes.

Spawns N processes, each with 2 virtual CPU devices, initializes
jax.distributed, builds the global scenario mesh, and runs a sharded batched
MPC solve step + a cross-process reduction.  This is the same code path a
TPU pod slice uses (DCN data parallelism over `scenario`).

Usage: python scripts/multihost_demo.py            # parent: spawns workers
       (workers are re-invoked with WORKER=i)
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_PROC = 2
PORT = 47555


def worker(pid: int):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from bilevel_gait_gen_tpu.parallel import multihost

    multihost.initialize(f"127.0.0.1:{PORT}", NUM_PROC, pid)
    import jax.numpy as jnp
    from bilevel_gait_gen_tpu.models import a1, rbd, srb
    from bilevel_gait_gen_tpu.mpc import gait, solver
    from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
    from bilevel_gait_gen_tpu.parallel import mesh as mesh_mod
    from bilevel_gait_gen_tpu.utils.config import MPCConfig

    assert len(jax.devices()) == 2 * NUM_PROC, jax.devices()
    mesh = multihost.global_mesh()

    cfg = MPCConfig(num_nodes=6, num_phase_slots=4, phase_duration=0.5,
                    samples_per_stance=3, ee_node_start=1, ipm_iters=8,
                    max_ls_iters=3).validate()
    dtype = jnp.float32
    model = a1.make_a1()
    q0 = jnp.asarray(a1.stand_config(), dtype)
    params = srb.make_srb_params(model, q0)
    x0 = srb.reconstruct_state(params, q0, jnp.zeros(model.nv, dtype))
    feet0 = rbd.ee_positions(model, q0).astype(dtype)
    traj = default_trajectory(cfg, gait.make_trot(cfg), x0, feet0[:, :2])
    st = solver.SolverState(traj=traj,
                            ee_box=jnp.asarray(cfg.ee_box_size, dtype))
    x_des = srb.manifold_to_tangent(x0)

    # per-host local batch (2 scenarios / host) -> global sharded batch
    B_local = 2
    states = jax.tree.map(lambda a: jnp.stack([a] * B_local), st)
    x0s = jnp.stack([x0] * B_local) + 0.001 * (pid + 1)
    feets = jnp.stack([feet0] * B_local)
    g_states = multihost.host_local_batch_to_global(states, mesh)
    g_x0s = multihost.host_local_batch_to_global(x0s, mesh)
    g_feets = multihost.host_local_batch_to_global(feets, mesh)

    step = mesh_mod.batched_solve_step(cfg, params)
    out, stats = step(g_states, g_x0s, jnp.asarray(0.0, dtype), g_feets,
                      x_des)
    mean_cost = float(jnp.mean(stats.cost))  # cross-process reduction
    print(f"[worker {pid}] global batch {2 * NUM_PROC} scenarios, "
          f"mean cost {mean_cost:.2f}, devices {len(jax.devices())}",
          flush=True)


def main():
    if "WORKER" in os.environ:
        worker(int(os.environ["WORKER"]))
        return
    procs = []
    for pid in range(NUM_PROC):
        env = dict(os.environ, WORKER=str(pid),
                   PYTHONPATH=os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))))
        procs.append(subprocess.Popen([sys.executable, __file__], env=env))
    codes = [p.wait(timeout=600) for p in procs]
    print("worker exit codes:", codes)
    assert all(c == 0 for c in codes), codes
    print("MULTIHOST OK")


if __name__ == "__main__":
    main()
