"""Multi-process scaling curve for the batched MPC solve (VERDICT r4
item 8; the BASELINE "efficiency at 1 host / >=2 hosts" row, as far as
this single-machine environment allows).

Weak scaling: each process holds ONE virtual CPU device and a fixed
per-process scenario batch; N processes form a jax.distributed global
`scenario` mesh and run the sharded batched solve step together.  The
parent sweeps N in {1, 2, 4}, times the collective step on process 0, and
writes SCALING.json:

    {"rows": [{"n_procs": N, "global_batch": B, "solves_per_s": S,
               "efficiency": S / (N * S_1)}, ...]}

Usage: python scripts/multihost_scaling.py           # parent
       (workers re-invoked with WORKER=i NPROC=n)
"""
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PORT = 47661
B_LOCAL = 4          # scenarios per process (weak scaling)
STEPS = 30           # timed collective steps


def worker(pid: int, nproc: int):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=1")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    from bilevel_gait_gen_tpu.parallel import multihost

    multihost.initialize(f"127.0.0.1:{PORT}", nproc, pid)
    import jax.numpy as jnp
    from bilevel_gait_gen_tpu.models import a1, rbd, srb
    from bilevel_gait_gen_tpu.mpc import gait, solver
    from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
    from bilevel_gait_gen_tpu.parallel import mesh as mesh_mod
    from bilevel_gait_gen_tpu.utils.config import MPCConfig

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

    states = jax.tree.map(lambda a: jnp.stack([a] * B_LOCAL), st)
    x0s = jnp.stack([x0] * B_LOCAL) + 0.001 * (pid + 1)
    feets = jnp.stack([feet0] * B_LOCAL)
    g_states = multihost.host_local_batch_to_global(states, mesh)
    g_x0s = multihost.host_local_batch_to_global(x0s, mesh)
    g_feets = multihost.host_local_batch_to_global(feets, mesh)

    # One dispatch per timed repetition: the CPU jax.distributed backend
    # pays ~0.4 s of cross-process coordination PER DISPATCH (measured),
    # which at tiny step sizes measures the rendezvous, not the scaling —
    # so the chain of STEPS RTIs runs inside one jitted scan
    # (mesh.batched_solve_chain), exactly as a pod-resident control loop
    # would.
    chain = mesh_mod.batched_solve_chain(cfg, params, STEPS - 1)
    t0 = jnp.asarray(0.0, dtype)
    out, stats = chain(g_states, g_x0s, t0, g_feets, x_des)   # compile
    jax.block_until_ready(stats.cost)
    reps = 3
    tic = time.perf_counter()
    for _ in range(reps):
        out, stats = chain(out, g_x0s, t0, g_feets, x_des)
    jax.block_until_ready(stats.cost)
    dt_s = time.perf_counter() - tic
    solves_per_s = reps * STEPS * B_LOCAL * nproc / dt_s
    if pid == 0:
        print(f"RESULT {json.dumps({'n_procs': nproc, 'solves_per_s': solves_per_s, 'global_batch': B_LOCAL * nproc})}",
              flush=True)


def run_n(nproc: int) -> dict:
    procs = []
    per = 1   # cores per worker FIXED across runs (weak scaling measures
              # communication overhead, not shrinking per-worker cores)
    for pid in range(nproc):
        env = dict(os.environ, WORKER=str(pid), NPROC=str(nproc),
                   PYTHONPATH=ROOT)
        env.pop("JAX_PLATFORMS", None)
        # pin each worker to a DISJOINT core set: XLA's CPU client spawns
        # an ncpu-wide intra-op pool per process, and the spin-waiting
        # cross-process collectives then starve each other on an
        # oversubscribed box (measured: the same sharded op varies
        # 0.5 -> 40-200 ms at 2 procs unpinned)
        cores = ",".join(str(c) for c in range(pid * per, (pid + 1) * per))
        procs.append(subprocess.Popen(
            ["taskset", "-c", cores, sys.executable, __file__], env=env,
            stdout=subprocess.PIPE if pid == 0 else subprocess.DEVNULL,
            stderr=subprocess.DEVNULL, text=True))
    out0, _ = procs[0].communicate(timeout=900)
    for p in procs[1:]:
        p.wait(timeout=60)
    for line in out0.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from {nproc}-proc run:\n{out0}")


def main():
    if "WORKER" in os.environ:
        worker(int(os.environ["WORKER"]), int(os.environ["NPROC"]))
        return
    import multiprocessing
    ncpu = multiprocessing.cpu_count()
    ns = [n for n in (1, 2, 4) if n <= ncpu]
    rows = []
    base = None
    for n in ns:
        r = run_n(n)
        if base is None:
            base = r["solves_per_s"]
        r["efficiency"] = r["solves_per_s"] / (n * base)
        rows.append(r)
        print(f"n_procs={n} solves/s={r['solves_per_s']:.1f} "
              f"efficiency={r['efficiency']:.3f}", flush=True)
    with open(os.path.join(ROOT, "SCALING.json"), "w") as f:
        json.dump({"rows": rows, "b_local": B_LOCAL, "steps": STEPS,
                   "note": "weak scaling, 1 virtual CPU device/process, "
                           "jax.distributed scenario mesh"}, f, indent=1)
    print("SCALING OK", flush=True)


if __name__ == "__main__":
    main()
