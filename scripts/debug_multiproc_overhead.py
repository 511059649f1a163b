"""Isolate the multi-process per-step overhead: scan of trivial sharded
matmul bodies under jax.distributed CPU, 1 vs 2 procs."""
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
PORT = 47771


def worker(pid, nproc):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=1")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from bilevel_gait_gen_tpu.parallel import multihost
    multihost.initialize(f"127.0.0.1:{PORT}", nproc, pid)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = multihost.global_mesh()
    B = 4 * nproc
    n = 64

    import numpy as np
    x_local = np.ones((4, n, n), np.float32) * (pid + 1)
    x = multihost.host_local_batch_to_global(jnp.asarray(x_local), mesh)

    @jax.jit
    def chain(a):
        def body(s, _):
            return jnp.tanh(s @ s * 0.01), None
        out, _ = jax.lax.scan(body, a, None, length=30)
        return out

    out = chain(x)
    jax.block_until_ready(out)
    tic = time.perf_counter()
    for _ in range(5):
        out = chain(out)
    jax.block_until_ready(out)
    dt = time.perf_counter() - tic
    if pid == 0:
        print(f"RESULT nproc={nproc} total={dt:.3f}s per_dispatch="
              f"{dt/5*1e3:.1f}ms per_scan_step={dt/150*1e3:.2f}ms",
              flush=True)

    # experiment 3: scan with a batched CHOLESKY + triangular solve body
    @jax.jit
    def chain_chol(a):
        def body(s, _):
            M = s @ jnp.swapaxes(s, -1, -2) * 0.01 + jnp.eye(n)[None]
            L = jnp.linalg.cholesky(M)
            X = jax.scipy.linalg.solve_triangular(
                L, jnp.broadcast_to(jnp.eye(n), M.shape), lower=True)
            return jnp.tanh(X * 0.1), None
        out, _ = jax.lax.scan(body, a, None, length=30)
        return out

    out = chain_chol(x)
    jax.block_until_ready(out)
    tic = time.perf_counter()
    for _ in range(3):
        out = chain_chol(out)
    jax.block_until_ready(out)
    dt = time.perf_counter() - tic
    if pid == 0:
        print(f"RESULT3 nproc={nproc} chol per_scan_step={dt/90*1e3:.2f}ms",
              flush=True)

    # experiment 4: scan with an ARGMIN/argmax-free but where/select body
    # plus a batched eigendecomposition-free reduce-to-scalar per element
    @jax.jit
    def chain_reduce(a):
        def body(s, _):
            m = jnp.max(jnp.abs(s), axis=(-2, -1), keepdims=True)
            return jnp.tanh(s @ s * 0.01 / (1.0 + m)), None
        out, _ = jax.lax.scan(body, a, None, length=30)
        return out

    out = chain_reduce(x)
    jax.block_until_ready(out)
    tic = time.perf_counter()
    for _ in range(3):
        out = chain_reduce(out)
    jax.block_until_ready(out)
    dt = time.perf_counter() - tic
    if pid == 0:
        print(f"RESULT4 nproc={nproc} reduce per_scan_step={dt/90*1e3:.2f}ms",
              flush=True)

    # experiment 5: the REAL pieces — assemble / pdip.solve / solve_step
    import numpy as _np
    from bilevel_gait_gen_tpu.models import a1, rbd, srb
    from bilevel_gait_gen_tpu.mpc import gait, qp as qp_mod, solver
    from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
    from bilevel_gait_gen_tpu.ops import pdip
    from bilevel_gait_gen_tpu.utils.config import MPCConfig

    cfg = MPCConfig(num_nodes=6, num_phase_slots=4, phase_duration=0.5,
                    samples_per_stance=3, ee_node_start=1, ipm_iters=8,
                    max_ls_iters=3).validate()
    model = a1.make_a1()
    q0 = jnp.asarray(a1.stand_config(), jnp.float32)
    params = srb.make_srb_params(model, q0)
    x0 = srb.reconstruct_state(params, q0, jnp.zeros(model.nv, jnp.float32))
    feet0 = rbd.ee_positions(model, q0).astype(jnp.float32)
    traj = default_trajectory(cfg, gait.make_trot(cfg), x0, feet0[:, :2])
    st = solver.SolverState(traj=traj,
                            ee_box=jnp.asarray(cfg.ee_box_size, jnp.float32))
    x_des = srb.manifold_to_tangent(x0)
    Bl = 4
    states_l = jax.tree.map(lambda a: jnp.stack([a] * Bl), st)
    g_states = multihost.host_local_batch_to_global(states_l, mesh)
    g_x0s = multihost.host_local_batch_to_global(jnp.stack([x0] * Bl), mesh)
    g_feets = multihost.host_local_batch_to_global(jnp.stack([feet0] * Bl),
                                                   mesh)
    t0v = jnp.asarray(0.0, jnp.float32)

    def timeit_part(name, fn, arg):
        out = fn(arg)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        tic = time.perf_counter()
        for _ in range(3):
            out = fn(arg)
            jax.block_until_ready(jax.tree.leaves(out)[0])
        dt = time.perf_counter() - tic
        if pid == 0:
            print(f"RESULT5 nproc={nproc} {name} per_call={dt/3*1e3:.1f}ms",
                  flush=True)

    vassemble = jax.jit(jax.vmap(
        lambda s, xx, fe: qp_mod.assemble(cfg, params, s.traj, xx, t0v, fe,
                                          x_des, s.ee_box)))
    timeit_part("assemble", lambda a: vassemble(a, g_x0s, g_feets), g_states)
    qps = vassemble(g_states, g_x0s, g_feets)
    qps = jax.tree.map(lambda a: jax.block_until_ready(a), qps)
    vsolve = jax.jit(jax.vmap(lambda H, q, A, b, G, h: pdip.solve(
        H, q, A, b, G, h, iters=cfg.ipm_iters, tol=cfg.ipm_tol)))
    timeit_part("pdip.solve",
                lambda qq: vsolve(qq.H, qq.q, qq.A, qq.b, qq.G, qq.h), qps)
    vstep = jax.jit(jax.vmap(
        lambda s, xx, fe: solver.solve_step(cfg, params, s, xx, t0v, fe,
                                            x_des),
        in_axes=(0, 0, 0)))
    timeit_part("solve_step", lambda a: vstep(a, g_x0s, g_feets), g_states)

    # experiment 6: bisect pdip.solve internals
    Hs0, qs0, As0, bs0, Gs0, hs0 = qps.H, qps.q, qps.A, qps.b, qps.G, qps.h

    def v_equil(qq):
        return jax.vmap(pdip._equilibrate)(qq.H, qq.q, qq.A, qq.b, qq.G,
                                           qq.h)

    timeit_part("equilibrate", jax.jit(v_equil), qps)

    def v_init(qq):
        def one(H, q, A, b, G, h):
            Hs, qs, As, bs, Gs, hs, d, ea, eg = pdip._equilibrate(
                H, q, A, b, G, h)
            n = qs.shape[-1]
            p = bs.shape[-1]
            dtype = qs.dtype
            reg = 50.0 * float(jnp.finfo(dtype).eps)
            g_active = jnp.any(Gs != 0, axis=-1)
            M0 = Hs + jnp.maximum(reg, 1e-8) * jnp.eye(n, dtype=dtype)
            Mi0 = pdip._chol_inverse(M0)
            S0 = As @ (Mi0 @ As.T) + jnp.maximum(reg, 1e-7) * jnp.eye(
                p, dtype=dtype)
            Si0 = pdip._chol_inverse(S0)
            x, y = pdip._kkt_solve(Mi0, As, Si0, -qs, bs)
            return x, y
        return jax.vmap(one)(qq.H, qq.q, qq.A, qq.b, qq.G, qq.h)

    timeit_part("mehrotra init", jax.jit(v_init), qps)

    def v_solve2(qq):
        sol = jax.vmap(lambda H, q, A, b, G, h: pdip.solve(
            H, q, A, b, G, h, iters=2, tol=cfg.ipm_tol))(
            qq.H, qq.q, qq.A, qq.b, qq.G, qq.h)
        return sol.x

    timeit_part("solve iters=2", jax.jit(v_solve2), qps)

    def v_solve0(qq):
        sol = jax.vmap(lambda H, q, A, b, G, h: pdip.solve(
            H, q, A, b, G, h, iters=1, tol=cfg.ipm_tol))(
            qq.H, qq.q, qq.A, qq.b, qq.G, qq.h)
        return sol.x

    timeit_part("solve iters=1", jax.jit(v_solve0), qps)

    # experiment 7: which low-level op fails to partition?
    n2 = 96
    import numpy as _np2
    Ms_l = jnp.asarray(_np2.stack([_np2.eye(n2, dtype=_np2.float32) * (2.0 + i)
                                   for i in range(4)]))
    Ms_g = multihost.host_local_batch_to_global(Ms_l, mesh)

    def t_lower(Mb):
        L = jnp.linalg.cholesky(Mb)
        eye = jnp.broadcast_to(jnp.eye(n2), Mb.shape)
        return jax.scipy.linalg.solve_triangular(L, eye, lower=True)

    timeit_part("tri lower", jax.jit(t_lower), Ms_g)

    def t_upper_T(Mb):
        L = jnp.linalg.cholesky(Mb)
        eye = jnp.broadcast_to(jnp.eye(n2), Mb.shape)
        Z = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        return jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), Z, lower=False)

    timeit_part("tri lower+upperT", jax.jit(t_upper_T), Ms_g)

    def t_chol_inverse(Mb):
        return jax.vmap(pdip._chol_inverse)(Mb)

    timeit_part("chol_inverse", jax.jit(t_chol_inverse), Ms_g)

    # second experiment: per-dispatch (no scan), same body
    @jax.jit
    def one(a):
        return jnp.tanh(a @ a * 0.01)

    out = one(x)
    jax.block_until_ready(out)
    tic = time.perf_counter()
    for _ in range(30):
        out = one(out)
    jax.block_until_ready(out)
    dt = time.perf_counter() - tic
    if pid == 0:
        print(f"RESULT2 nproc={nproc} per_dispatch={dt/30*1e3:.2f}ms",
              flush=True)


def main():
    if "WORKER" in os.environ:
        worker(int(os.environ["WORKER"]), int(os.environ["NPROC"]))
        return
    for nproc in (1, 2):
        procs = []
        for pid in range(nproc):
            env = dict(os.environ, WORKER=str(pid), NPROC=str(nproc),
                       PYTHONPATH=ROOT)
            procs.append(subprocess.Popen(
                [sys.executable, __file__], env=env,
                stdout=subprocess.PIPE if pid == 0 else subprocess.DEVNULL,
                stderr=subprocess.DEVNULL, text=True))
        out0, _ = procs[0].communicate(timeout=600)
        for p in procs[1:]:
            p.wait(timeout=60)
        print(out0, flush=True)


if __name__ == "__main__":
    main()
