"""Profile the IPM's exact-sweep linear algebra on the real TPU chip.

Methodology: the axon tunnel has ~25 ms host dispatch latency and
block_until_ready does not force small graphs, so every op is timed as the
SLOPE of a K-iteration on-device fori_loop (data-dependent carry so XLA
cannot elide iterations), materialized once on host.

Run: python scripts/profile_inverse.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import gait, qp as qp_mod, solver
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.ops import pdip
from bilevel_gait_gen_tpu.utils.config import MPCConfig


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(jnp.sum(leaf.astype(jnp.float32)))


def slope_ms(op, arg, k_hi=20, reps=3):
    """Per-iteration cost of `op` via the slope of a K-iteration loop.

    op: array -> array of the same shape (data-dependent chain).
    """
    def looped(k_static):
        @jax.jit
        def f(a):
            def body(_, x):
                return op(x)
            return jax.lax.fori_loop(0, k_static, body, a)
        return f

    f1, fk = looped(1), looped(k_hi)
    _force(f1(arg)); _force(fk(arg))
    ts = []
    for f, k in ((f1, 1), (fk, k_hi)):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            _force(f(arg))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (k_hi - 1) * 1e3


def main():
    cfg = MPCConfig(ipm_iters=10, ipm_exact_every=3).validate()
    model = a1.make_a1()
    q0 = jnp.asarray(a1.stand_config(), jnp.float32)
    params = srb.make_srb_params(model, q0)
    x0 = srb.reconstruct_state(params, q0, jnp.zeros(model.nv, jnp.float32))
    feet0 = rbd.ee_positions(model, q0).astype(jnp.float32)
    traj = default_trajectory(cfg, gait.make_trot(cfg), x0, feet0[:, :2])
    x_des = srb.manifold_to_tangent(x0)
    qp = qp_mod.assemble(cfg, params, traj, x0, jnp.asarray(0.0), feet0,
                         x_des, jnp.asarray(cfg.ee_box_size))
    n, m, p = qp.H.shape[0], qp.G.shape[0], qp.A.shape[0]
    print(f"problem: n={n} m={m} p={p}", flush=True)

    B = 128
    key = jax.random.PRNGKey(0)
    W = 10.0 ** jax.random.uniform(key, (B, m), minval=-6.0, maxval=4.0)
    with jax.default_matmul_precision("highest"):
        Hs, qs_, As, bs, Gs, hs, *_ = pdip._equilibrate(
            qp.H, qp.q, qp.A, qp.b, qp.G, qp.h)
        Ms = jax.vmap(lambda w: Hs + Gs.T @ (Gs * w[:, None])
                      + 3e-4 * jnp.eye(n, dtype=jnp.float32))(W)
        _force(Ms)

    prec = jax.default_matmul_precision("highest")

    def dep(M, X):
        # data-dependent re-entry, keeps M SPD-ish
        return M + 1e-12 * X

    def op_chol(M):
        with prec:
            return dep(M, jax.vmap(pdip._chol_inverse)(M))

    def op_lu(M):
        with prec:
            return dep(M, jnp.linalg.inv(M))

    def op_cholesky_only(M):
        with prec:
            return dep(M, jnp.linalg.cholesky(M))

    def op_trisolve(M):
        with prec:
            L = jnp.tril(M) + 3.0 * jnp.eye(n)[None]
            eye = jnp.broadcast_to(jnp.eye(n, dtype=M.dtype), M.shape)
            return dep(M, jax.scipy.linalg.solve_triangular(L, eye,
                                                            lower=True))

    def op_gemm(M):
        with prec:
            return dep(M, (M @ M) * 1e-6)

    def op_gemm_default(M):
        return dep(M, (M @ M) * 1e-6)

    def op_ns2(M):
        # one NS refresh (2 steps = 4 GEMMs) from an approximate inverse
        with prec:
            X = M * 1e-3
            X = pdip._ns_refresh(X, M, 2)
            return dep(M, X)

    ops = {
        f"chol_inverse  [{B},{n},{n}]": op_chol,
        f"linalg.inv    [{B},{n},{n}]": op_lu,
        f"cholesky only [{B},{n},{n}]": op_cholesky_only,
        f"trisolve eye  [{B},{n},{n}]": op_trisolve,
        f"gemm highest  [{B},{n},{n}]": op_gemm,
        f"gemm default  [{B},{n},{n}]": op_gemm_default,
        f"ns_refresh x2 [{B},{n},{n}]": op_ns2,
    }
    for name, op in ops.items():
        print(f"{name:34s} {slope_ms(op, Ms):8.3f} ms", flush=True)

    Ss = Ms[:, :p, :p] + 10.0 * jnp.eye(p)[None]

    def op_small(S):
        with prec:
            return dep(S, jax.vmap(pdip._chol_inverse)(S))

    print(f"{'small chol    [%d,%d,%d]' % (B, p, p):34s} "
          f"{slope_ms(op_small, Ss):8.3f} ms", flush=True)

    # one full exact IPM iteration-equivalent: M-formation + chol_inverse +
    # small Schur + 2 KKT solves + refine (rough composite)
    def op_exact_iter(M):
        with prec:
            Mi = jax.vmap(pdip._chol_inverse)(M)
            AMi = jnp.einsum('pn,bnm->bpm', As, Mi)
            S = jnp.einsum('bpm,qm->bpq', AMi, As) + 1e-6 * jnp.eye(p)[None]
            Si = jax.vmap(pdip._chol_inverse)(S)
            r1 = Mi[:, :, 0]
            dx, dy = jax.vmap(pdip._kkt_solve, in_axes=(0, None, 0, 0, None))(
                Mi, As, Si, r1, bs)
            return dep(M, Mi + 1e-3 * dx[:, :, None])

    print(f"{'exact iter composite':34s} {slope_ms(op_exact_iter, Ms):8.3f}"
          " ms", flush=True)

    # full solve_step at several exact_every, via slope over a 2-iteration
    # chain (state-dependent)
    st = solver.SolverState(traj=traj,
                            ee_box=jnp.asarray(cfg.ee_box_size, jnp.float32))
    st, _ = jax.jit(lambda s: solver.create_initial_run(
        cfg, params, s, x0, feet0, x_des))(st)
    sts = jax.tree.map(lambda a: jnp.stack([a] * B), st)
    x0s = jnp.stack([x0] * B)
    feets = jnp.stack([feet0] * B)

    import dataclasses
    for ee_ in (1, 3, 10):
        cfg_e = dataclasses.replace(cfg, ipm_exact_every=ee_)

        def chain(k_static):
            @jax.jit
            def f(states):
                def body(_, s):
                    s2, _ = jax.vmap(
                        lambda si, x, fe: solver.solve_step(
                            cfg_e, params, si, x,
                            jnp.asarray(0.05, jnp.float32), fe, x_des,
                            shift_window=False))(s, x0s, feets)
                    return s2
                return jax.lax.fori_loop(0, k_static, body, states)
            return f

        f1, f5 = chain(1), chain(5)
        _force(f1(sts).traj.x_man); _force(f5(sts).traj.x_man)
        t1 = min(_t(f1, sts) for _ in range(3))
        t5 = min(_t(f5, sts) for _ in range(3))
        print(f"solve_step slope batch128 exact_every={ee_:2d} "
              f"{(t5 - t1) / 4 * 1e3:8.2f} ms", flush=True)


def _t(f, arg):
    t0 = time.perf_counter()
    _force(f(arg).traj.x_man)
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
