"""Break solve_step's ~140 ms batch-128 cost into stages (slope timing)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import gait, qp as qp_mod, solver
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory, ravel_u, make_unravel
from bilevel_gait_gen_tpu.ops import pdip
from bilevel_gait_gen_tpu.utils.config import MPCConfig


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(jnp.sum(leaf.astype(jnp.float32)))


def slope_ms(op, arg, k_hi=10, reps=3):
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
    for f in (f1, fk):
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

    st = solver.SolverState(traj=traj,
                            ee_box=jnp.asarray(cfg.ee_box_size, jnp.float32))
    st, _ = jax.jit(lambda s: solver.create_initial_run(
        cfg, params, s, x0, feet0, x_des))(st)

    B = 128
    sts = jax.tree.map(lambda a: jnp.stack([a] * B), st)
    x0s = jnp.stack([x0] * B)
    feets = jnp.stack([feet0] * B)
    t0v = jnp.asarray(0.05, jnp.float32)
    unravel = make_unravel(cfg)

    # ---- stage ops, each state -> state so fori_loop chains -------------
    def op_assemble(s):
        qp = jax.vmap(lambda si, x, fe: qp_mod.assemble(
            cfg, params, si.traj, x, t0v, fe, x_des, si.ee_box))(
            s, x0s, feets)
        # fold back into state so the loop is data-dependent
        tm = s.traj.x_man + 1e-12 * qp.q[:, 0, None, None]
        return jax.tree.map(
            lambda a, b: b if a is not s.traj.x_man else tm,
            s, s, is_leaf=lambda x: x is s.traj.x_man) \
            if False else s.__class__(
                traj=s.traj.__class__(
                    x_man=tm, f_nodes=s.traj.f_nodes,
                    footholds=s.traj.footholds, sched=s.traj.sched),
                ee_box=s.ee_box, qp_warm=s.qp_warm)

    qp0 = jax.jit(jax.vmap(lambda si, x, fe: qp_mod.assemble(
        cfg, params, si.traj, x, t0v, fe, x_des, si.ee_box)))(
        sts, x0s, feets)
    _force(qp0.H)

    def op_solve(qp):
        sol = jax.vmap(lambda H, q, A, b, G, h, w: pdip.solve(
            H, q, A, b, G, h, iters=cfg.ipm_iters, tol=cfg.ipm_tol,
            exact_every=cfg.ipm_exact_every, warm=w))(
            qp.H, qp.q, qp.A, qp.b, qp.G, qp.h, sts.qp_warm)
        return qp._replace(q=qp.q + 1e-12 * sol.x)

    def op_solve_exact1(qp):
        sol = jax.vmap(lambda H, q, A, b, G, h, w: pdip.solve(
            H, q, A, b, G, h, iters=cfg.ipm_iters, tol=cfg.ipm_tol,
            exact_every=1, warm=w))(
            qp.H, qp.q, qp.A, qp.b, qp.G, qp.h, sts.qp_warm)
        return qp._replace(q=qp.q + 1e-12 * sol.x)

    def op_solve_cold(qp):
        sol = jax.vmap(lambda H, q, A, b, G, h: pdip.solve(
            H, q, A, b, G, h, iters=cfg.ipm_iters, tol=cfg.ipm_tol,
            exact_every=cfg.ipm_exact_every))(
            qp.H, qp.q, qp.A, qp.b, qp.G, qp.h)
        return qp._replace(q=qp.q + 1e-12 * sol.x)

    # merit line search in isolation
    u_prev = jax.vmap(lambda s: ravel_u(s.traj.f_nodes, s.traj.footholds))(sts)
    xs_prev = jax.vmap(jax.vmap(srb.manifold_to_tangent))(sts.traj.x_man)

    def op_merit(u):
        def one(ub, xsb, s):
            mu = jnp.asarray(cfg.merit_mu, jnp.float32)

            def merit_at(alpha):
                u_a = ub * alpha
                xs_a = xsb * alpha
                fn_a, fh_a = unravel(u_a)
                defect = solver._defect_l1(cfg, params, xs_a, fn_a, fh_a,
                                           s.traj.sched.bounds, t0v)
                cost = qp_mod.cost_value(cfg, xs_a, u_a, x_des)
                return mu * defect + cost

            alphas = 0.5 ** jnp.arange(cfg.max_ls_iters + 1, jnp.float32)
            return jax.vmap(merit_at)(alphas)

        m = jax.vmap(one)(u, xs_prev, sts)
        return u + 1e-12 * m[:, 0, None]

    print("stage slopes (batch 128):", flush=True)
    print(f"  assemble           {slope_ms(op_assemble, sts):8.2f} ms",
          flush=True)
    print(f"  pdip warm ee=3     {slope_ms(op_solve, qp0):8.2f} ms",
          flush=True)
    print(f"  pdip warm ee=1     {slope_ms(op_solve_exact1, qp0):8.2f} ms",
          flush=True)
    print(f"  pdip cold ee=3     {slope_ms(op_solve_cold, qp0):8.2f} ms",
          flush=True)
    print(f"  merit line search  {slope_ms(op_merit, u_prev):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
