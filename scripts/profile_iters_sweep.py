"""Sweep pdip.solve iters to split per-iteration cost from fixed overhead."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import gait, qp as qp_mod
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.ops import pdip
from bilevel_gait_gen_tpu.utils.config import MPCConfig


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(jnp.sum(leaf.astype(jnp.float32)))


def slope_ms(op, arg, k_hi=6, reps=3):
    def looped(k_static):
        @jax.jit
        def f(a):
            return jax.lax.fori_loop(0, k_static, lambda _, x: op(x), a)
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
    qp = qp_mod.assemble(cfg, params, traj, x0, jnp.asarray(0.0), feet0,
                         x_des, jnp.asarray(cfg.ee_box_size))
    B = 128
    qps = jax.tree.map(lambda a: jnp.stack([a] * B), qp)

    for it in (0, 2, 4, 6, 10):
        for ee in (3,) if it else (3,):
            def op(qpd, it=it, ee=ee):
                if it == 0:
                    return qpd
                sol = jax.vmap(lambda H, q, A, b, G, h: pdip.solve(
                    H, q, A, b, G, h, iters=it, tol=cfg.ipm_tol,
                    exact_every=ee))(
                    qpd.H, qpd.q, qpd.A, qpd.b, qpd.G, qpd.h)
                return qpd._replace(q=qpd.q + 1e-12 * sol.x)

            print(f"iters={it:2d} ee={ee}: {slope_ms(op, qps):8.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
