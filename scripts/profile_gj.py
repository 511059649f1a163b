"""TPU slope timing: spd_inverse (Pallas GJ) vs _chol_inverse, and
pdip.solve with inverse="gj" vs "chol"."""
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
from bilevel_gait_gen_tpu.ops import pallas_kernels as pk
from bilevel_gait_gen_tpu.ops import pdip
from bilevel_gait_gen_tpu.utils.config import MPCConfig


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(jnp.sum(leaf.astype(jnp.float32)))


def slope_ms(op, arg, k_hi=20, reps=3):
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
    n, m = qp.H.shape[0], qp.G.shape[0]
    B = 128
    key = jax.random.PRNGKey(0)
    W = 10.0 ** jax.random.uniform(key, (B, m), minval=-6.0, maxval=4.0)
    with jax.default_matmul_precision("highest"):
        Hs, _, As, bs, Gs, hs, *_ = pdip._equilibrate(
            qp.H, qp.q, qp.A, qp.b, qp.G, qp.h)
        Ms = jax.vmap(lambda w: Hs + Gs.T @ (Gs * w[:, None])
                      + 3e-4 * jnp.eye(n, dtype=jnp.float32))(W)
        _force(Ms)
    prec = jax.default_matmul_precision("highest")

    def dep(M, X):
        return M + 1e-12 * X

    def op_gj(M):
        with prec:
            return dep(M, pk.spd_inverse(M))

    def op_chol(M):
        with prec:
            return dep(M, jax.vmap(pdip._chol_inverse)(M))

    print(f"spd_inverse gj [128,{n},{n}]  {slope_ms(op_gj, Ms):8.3f} ms",
          flush=True)
    print(f"chol_inverse   [128,{n},{n}]  {slope_ms(op_chol, Ms):8.3f} ms",
          flush=True)

    # residual parity on the real equilibrated IPM matrices
    with prec:
        Xg = pk.spd_inverse(Ms[:4])
        Xc = jax.vmap(pdip._chol_inverse)(Ms[:4])
        eye = jnp.eye(n, dtype=jnp.float32)
        rg = jnp.max(jnp.abs(Ms[:4] @ Xg - eye), axis=(1, 2))
        rc = jnp.max(jnp.abs(Ms[:4] @ Xc - eye), axis=(1, 2))
    print("resid gj  :", np.asarray(rg), flush=True)
    print("resid chol:", np.asarray(rc), flush=True)

    # full solve comparison
    for invm in ("chol", "gj"):
        def op_solve(qpd, invm=invm):
            sol = jax.vmap(lambda H, q, A, b, G, h: pdip.solve(
                H, q, A, b, G, h, iters=10, tol=cfg.ipm_tol,
                exact_every=3, inverse=invm))(
                qpd.H, qpd.q, qpd.A, qpd.b, qpd.G, qpd.h)
            return qpd._replace(q=qpd.q + 1e-12 * sol.x)

        qps = jax.tree.map(lambda a: jnp.stack([a] * B), qp)
        print(f"pdip.solve inverse={invm:5s} ee=3  "
              f"{slope_ms(op_solve, qps, k_hi=5):8.2f} ms", flush=True)

    # solution quality parity
    qps1 = jax.tree.map(lambda a: jnp.stack([a] * 4), qp)
    s_c = jax.jit(jax.vmap(lambda H, q, A, b, G, h: pdip.solve(
        H, q, A, b, G, h, iters=10, tol=cfg.ipm_tol, exact_every=3,
        inverse="chol")))(qps1.H, qps1.q, qps1.A, qps1.b, qps1.G, qps1.h)
    s_g = jax.jit(jax.vmap(lambda H, q, A, b, G, h: pdip.solve(
        H, q, A, b, G, h, iters=10, tol=cfg.ipm_tol, exact_every=3,
        inverse="gj")))(qps1.H, qps1.q, qps1.A, qps1.b, qps1.G, qps1.h)
    print("gap  chol", np.asarray(s_c.gap), " gj", np.asarray(s_g.gap))
    print("pri  chol", np.asarray(s_c.pri_res), " gj", np.asarray(s_g.pri_res))
    print("x diff max", float(jnp.abs(s_c.x - s_g.x).max()))


if __name__ == "__main__":
    main()
