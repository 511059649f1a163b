"""TPU slope timing of the IPM per-iteration math components at the
production shape ([128, n=232, m=1232, p=16])."""
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
    n, m, p = qp.H.shape[0], qp.G.shape[0], qp.A.shape[0]
    print(f"n={n} m={m} p={p}", flush=True)
    B = 128
    key = jax.random.PRNGKey(0)
    with jax.default_matmul_precision("highest"):
        Hs, qs_, As, bs, Gs, hs, *_ = pdip._equilibrate(
            qp.H, qp.q, qp.A, qp.b, qp.G, qp.h)
    W0 = 10.0 ** jax.random.uniform(key, (B, m), minval=-2.0, maxval=2.0)
    lam0 = jnp.sqrt(W0)
    s0 = 1.0 / jnp.sqrt(W0)
    x_ = jnp.zeros((B, n), jnp.float32)
    y_ = jnp.zeros((B, p), jnp.float32)
    prec = jax.default_matmul_precision("highest")
    with prec:
        Ms = jax.vmap(lambda w: Hs + Gs.T @ (Gs * w[:, None])
                      + 3e-4 * jnp.eye(n, dtype=jnp.float32))(W0)
        Mis = jax.vmap(pdip._chol_inverse)(Ms)
        _force(Mis)

    g_active = jnp.any(Gs != 0, axis=-1).astype(jnp.float32)

    # ---- full _iteration_math with fixed Mi ------------------------------
    def op_iter(carry):
        x, y, lam, s = carry
        with prec:
            best = (x, y, lam, s, jnp.full((B,), jnp.inf))
            out = jax.vmap(
                lambda xb, yb, lb, sb, Mb, Mib, bb: pdip._iteration_math(
                    Hs, qs_, As, bs, Gs, hs, g_active, xb, yb, lb, sb,
                    jnp.zeros((), bool), jnp.zeros((), jnp.int32),
                    (bb[0], bb[1], bb[2], bb[3], bb[4]),
                    Mb, Mib, reg=3e-4, tol=1e-9, refine_steps=1,
                    chol_inverse_fn=pdip._chol_inverse))(
                x, y, lam, s, Ms, Mis,
                (x, y, lam, s, jnp.full((B,), jnp.inf)))
            x2, y2, lam2, s2 = out[0], out[1], out[2], out[3]
        return (x2, y2, lam2, s2)

    carry0 = (x_, y_, lam0, s0)
    print(f"iteration_math (fixed Mi)   {slope_ms(op_iter, carry0):8.3f} ms",
          flush=True)

    # ---- M formation only ------------------------------------------------
    def op_mform(w):
        with prec:
            M = jax.vmap(lambda wb: Hs + Gs.T @ (Gs * wb[:, None])
                         + 3e-4 * jnp.eye(n, dtype=jnp.float32))(w)
            return w + 1e-12 * M[:, 0, :w.shape[-1]] * 0 + w * 0 + w + 1e-12 * jnp.sum(M, axis=(1, 2))[:, None]

    print(f"M formation GtWG            {slope_ms(op_mform, W0):8.3f} ms",
          flush=True)

    # ---- Schur Si (small chol) + AMi -------------------------------------
    def op_schur(Mi):
        with prec:
            AMi = jnp.einsum('pn,bnm->bpm', As, Mi)
            S = jnp.einsum('bpm,qm->bpq', AMi, As) \
                + 1e-6 * jnp.eye(p, dtype=jnp.float32)
            Si = jax.vmap(pdip._chol_inverse)(S)
            return Mi + 1e-12 * Si[:, 0, 0, None, None]

    print(f"Schur assembly + small chol {slope_ms(op_schur, Mis):8.3f} ms",
          flush=True)

    def op_schur_unrolled(Mi):
        from bilevel_gait_gen_tpu.ops import pallas_kernels as pk
        with prec:
            AMi = jnp.einsum('pn,bnm->bpm', As, Mi)
            S = jnp.einsum('bpm,qm->bpq', AMi, As) \
                + 1e-6 * jnp.eye(p, dtype=jnp.float32)
            Si = jax.vmap(pk._chol_inverse_unrolled)(S)
            return Mi + 1e-12 * Si[:, 0, 0, None, None]

    print(f"Schur + unrolled inverse    "
          f"{slope_ms(op_schur_unrolled, Mis):8.3f} ms", flush=True)

    # ---- one solve_dir (kkt solve + refine + G ops) ----------------------
    def op_solvedir(carry):
        x, y, lam, s = carry
        with prec:
            def one(xb, yb, lb, sb, Mb, Mib):
                Wd = jnp.clip(lb / sb, 1e-8, 1e8)
                AMi = As @ Mib
                S_mat = jax.lax.dot_general(
                    AMi, As, (((1,), (1,)), ((), ()))) \
                    + 1e-6 * jnp.eye(p, dtype=jnp.float32)
                Si = pdip._chol_inverse(S_mat)
                r_d = pdip._mv(Hs, xb) + qs_ + pdip._vtm(yb, As) \
                    + pdip._vtm(lb, Gs)
                r_p = pdip._mv(As, xb) - bs
                r_g = pdip._mv(Gs, xb) + sb - hs
                rhs_c = 1e-3 / sb
                r1 = -(r_d + pdip._vtm(rhs_c - lb + Wd * r_g, Gs))
                dx, dy = pdip._kkt_solve(Mib, As, Si, r1, -r_p)
                dx, dy = pdip._refine(Mib, As, Si, Mb, r1, -r_p, dx, dy, 1)
                ds = -r_g - pdip._mv(Gs, dx)
                return xb + 1e-9 * dx, yb + 1e-9 * dy, lb, sb + 1e-12 * ds

            x2, y2, lam2, s2 = jax.vmap(one)(x, y, lam, s, Ms, Mis)
        return (x2, y2, lam2, s2)

    print(f"one solve_dir               "
          f"{slope_ms(op_solvedir, carry0):8.3f} ms", flush=True)




def extra():
    """Production-body variants: NS body vs exact body, incl. M formation."""
    import dataclasses
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
    B = 128
    key = jax.random.PRNGKey(0)
    with jax.default_matmul_precision("highest"):
        Hs, qs_, As, bs, Gs, hs, *_ = pdip._equilibrate(
            qp.H, qp.q, qp.A, qp.b, qp.G, qp.h)
    W0 = 10.0 ** jax.random.uniform(key, (B, m), minval=-2.0, maxval=2.0)
    lam0 = jnp.sqrt(W0)
    s0 = 1.0 / jnp.sqrt(W0)
    x_ = jnp.zeros((B, n), jnp.float32)
    y_ = jnp.zeros((B, p), jnp.float32)
    prec = jax.default_matmul_precision("highest")
    with prec:
        Ms = jax.vmap(lambda w: Hs + Gs.T @ (Gs * w[:, None])
                      + 3e-4 * jnp.eye(n, dtype=jnp.float32))(W0)
        Mis = jax.vmap(pdip._chol_inverse)(Ms)
        _force(Mis)
    g_active = jnp.any(Gs != 0, axis=-1).astype(jnp.float32)

    def body(carry, exact):
        x, y, lam, s, Mi_prev = carry
        with prec:
            def one(xb, yb, lb, sb, Mip):
                W = jnp.clip(lb / sb, 1e-8, 1e8)
                Gw = Gs * W[:, None]
                M = Hs + Gs.T @ Gw + 3e-4 * jnp.eye(n, dtype=jnp.float32)
                if exact:
                    Mi = pdip._chol_inverse(M)
                else:
                    Mi = pdip._ns_refresh(Mip, M, 2)
                out = pdip._iteration_math(
                    Hs, qs_, As, bs, Gs, hs, g_active, xb, yb, lb, sb,
                    jnp.zeros((), bool), jnp.zeros((), jnp.int32),
                    (xb, yb, lb, sb, jnp.asarray(jnp.inf, jnp.float32)),
                    M, Mi, reg=3e-4, tol=1e-9, refine_steps=1,
                    chol_inverse_fn=pdip._chol_inverse)
                return out[0], out[1], out[2], out[3], Mi
            x2, y2, lam2, s2, Mi2 = jax.vmap(one)(x, y, lam, s, Mi_prev)
        return (x2, y2, lam2, s2, Mi2)

    carry0 = (x_, y_, lam0, s0, Mis)
    print(f"body NS (M-form + ns2 + math)    "
          f"{slope_ms(lambda c: body(c, False), carry0, k_hi=10):8.3f} ms",
          flush=True)
    print(f"body EXACT (M-form + chol + math) "
          f"{slope_ms(lambda c: body(c, True), carry0, k_hi=10):8.3f} ms",
          flush=True)

    # M formation alone (fixed)
    def op_mf(w):
        with prec:
            M = jax.vmap(lambda wb: Hs + Gs.T @ (Gs * wb[:, None])
                         + 3e-4 * jnp.eye(n, dtype=jnp.float32))(w)
            return w + 1e-12 * jnp.sum(M, axis=(1, 2))[:, None]

    print(f"M formation GtWG highest          {slope_ms(op_mf, W0):8.3f} ms",
          flush=True)

    def op_mf_default(w):
        M = jax.vmap(lambda wb: Hs + Gs.T @ (Gs * wb[:, None])
                     + 3e-4 * jnp.eye(n, dtype=jnp.float32))(w)
        return w + 1e-12 * jnp.sum(M, axis=(1, 2))[:, None]

    print(f"M formation GtWG default          "
          f"{slope_ms(op_mf_default, W0):8.3f} ms", flush=True)


if __name__ == "__main__":
    extra()
