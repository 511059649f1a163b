"""ADMM QP solver (OSQP-style operator splitting) — the alternative backend.

Replaces the reference's OSQPInterface (mpc/qp/osqp_interface.cpp): same
two-sided form

    min 1/2 x^T P x + q^T x   s.t.  l <= A x <= u

with the OSQP iteration (rho-scaled dual updates, over-relaxation).  TPU
fit: ONE Cholesky factorization per solve (the KKT matrix is iteration-
independent), then every sweep is two triangular solves + elementwise
projections — cheap, fixed-shape, vmappable.  Warm starts carry (x, z, y)
across control steps exactly like the reference's
prev_qp_sol/prev_dual_sol_.

The production inner loop uses the interior-point solver (ops/pdip.py);
ADMM is kept for parity (the reference demoted OSQP for derivative quality,
a1_configuration.yaml:189-200) and for cheap warm-started re-solves.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class ADMMSolution(NamedTuple):
    x: jax.Array
    z: jax.Array        # projected constraint value
    y: jax.Array        # dual
    iters: jax.Array
    pri_res: jax.Array
    dua_res: jax.Array


def solve(P: jax.Array, q: jax.Array, A: jax.Array, l: jax.Array,
          u: jax.Array, *, rho: float = 0.1, sigma: float = 1e-6,
          alpha: float = 1.6, iters: int = 200, tol: float = 1e-6,
          warm: ADMMSolution | None = None) -> ADMMSolution:
    """OSQP iteration with fixed trip count + convergence freezing.

    Reference settings analog: rho .001, scaling, warm start
    (osqp_interface.cpp:7-38); here rho defaults higher because problems
    are pre-equilibrated by the caller or small.
    """
    n = q.shape[-1]
    m = l.shape[-1]
    dtype = q.dtype

    with jax.default_matmul_precision("highest"):
        K = P + sigma * jnp.eye(n, dtype=dtype) + rho * (A.T @ A)
        L = jnp.linalg.cholesky(K)

        if warm is None:
            x = jnp.zeros(n, dtype)
            z = jnp.clip(jnp.zeros(m, dtype), l, u)
            y = jnp.zeros(m, dtype)
        else:
            x, z, y = warm.x, warm.z, warm.y

        def body(carry, _):
            x, z, y, done, it = carry
            rhs = sigma * x - q + A.T @ (rho * z - y)
            x_t = jax.scipy.linalg.solve_triangular(
                L.T, jax.scipy.linalg.solve_triangular(L, rhs, lower=True),
                lower=False)
            Ax_t = A @ x_t
            z_t = alpha * Ax_t + (1 - alpha) * z
            x_new = alpha * x_t + (1 - alpha) * x
            z_new = jnp.clip(z_t + y / rho, l, u)
            y_new = y + rho * (z_t - z_new)

            Ax = A @ x_new
            pri = jnp.max(jnp.abs(Ax - z_new))
            dua = jnp.max(jnp.abs(P @ x_new + q + A.T @ y_new))
            scale = 1.0 + jnp.max(jnp.abs(q))
            conv = (pri < tol * scale) & (dua < 1e2 * tol * scale)
            take = ~(done | conv)
            x = jnp.where(take, x_new, x)
            z = jnp.where(take, z_new, z)
            y = jnp.where(take, y_new, y)
            it = it + jnp.where(done | conv, 0, 1)
            return (x, z, y, done | conv, it), None

        init = (x, z, y, jnp.zeros((), bool), jnp.zeros((), jnp.int32))
        (x, z, y, _, it), _ = jax.lax.scan(body, init, None, length=iters)

        Ax = A @ x
        pri = jnp.max(jnp.abs(Ax - jnp.clip(Ax, l, u)))
        dua = jnp.max(jnp.abs(P @ x + q + A.T @ y))
    return ADMMSolution(x=x, z=jnp.clip(Ax, l, u), y=y, iters=it,
                        pri_res=pri, dua_res=dua)


def from_onesided(H, q, Aeq, beq, G, h):
    """Convert the one-sided (pdip) form to the two-sided ADMM form."""
    A = jnp.concatenate([Aeq, G], axis=0)
    big = jnp.asarray(1e30, q.dtype)
    l = jnp.concatenate([beq, -big * jnp.ones(h.shape[-1], q.dtype)])
    u = jnp.concatenate([beq, h])
    return H, q, A, l, u


def solve_onesided(H, q, Aeq, beq, G, h, *, rho: float = 0.1,
                   iters: int = 400, tol: float = 1e-8,
                   warm=None):
    """Drive the two-sided ADMM from the one-sided MPC form and return a
    :class:`pdip.QPSolution`-compatible result so `mpc/solver.py` can use
    ADMM as a drop-in backend (the reference's runtime solver switch,
    mpc/mpc.cpp:49,71 choosing OSQPInterface over ClarabelInterface).

    `warm` accepts either an ADMMSolution or a pdip QPSolution from a
    previous control step (prev_qp_sol/prev_dual_sol_ semantics,
    osqp_interface.cpp:30-38).
    """
    from bilevel_gait_gen_tpu.ops import pdip as pdip_mod

    P, q2, A, l, u = from_onesided(H, q, Aeq, beq, G, h)
    p = beq.shape[-1]
    m = h.shape[-1]
    dtype = q.dtype
    aw = None
    if warm is not None:
        if isinstance(warm, ADMMSolution):
            aw = warm
        else:   # pdip QPSolution: x, y (eq dual), lam >= 0 (ineq dual)
            Ax = A @ warm.x
            aw = ADMMSolution(x=warm.x, z=jnp.clip(Ax, l, u),
                              y=jnp.concatenate([warm.y, warm.lam]),
                              iters=jnp.zeros((), jnp.int32),
                              pri_res=jnp.zeros((), dtype),
                              dua_res=jnp.zeros((), dtype))
    sol = solve(P, q2, A, l, u, rho=rho, iters=iters, tol=tol, warm=aw)
    y_eq = sol.y[:p]
    lam = jnp.maximum(sol.y[p:], 0.0)
    s = jnp.maximum(h - G @ sol.x, 0.0)
    gap = jnp.abs(jnp.sum(lam * s)) / jnp.maximum(m, 1)
    pri = jnp.maximum(
        jnp.max(jnp.abs(Aeq @ sol.x - beq)) if p > 0
        else jnp.zeros((), dtype),
        jnp.max(jnp.maximum(G @ sol.x - h, 0.0)))
    return pdip_mod.QPSolution(x=sol.x, y=y_eq, lam=lam, s=s,
                               iters=sol.iters, gap=gap, pri_res=pri,
                               dua_res=sol.dua_res)


# ----------------------------------------------------------------------------
# Differentiation: IFT adjoint in the two-sided form
# ----------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def solve_primal(P, q, A, l, u, opts: tuple = ()):
    """ADMM solve returning only the primal x, differentiable w.r.t. all
    problem data.

    Backward implements the implicit-function-theorem adjoint in the
    two-sided form — the reference's OSQP derivative path
    (osqp_interface.cpp:275-312, GetDualSolution + the dl/du split by
    active side) — reusing one SPD factorization of the active-set
    penalized reduced matrix instead of a sparse KKT differential.
    """
    sol = solve(P, q, A, l, u, **dict(opts))
    return sol.x


def _solve_fwd(P, q, A, l, u, opts):
    sol = solve(P, q, A, l, u, **dict(opts))
    return sol.x, (P, q, A, l, u, sol)


def _solve_bwd(opts, res, gx):
    """Two-sided IFT adjoint.

    Active rows (|y_i| above threshold or bound gap below threshold) are
    treated as equalities A_act x = bnd with multiplier nu = y.  The adjoint
    v = (vx, vnu) solves the symmetric KKT system; we use the penalized
    reduced form (P + A^T W A + reg I) vx = gx with W = w_act on active
    rows (penalty weight ~1/eps-scale approximates the hard equality),
    vnu = W A vx.  Then

        dP = -(vx x^T + x vx^T)/2,  dq = -vx,
        dA = -(y vx^T + vnu x^T),
        dl_i = vnu_i on lower-active rows, du_i = vnu_i on upper-active
        (osqp_interface.cpp:275-312 splits dl/du by active side the same
        way; inactive rows get zero cotangent).
    """
    P, q, A, l, u, sol = res
    o = dict(opts)
    x, y = sol.x, sol.y
    dtype = x.dtype
    n = x.shape[-1]
    eps = float(jnp.finfo(dtype).eps)
    scale = 1.0 + jnp.max(jnp.abs(u) * (jnp.abs(u) < 1e20)) \
        + jnp.max(jnp.abs(x))
    act_tol = o.get("act_tol", 1e4 * eps) * scale
    y_tol = o.get("y_tol", 1e4 * eps) * (1.0 + jnp.max(jnp.abs(y)))
    w_act = jnp.asarray(o.get("w_act", 0.01 / eps), dtype)
    reg = o.get("reg", 50.0 * eps)

    with jax.default_matmul_precision("highest"):
        Ax = A @ x
        low = ((Ax - l) < act_tol) | (y < -y_tol)
        up = ((u - Ax) < act_tol) | (y > y_tol)
        active = low | up
        W = jnp.where(active, w_act, 0.0).astype(dtype)
        M = P + A.T @ (A * W[:, None]) + reg * jnp.eye(n, dtype=dtype)
        L = jnp.linalg.cholesky(M)
        vx = jax.scipy.linalg.cho_solve((L, True), gx)
        # one refinement step against the penalized matrix
        vx = vx + jax.scipy.linalg.cho_solve((L, True), gx - M @ vx)
        vnu = W * (A @ vx)

        dP = -0.5 * (jnp.outer(vx, x) + jnp.outer(x, vx))
        dq = -vx
        dA = -(jnp.outer(y, vx) + jnp.outer(vnu, x))
        dl = jnp.where(low, vnu, 0.0)
        du = jnp.where(up & ~low, vnu, 0.0)
    return (dP, dq, dA, dl, du)


solve_primal.defvjp(_solve_fwd, _solve_bwd)
