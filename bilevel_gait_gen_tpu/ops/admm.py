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


def _ruiz_equilibrate(P, q, A, n_iters: int = 10):
    """Ruiz equilibration of the [[P, A^T], [A, 0]] block matrix plus a
    cost scalar c — OSQP's `scaling` setting (osqp_interface.cpp:14 sets
    scaling=100; 10 sweeps reach machine-balance on these problems).

    Returns (Ph, qh, Ah, d_x, d_c, c) with Ph = c Dx P Dx, Ah = Dc A Dx.
    """
    n = q.shape[-1]
    m = A.shape[-2]
    dtype = q.dtype
    d_x = jnp.ones(n, dtype)
    d_c = jnp.ones(m, dtype)
    c = jnp.ones((), dtype)
    Ph, qh, Ah = P, q, A

    def body(carry, _):
        Ph, qh, Ah, d_x, d_c, c = carry
        # column norms of the stacked [Ph; Ah] block for x-scaling
        col = jnp.sqrt(jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Ph), axis=0),
                        jnp.max(jnp.abs(Ah), axis=0)), 1e-8))
        row = jnp.sqrt(jnp.maximum(jnp.max(jnp.abs(Ah), axis=1), 1e-8))
        e_x = 1.0 / col
        e_c = 1.0 / row
        Ph = Ph * e_x[:, None] * e_x[None, :]
        qh = qh * e_x
        Ah = Ah * e_c[:, None] * e_x[None, :]
        d_x = d_x * e_x
        d_c = d_c * e_c
        # cost scaling: balance the quadratic part against the linear part
        g = 1.0 / jnp.maximum(
            jnp.maximum(jnp.mean(jnp.max(jnp.abs(Ph), axis=0)),
                        jnp.max(jnp.abs(qh))), 1e-8)
        Ph = Ph * g
        qh = qh * g
        c = c * g
        return (Ph, qh, Ah, d_x, d_c, c), None

    (Ph, qh, Ah, d_x, d_c, c), _ = jax.lax.scan(
        body, (Ph, qh, Ah, d_x, d_c, c), None, length=n_iters)
    return Ph, qh, Ah, d_x, d_c, c


def solve(P: jax.Array, q: jax.Array, A: jax.Array, l: jax.Array,
          u: jax.Array, *, rho: float = 0.1, sigma: float = 1e-6,
          alpha: float = 1.6, iters: int = 200, tol: float = 1e-6,
          warm: ADMMSolution | None = None, scaling: int = 10,
          adaptive_rho: bool = True) -> ADMMSolution:
    """OSQP iteration: Ruiz equilibration, vector rho with equality rows
    boosted 1e3x, adaptive rho on the primal/dual residual ratio
    (refactoring the KKT at fixed segment boundaries so the trip count
    stays static under jit), over-relaxation, convergence freezing.

    Reference settings analog: rho .001, scaling 100, warm start
    (osqp_interface.cpp:7-38).  Residuals are reported UNSCALED.
    """
    n = q.shape[-1]
    m = l.shape[-1]
    dtype = q.dtype

    with jax.default_matmul_precision("highest"):
        if scaling > 0:
            Ph, qh, Ah, d_x, d_c, c = _ruiz_equilibrate(P, q, A, scaling)
        else:
            Ph, qh, Ah = P, q, A
            d_x = jnp.ones(n, dtype)
            d_c = jnp.ones(m, dtype)
            c = jnp.ones((), dtype)
        lh = l * d_c
        uh = u * d_c
        is_eq = (u - l) < 1e-12
        inv_dx = 1.0 / d_x
        inv_dc = 1.0 / d_c

        if warm is None:
            x = jnp.zeros(n, dtype)
            z = jnp.clip(jnp.zeros(m, dtype), lh, uh)
            y = jnp.zeros(m, dtype)
        else:       # scale the unscaled warm start in
            x = warm.x * inv_dx
            z = jnp.clip(warm.z * d_c, lh, uh)
            y = warm.y * c * inv_dc

        # segments: refactor K when rho adapts (static count under jit)
        n_seg = 4 if adaptive_rho else 1
        seg_len = max(iters // n_seg, 1)
        rho0 = jnp.asarray(rho, dtype)

        def run_segment(carry, _):
            x, z, y, done, it, rho_s = carry
            rho_vec = jnp.where(is_eq, 1e3 * rho_s, rho_s)
            K = Ph + sigma * jnp.eye(n, dtype=dtype) \
                + (Ah.T * rho_vec[None, :]) @ Ah
            L = jnp.linalg.cholesky(K)

            def body(carry, _):
                x, z, y, done, it, _, _ = carry
                rhs = sigma * x - qh + Ah.T @ (rho_vec * z - y)
                x_t = jax.scipy.linalg.solve_triangular(
                    L.T, jax.scipy.linalg.solve_triangular(
                        L, rhs, lower=True), lower=False)
                Ax_t = Ah @ x_t
                z_t = alpha * Ax_t + (1 - alpha) * z
                x_new = alpha * x_t + (1 - alpha) * x
                z_new = jnp.clip(z_t + y / rho_vec, lh, uh)
                y_new = y + rho_vec * (z_t - z_new)

                # UNSCALED residuals (x_u = Dx x, y_u = Dc y / c)
                Ax_u = (Ah @ x_new) * inv_dc
                z_u = z_new * inv_dc
                pri = jnp.max(jnp.abs(Ax_u - z_u))
                dua = jnp.max(jnp.abs(
                    (Ph @ x_new + qh + Ah.T @ y_new) * inv_dx)) / c
                scale = 1.0 + jnp.max(jnp.abs(q))
                conv = (pri < tol * scale) & (dua < 1e2 * tol * scale)
                take = ~(done | conv)
                x = jnp.where(take, x_new, x)
                z = jnp.where(take, z_new, z)
                y = jnp.where(take, y_new, y)
                it = it + jnp.where(done | conv, 0, 1)
                return (x, z, y, done | conv, it, pri, dua), None

            init = (x, z, y, done, it, jnp.zeros((), dtype),
                    jnp.zeros((), dtype))
            (x, z, y, done, it, pri, dua), _ = jax.lax.scan(
                body, init, None, length=seg_len)
            # OSQP rho adaptation: sqrt of the residual ratio, clipped
            ratio = jnp.sqrt((pri + 1e-12) / (dua + 1e-12))
            rho_s = jnp.clip(rho_s * jnp.clip(ratio, 0.1, 10.0),
                             1e-6, 1e6)
            return (x, z, y, done, it, rho_s), None

        init = (x, z, y, jnp.zeros((), bool), jnp.zeros((), jnp.int32),
                rho0)
        (x, z, y, _, it, _), _ = jax.lax.scan(run_segment, init, None,
                                              length=n_seg)

        # unscale (x = Dx x^, y = Dc y^ / c)
        x = x * d_x
        y = y * d_c / c
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
