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
