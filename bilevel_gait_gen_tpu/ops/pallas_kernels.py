"""Pallas TPU kernels for the interior-point hot path.

Production kernel: :func:`ipm_iter` — ONE fused kernel per interior-point
iteration.  The XLA fallback path (ops/pdip.py) emits a long stream of
small ops per iteration (W-scaling, the GtWG GEMM, Newton-Schulz refresh,
Schur assembly + 16x16 factorization, two KKT block solves, refinement,
step-length reductions, iterate updates) — each a separate HBM round trip
on the [m, n] constraint matrix and [n, n] inverses.  The fused kernel
streams the problem data HBM -> VMEM once per iteration and runs the
entire iteration (pdip._iteration_math, shared verbatim with the XLA path)
on-core: GEMMs on the MXU, reductions/updates on the VPU, the tiny p x p
Schur inverse as an unrolled in-register Cholesky.  The batch axis rides
the grid via `vmap`.

Replaces the reference's per-iteration Clarabel linear algebra
(mpc/qp/clarabel_interface.cpp:72-155) as the TPU-native hot path.

Also here: :func:`gtwg`, the standalone fused M = H + G^T diag(W) G kernel
(subsumed by ipm_iter in production; kept as a benchmarking baseline).

Interfaces degrade gracefully: on non-TPU backends (CPU tests) the XLA
reference path runs instead (or `interpret=True` runs the real kernel on
the interpreter).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


# test hook: set True to run ipm_iter on the Pallas interpreter (any
# backend) when no explicit `interpret` argument is given
INTERPRET = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def gtwg_reference(H: jax.Array, G: jax.Array, W: jax.Array) -> jax.Array:
    """XLA reference path for M = H + G^T diag(W) G (batched)."""
    with jax.default_matmul_precision("highest"):
        Gw = G * W[:, :, None]
        return H + jnp.einsum('bmi,bmj->bij', Gw, G)


def gtwg(H: jax.Array, G: jax.Array, W: jax.Array,
         block_n: int = 128, block_k: int = 512,
         interpret: bool = False) -> jax.Array:
    """Batched M = H + G^T diag(W) G via a fused Pallas kernel.

    H: [B, n, n], G: [B, m, n], W: [B, m] -> [B, n, n].  Pads n to a
    multiple of block_n and m to block_k (zero rows of G with W = 0
    contribute nothing, so padding is exact).
    """
    if not _HAS_PALLAS or (not interpret
                           and jax.default_backend() not in ("tpu", "axon")):
        return gtwg_reference(H, G, W)

    B, m, n = G.shape
    n_p = _round_up(n, block_n)
    m_p = _round_up(m, block_k)
    Hp = jnp.pad(H, ((0, 0), (0, n_p - n), (0, n_p - n)))
    Gp = jnp.pad(G, ((0, 0), (0, m_p - m), (0, n_p - n)))
    Wp = jnp.pad(W, ((0, 0), (0, m_p - m)))[:, None, :]   # [B, 1, m_p]
    n_k = m_p // block_k

    def kernel(h_ref, gi_ref, gj_ref, w_ref, out_ref, acc_ref):
        k = pl.program_id(3)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        gi = gi_ref[0].astype(jnp.float32)          # [block_k, bn] (rows i)
        gj = gj_ref[0].astype(jnp.float32)          # [block_k, bn] (rows j)
        w = w_ref[0, 0].astype(jnp.float32)         # [block_k]
        gi_w = gi * w[:, None]                      # fused diag scaling
        acc_ref[...] += jax.lax.dot_general(
            gi_w, gj, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(k == n_k - 1)
        def _():
            out_ref[0] = (acc_ref[...]
                          + h_ref[0].astype(jnp.float32)).astype(out_ref.dtype)

    grid = (B, n_p // block_n, n_p // block_n, n_k)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, block_n), lambda b, i, j, k: (b, i, j)),
            pl.BlockSpec((1, block_k, block_n), lambda b, i, j, k: (b, k, i)),
            pl.BlockSpec((1, block_k, block_n), lambda b, i, j, k: (b, k, j)),
            pl.BlockSpec((1, 1, block_k), lambda b, i, j, k: (b, 0, k)),
        ],
        out_specs=pl.BlockSpec((1, block_n, block_n),
                               lambda b, i, j, k: (b, i, j)),
        out_shape=jax.ShapeDtypeStruct((B, n_p, n_p), H.dtype),
        scratch_shapes=[pltpu.VMEM((block_n, block_n), jnp.float32)],
        interpret=interpret,
    )(Hp, Gp, Gp, Wp)
    return out[:, :n, :n]


# ----------------------------------------------------------------------------
# Fused interior-point iteration
# ----------------------------------------------------------------------------

def _chol_inverse_unrolled(S: jax.Array) -> jax.Array:
    """Explicit SPD inverse of a tiny [p, p] matrix, fully unrolled.

    Used for the p x p Schur complement inside the fused kernel: p is ~16,
    so an unrolled Cholesky + triangular back-substitution is pure VPU
    dataflow — no triangular-solve custom call, no sequential loop state.
    """
    p = S.shape[-1]
    dtype = S.dtype
    # masks built from iota (not numpy constants: a Pallas kernel may not
    # capture array constants, and iota is free on the VPU)
    idx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)[:, 0]
    U = jnp.zeros_like(S)
    Wk = S
    # row updates via masked where (NOT .at[].set: that lowers to `scatter`,
    # which Mosaic does not implement)
    for k in range(p):
        piv = jnp.maximum(Wk[k, k], jnp.asarray(1e-30, dtype))
        u_k = Wk[k, :] * jax.lax.rsqrt(piv)
        u_k = jnp.where(idx >= k, u_k, jnp.zeros((), dtype))
        U = jnp.where((idx == k)[:, None], u_k[None, :], U)
        Wk = Wk - u_k[None, :] * u_k[:, None]
    # X = U^{-1} by back substitution on the identity (rows filled bottom-up;
    # at step k every U[k, j<k] is zero and X[k] is still zero, so the row
    # product picks up exactly the j > k terms).
    X = jnp.zeros_like(S)
    for k in range(p - 1, -1, -1):
        e_k = (idx == k).astype(dtype)
        acc = (U[k:k + 1, :] @ X)[0]        # rank-2 dot (Mosaic-safe)
        X = jnp.where((idx == k)[:, None], ((e_k - acc) / U[k, k])[None, :],
                      X)
    return X @ X.T


def ipm_iter(H, q, A, b, G, h, g_active, x, y, lam, s, done, it, best,
             Mi_in, do_ns, *, reg: float, tol: float, refine_steps: int,
             ns_steps: int, interpret: bool | None = None):
    """One fused IPM iteration (math: pdip._iteration_math, shared).

    All operands must be padded so that n and m are multiples of 128
    (pdip._solve_impl does this).  `do_ns` selects (traced, scalar) between
    a Newton-Schulz refresh of Mi_in inside the kernel and using Mi_in
    as-is (the exact-Cholesky refresh stays in XLA: a batched Cholesky
    custom call beats a sequential in-kernel factorization).

    Returns (x, y, lam, s, done, it, best, Mi) with the same dtypes as the
    XLA path's scan carry.
    """
    from bilevel_gait_gen_tpu.ops import pdip as pdip_mod

    if interpret is None:
        interpret = INTERPRET
    n = q.shape[-1]
    p = b.shape[-1]
    dtype = q.dtype
    bx, by, blam, bs, bmerit = best
    pack = jnp.zeros((1, 128), dtype)
    pack = pack.at[0, 0].set(do_ns)
    pack = pack.at[0, 1].set(jnp.asarray(done, dtype))
    pack = pack.at[0, 2].set(it.astype(dtype))
    pack = pack.at[0, 3].set(bmerit)

    def kernel(h_ref, q_ref, a_ref, b_ref, g_ref, hh_ref, ga_ref,
               x_ref, y_ref, lam_ref, s_ref, bx_ref, by_ref, blam_ref,
               bs_ref, pack_ref, mi_ref,
               xo_ref, yo_ref, lamo_ref, so_ref, bxo_ref, byo_ref,
               blamo_ref, bso_ref, packo_ref, mio_ref):
        Hk = h_ref[...]
        Gk = g_ref[...]
        Ak = a_ref[...]
        qk = q_ref[0]
        bk = b_ref[0]
        hk = hh_ref[0]
        gak = ga_ref[0]
        xk = x_ref[0]
        yk = y_ref[0]
        lamk = lam_ref[0]
        sk = s_ref[0]
        pk_ = pack_ref[0]
        do_ns_k = pk_[0]
        done_k = pk_[1] > 0.5
        it_k = pk_[2]
        best_k = (bx_ref[0], by_ref[0], blam_ref[0], bs_ref[0], pk_[3])

        eps = float(jnp.finfo(dtype).eps)
        w_hi = 0.01 / eps
        Wd = jnp.clip(lamk / sk, 1.0 / w_hi, w_hi)
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        eye_n = (rows == cols).astype(dtype)
        M = Hk + jax.lax.dot_general(
            Gk * Wd[:, None], Gk, (((0,), (0,)), ((), ())),
            preferred_element_type=dtype) + reg * eye_n

        def ns_branch(Mi):
            I2 = 2.0 * eye_n
            for _ in range(ns_steps):
                Mi = jnp.dot(Mi, I2 - jnp.dot(M, Mi,
                                              preferred_element_type=dtype),
                             preferred_element_type=dtype)
            return Mi

        Mi = jax.lax.cond(do_ns_k > 0.5, ns_branch, lambda Mi: Mi,
                          mi_ref[...])

        x2, y2, lam2, s2, done2, it2, best2 = pdip_mod._iteration_math(
            Hk, qk, Ak, bk, Gk, hk, gak, xk, yk, lamk, sk, done_k, it_k,
            best_k, M, Mi, reg=reg, tol=tol, refine_steps=refine_steps,
            chol_inverse_fn=_chol_inverse_unrolled)

        xo_ref[0] = x2
        yo_ref[0] = y2
        lamo_ref[0] = lam2
        so_ref[0] = s2
        bxo_ref[0] = best2[0]
        byo_ref[0] = best2[1]
        blamo_ref[0] = best2[2]
        bso_ref[0] = best2[3]
        # nested where (not mask * value): best-merit starts at +inf and
        # 0 * inf would write NaN
        pidx = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)[:, 0]
        pout = jnp.where(
            pidx == 1, jnp.asarray(done2, dtype),
            jnp.where(pidx == 2, it2.astype(dtype),
                      jnp.where(pidx == 3, best2[4],
                                jnp.zeros((), dtype))))
        packo_ref[0] = pout
        mio_ref[...] = Mi

    vec = lambda v: v[None, :]
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    m_ = h.shape[-1]
    out_shape = (
        jax.ShapeDtypeStruct((1, n), dtype),      # x
        jax.ShapeDtypeStruct((1, p), dtype),      # y
        jax.ShapeDtypeStruct((1, m_), dtype),     # lam
        jax.ShapeDtypeStruct((1, m_), dtype),     # s
        jax.ShapeDtypeStruct((1, n), dtype),      # bx
        jax.ShapeDtypeStruct((1, p), dtype),      # by
        jax.ShapeDtypeStruct((1, m_), dtype),     # blam
        jax.ShapeDtypeStruct((1, m_), dtype),     # bs
        jax.ShapeDtypeStruct((1, 128), dtype),    # pack
        jax.ShapeDtypeStruct((n, n), dtype),      # Mi
    )
    # the iterate/best/pack/Mi operands are pure read-modify-write state:
    # aliasing them to the outputs halves their VMEM footprint (inputs
    # 7..16 -> outputs 0..9), and a raised scoped-vmem limit gives the
    # Mosaic stack allocator room for the [m, n]-sized temporaries of the
    # two KKT solves (the 16 MB default OOMs at production shapes)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[spec] * 17,
        out_specs=(spec,) * 10,
        input_output_aliases={i + 7: i for i in range(10)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024) if _HAS_PALLAS else None,
        interpret=interpret,
    )(H, vec(q), A, vec(b), G, vec(h), vec(g_active), vec(x), vec(y),
      vec(lam), vec(s), vec(bx), vec(by), vec(blam), vec(bs), pack, Mi_in)

    (x2, y2, lam2, s2, bx2, by2, blam2, bs2, pack2, Mi2) = outs
    done2 = pack2[0, 1] > 0.5
    it2 = jnp.round(pack2[0, 2]).astype(jnp.int32)
    best2 = (bx2[0], by2[0], blam2[0], bs2[0], pack2[0, 3])
    return (x2[0], y2[0], lam2[0], s2[0], done2, it2, best2, Mi2)
