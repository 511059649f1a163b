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


# ----------------------------------------------------------------------------
# Batched SPD inverse: in-VMEM Gauss-Jordan leaves + 128-aligned Schur
# ----------------------------------------------------------------------------

def _gj_kernel(m_ref, out_ref):
    """In-place Gauss-Jordan inverse of one [n, n] SPD matrix, entirely in
    VMEM.

    The production exact-sweep bottleneck is the batched Cholesky + two
    triangular passes (XLA expands them into long sequential
    dynamic-update-slice loops with an HBM round trip per panel).  Here the
    whole matrix stays in VMEM across all n elimination steps; each step is
    a masked rank-1 update — pure VPU dataflow, no scatters (Mosaic has no
    scatter), no custom calls.  GJ without pivoting is the SPD-safe
    elimination (pivots are Schur-complement diagonals, positive for SPD);
    unlike a Cholesky it has no sqrt to NaN on a marginally indefinite
    f32 matrix.
    """
    n = m_ref.shape[-1]
    dtype = m_ref.dtype
    A0 = m_ref[...]
    # all masks/reductions stay 2-D: Mosaic's vector layouts reject 1-D
    # multi_reductions ("Offset change") and 0-D scalar reduces of lane
    # vectors; keepdims keeps every intermediate in a (sublane, lane) tile
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)     # [n, 1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)     # [1, n]

    def step(j, A):
        oh_r = row_ids == j                            # [n, 1]
        oh_c = col_ids == j                            # [1, n]
        # rowj = A[j, :], col = A[:, j] via masked keepdims reduces (no
        # dynamic lane indexing on TPU)
        rowj = jnp.sum(jnp.where(oh_r, A, 0.0), axis=0,
                       keepdims=True)                  # [1, n]
        p = jnp.sum(jnp.where(oh_c, rowj, 0.0), axis=1,
                    keepdims=True)                     # [1, 1] = A[j, j]
        # SPD pivots are positive; the floor only guards exact zeros from
        # all-masked padding
        pinv = 1.0 / jnp.where(jnp.abs(p) < 1e-30, 1e-30, p)
        rowj_m = jnp.where(oh_c, 1.0, rowj) * pinv               # [1, n]
        col = jnp.sum(jnp.where(oh_c, A, 0.0), axis=1,
                      keepdims=True)                   # [n, 1]
        colz = jnp.where(oh_r, 0.0, col)                         # [n, 1]
        upd = A - colz * rowj_m
        colh = pinv * (oh_r.astype(dtype) - colz)                # [n, 1]
        return jnp.where(oh_c, colh, jnp.where(oh_r, rowj_m, upd))

    out_ref[...] = jax.lax.fori_loop(0, n, step, A0)


def _gj_block(A0, n: int, dtype):
    """Masked scalar GJ inverse of one [n, n] block held as a VALUE (the
    per-step math of `_gj_kernel`, reused for the diagonal blocks of the
    blocked kernel)."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def step(j, A):
        oh_r = row_ids == j
        oh_c = col_ids == j
        rowj = jnp.sum(jnp.where(oh_r, A, 0.0), axis=0, keepdims=True)
        p = jnp.sum(jnp.where(oh_c, rowj, 0.0), axis=1, keepdims=True)
        pinv = 1.0 / jnp.where(jnp.abs(p) < 1e-30, 1e-30, p)
        rowj_m = jnp.where(oh_c, 1.0, rowj) * pinv
        col = jnp.sum(jnp.where(oh_c, A, 0.0), axis=1, keepdims=True)
        colz = jnp.where(oh_r, 0.0, col)
        upd = A - colz * rowj_m
        colh = pinv * (oh_r.astype(dtype) - colz)
        return jnp.where(oh_c, colh, jnp.where(oh_r, rowj_m, upd))

    return jax.lax.fori_loop(0, n, step, A0)


def _gj_kernel_blocked(m_ref, out_ref):
    """Blocked-panel Gauss-Jordan inverse: 128-wide block pivots.

    The scalar kernel's n full-matrix rank-1 passes are VPU-bound at the
    same ~10 ms/batch-128 as the XLA Cholesky they replace.  Block pivots
    restructure the elimination so the O(n^3) work is nb=n/128 MXU panel
    products ([n,128] @ [128,n]) and only the nb diagonal-block inverses
    run the scalar masked GJ (on [128,128], (n/128)^2 x cheaper per step).
    All slices/concats are at static 128-aligned offsets (the Python loop
    is unrolled), so Mosaic sees tile-aligned ops only.

    Block step (identity-trick in-place form, the block generalization of
    the scalar kernel — note the explicit column-panel overwrite, exactly
    as the scalar version needs its `colh`):

        Dinv  = inv(A[J,J])
        rowJ  = Dinv @ (A[J,:] with block J := I)      (row panel)
        colz  = A[:,J] with block J := 0
        A    -= colz @ rowJ                            (MXU rank-128 update)
        A[J,:] = rowJ;  A[:,J] = -colz @ Dinv with block J := Dinv
    """
    n = m_ref.shape[-1]
    dtype = m_ref.dtype
    w = 128
    nb = n // w
    A = m_ref[...]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)     # [1, n]
    row_ids_w = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)   # [w, 1]
    col_ids_w = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)   # rows of A

    eye_w = (jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)).astype(dtype)
    for J in range(nb):
        lo = J * w
        D = A[lo:lo + w, lo:lo + w]
        Dinv = _gj_block(D, w, dtype)
        # polish the block inverse (cheap [w, w] GEMMs); the remaining
        # near-singular-matrix instability is structural (the panel
        # products ARE a 2x2 Schur assembly) and handled by the SHIFT +
        # deflation in spd_inverse, not here
        hi = jax.lax.Precision.HIGHEST
        for _ in range(1):
            Dinv = jax.lax.dot_general(
                Dinv, 2.0 * eye_w - jax.lax.dot_general(
                    D, Dinv, (((1,), (0,)), ((), ())),
                    preferred_element_type=dtype, precision=hi),
                (((1,), (0,)), ((), ())), preferred_element_type=dtype,
                precision=hi)
        rowJ = A[lo:lo + w, :]                                   # [w, n]
        in_cols = (col_ids >= lo) & (col_ids < lo + w)           # [1, n]
        eye_at_J = ((row_ids_w + lo) == col_ids).astype(dtype)   # [w, n]
        rowJ_mod = jnp.where(in_cols, eye_at_J, rowJ)
        rowJ_m = jax.lax.dot_general(
            Dinv, rowJ_mod, (((1,), (0,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST)                 # [w, n]
        colJ = A[:, lo:lo + w]                                   # [n, w]
        in_rows = (col_ids_w >= lo) & (col_ids_w < lo + w)       # [n, 1]
        colz = jnp.where(in_rows, 0.0, colJ)
        A = A - jax.lax.dot_general(
            colz, rowJ_m, (((1,), (0,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST)                 # MXU update
        # overwrite row panel J (static sublane concat)
        parts = []
        if lo:
            parts.append(A[:lo, :])
        parts.append(rowJ_m)
        if lo + w < n:
            parts.append(A[lo + w:, :])
        A = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        # overwrite column panel J: -colz @ Dinv, with block J := Dinv
        colh = -jax.lax.dot_general(colz, Dinv, (((1,), (0,)), ((), ())),
                                    preferred_element_type=dtype,
                                    precision=jax.lax.Precision.HIGHEST)
        cparts = []
        if lo:
            cparts.append(colh[:lo, :])
        cparts.append(Dinv)
        if lo + w < n:
            cparts.append(colh[lo + w:, :])
        colh = (jnp.concatenate(cparts, axis=0) if len(cparts) > 1
                else cparts[0])
        lparts = []
        if lo:
            lparts.append(A[:, :lo])
        lparts.append(colh)
        if lo + w < n:
            lparts.append(A[:, lo + w:])
        A = jnp.concatenate(lparts, axis=1) if len(lparts) > 1 else lparts[0]

    out_ref[...] = A


def gj_inverse(M: jax.Array, interpret: bool | None = None) -> jax.Array:
    """Batched SPD inverse of [..., n, n] via the Gauss-Jordan kernel.

    n must be a multiple of 128 (pad with an identity block — see
    `spd_inverse`).  Batch dims ride the grid via vmap.  Falls back to the
    Cholesky path off-TPU unless `interpret`.
    """
    if interpret is None:
        interpret = INTERPRET
    if not _HAS_PALLAS or (not interpret
                           and jax.default_backend() not in ("tpu", "axon")):
        from bilevel_gait_gen_tpu.ops import pdip as pdip_mod
        return pdip_mod._chol_inverse(M)

    n = M.shape[-1]
    kernel = _gj_kernel_blocked if n % 128 == 0 else _gj_kernel

    def one(Mi):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, n), M.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(Mi)

    fn = one
    for _ in range(M.ndim - 2):
        fn = jax.vmap(fn)
    return fn(M)


def spd_inverse(M: jax.Array, interpret: bool | None = None,
                shift: float = 1e-3, deflate: int = 10) -> jax.Array:
    """SPD inverse of [..., n, n] for arbitrary n: Jacobi-scale to unit
    diagonal, pad to a multiple of 128 (identity padding block — exact),
    blocked-GJ-invert the SHIFTED matrix M + shift*I, then deflate the
    shift with guarded Newton-Schulz steps, unscale.

    Why the shift: BOTH explicit block assemblies tried here — the 2x2
    recursive Schur recombination AND the blocked-panel GJ (which is the
    same algebra per panel) — cancel catastrophically on near-singular
    matrices (measured on the real Mehrotra-init matrix, kappa 3e6 after
    Jacobi scaling: blocked residual 8.5 vs Cholesky's 1.7e-2; the scalar
    elimination is stable but VPU-bound at the same ~10 ms as the XLA
    Cholesky it would replace).  Shifting by `shift` (relative to the unit
    Jacobi diagonal) bounds the blocked recursion's condition number to
    ~n/shift, where it is accurate; the guarded deflation
    X <- X (2I - Mj X) then squares the residual r0 ~ shift/(shift +
    lambda_min) < 1 down to the kappa*eps floor (measured: matches
    `_chol_inverse` on the real init matrix).  The guard keeps the
    best-residual iterate per batch element, so degradation is graceful.
    Cost: the kernel's MXU panel products + 3*deflate GEMMs — measured
    5.6 ms kernel + ~2 ms deflation vs 10.3 ms for the batched Cholesky
    expansion at [128, 232, 232].

    STATUS: EXPERIMENTAL (cfg.ipm_inverse="gj").  Correct and faster on
    cold/moderate-W IPM matrices (validated on the real Mehrotra-init
    matrix and the random-W spectrum, TPU-measured), but WARM-started
    solves clip W into [1.2e-5, 8e4], putting the Jacobi-scaled spectrum
    spread past 1e9 — there the deflation's initial residual
    shift/(shift+lambda_min) rounds to 1.0 in f32 and the weak subspace
    never deflates (measured: warm RTIs fail their solve-quality gate
    while cold solves pass).  Spanning that range needs a sequential
    factorization (the Cholesky, or a LAPACK-style right-looking blocked
    elimination whose panel pivots stay sequential); parked.
    """
    n = M.shape[-1]
    n_p = _round_up(n, 128)
    with jax.default_matmul_precision("highest"):
        dg = jnp.diagonal(M, axis1=-2, axis2=-1)
        d = jax.lax.rsqrt(jnp.maximum(
            dg, 1e-12 * jnp.maximum(jnp.max(dg, axis=-1, keepdims=True),
                                    1.0)))
        Mj = M * d[..., :, None] * d[..., None, :]
    if n_p != n:
        pad = [(0, 0)] * (M.ndim - 2) + [(0, n_p - n), (0, n_p - n)]
        Mp = jnp.pad(Mj, pad)
        eye_tail = jnp.concatenate(
            [jnp.zeros(n, M.dtype), jnp.ones(n_p - n, M.dtype)])
        Mp = Mp + jnp.diag(eye_tail)
    else:
        Mp = Mj
    eye_p = jnp.eye(n_p, dtype=M.dtype)
    out = gj_inverse(Mp + shift * eye_p, interpret=interpret)
    if deflate:
        with jax.default_matmul_precision("highest"):
            def resid(X):
                return jnp.max(jnp.abs(Mp @ X - eye_p), axis=(-2, -1))

            r_best = resid(out)
            for _ in range(deflate):
                cand = out @ (2.0 * eye_p - Mp @ out)
                r = resid(cand)
                take = (r < r_best) & jnp.isfinite(r)
                out = jnp.where(take[..., None, None], cand, out)
                r_best = jnp.minimum(r_best, jnp.where(jnp.isfinite(r), r,
                                                       r_best))
    out = out[..., :n, :n]
    # undo the Jacobi scaling: inv(M) = D inv(D M D) D
    return out * d[..., :, None] * d[..., None, :]
