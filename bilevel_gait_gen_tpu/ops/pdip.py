"""Dense predictor-corrector interior-point QP solver + IFT differentiation.

TPU-native replacement for the reference's Clarabel (Rust interior-point via
FFI, mpc/qp/clarabel_interface.cpp) and its OptNet-style differentiation
pipeline (Computedx / SetupDerivativeCalcs / CalcDerivativeWrtMats/Vecs,
clarabel_interface.cpp:182-612).  Design:

* the MPC QP is *condensed* upstream (states eliminated), so problems are
  dense and small (a few hundred variables) — one Mehrotra iteration is a
  handful of matmuls + one Cholesky, which XLA maps straight onto the MXU
  and which `vmap` batches over thousands of scenarios;
* fixed iteration count with convergence freezing (no data-dependent shapes
  or trip counts — jit/scan/vmap friendly), replacing Clarabel's adaptive
  termination;
* masked equality/inequality rows (zero rows + Tikhonov-regularized Schur
  complement) replace the reference's per-solve constraint-count mutation;
* the backward pass is the implicit-function-theorem adjoint: one extra
  solve with the SAME reduced matrix M = H + G^T W G from the final iterate
  — where the reference builds a fresh sparse KKT-differential matrix and
  runs Eigen SparseLU (~20 ms, clarabel_interface.cpp:289).

Problem form (Clarabel one-sided form, qp_data.cpp:200-289):

    min 1/2 x^T H x + q^T x   s.t.  A x = b,  G x <= h
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class QPSolution(NamedTuple):
    x: jax.Array        # [n] primal
    y: jax.Array        # [p] equality duals
    lam: jax.Array      # [m] inequality duals (>= 0)
    s: jax.Array        # [m] slacks (>= 0)
    iters: jax.Array    # iterations until convergence (or max)
    gap: jax.Array      # final complementarity gap
    pri_res: jax.Array  # final primal residual (inf-norm)
    dua_res: jax.Array  # final dual residual (inf-norm)

    @property
    def converged(self):
        return (self.gap < 1e-6) & (self.pri_res < 1e-6) & (self.dua_res < 1e-4)


def _equilibrate(H, q, A, b, G, h):
    """Ruiz-style diagonal equilibration (x = D xt; rows of A, G scaled to
    unit norm).  The reference's solvers do this internally (OSQP `scaling:
    100`, osqp_interface.cpp:7-38; Clarabel's equilibration) — without it the
    condensed H's conditioning (squared dynamics products) stalls the IPM.

    Returns scaled data + (d, e_a, e_g) with  x = d * xt,  y = e_a * yt,
    lam = e_g * lamt,  s = st / e_g.
    """
    dg = jnp.diagonal(H)
    d = 1.0 / jnp.sqrt(jnp.maximum(dg, 1e-8 * jnp.maximum(jnp.max(dg), 1.0)))
    Hs = H * d[:, None] * d[None, :]
    qs = q * d
    Ad = A * d[None, :]
    ra = jnp.linalg.norm(Ad, axis=-1)
    e_a = jnp.where(ra > 1e-12, 1.0 / jnp.maximum(ra, 1e-12), 1.0)
    As = Ad * e_a[:, None]
    bs = b * e_a
    Gd = G * d[None, :]
    rg = jnp.linalg.norm(Gd, axis=-1)
    e_g = jnp.where(rg > 1e-12, 1.0 / jnp.maximum(rg, 1e-12), 1.0)
    Gs = Gd * e_g[:, None]
    hs = h * e_g
    return Hs, qs, As, bs, Gs, hs, d, e_a, e_g


def _chol_solve(L, rhs):
    z = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, z, lower=False)


def _chol_inverse(M):
    """Explicit inverse via Cholesky.

    Profiling shows the IPM is dominated by the PER-CALL overhead of the
    many small batched triangular-solve custom calls (~28 per iteration,
    83% of solve time on TPU).  Inverting once (one Cholesky + one
    2-triangular-solve pass over the identity) turns every subsequent
    "solve" into an MXU matmul.  The slight stability loss vs. in-place
    solves is covered by the equilibration + iterative refinement.
    """
    n = M.shape[-1]
    L = jnp.linalg.cholesky(M)
    eye = jnp.eye(n, dtype=M.dtype)
    return _chol_solve(L, eye)


def _schur_inverse(M, base: int = 32):
    """SPD inverse via recursive 2x2 Schur-complement blocks — GEMMs only
    above the base case.

    The Cholesky path (`_chol_inverse`) is ~95% batched custom-call
    latency on TPU at this problem size (n = 232: the Cholesky + two
    triangular passes are sequential panel algorithms the MXU cannot
    tile, measured 22 ms per exact sweep at batch 128 vs ~1 ms of GEMM
    math).  Writing the inverse as

        [[A, B], [B^T, C]]^-1 = [[Ai + W S^-1 W^T, -W S^-1],
                                 [-S^-1 W^T,       S^-1     ]],
        W = Ai B,  S = C - B^T W   (SPD Schur complement)

    and recursing on A and S turns all O(n^3) work into MXU matmuls; only
    the <= `base`-sized leaves use the Cholesky custom call (tiny, and
    XLA batches them).

    RAW RECURSION CAVEAT: on near-singular matrices (lambda_min ~1e-5
    after equilibration — the Mehrotra init M0, the inactive subspace of
    late-iteration M) the intermediate Schur complements go numerically
    indefinite in f32 and the leaf Cholesky NaNs.  Production therefore
    uses :func:`_shifted_schur_inverse`, which regularizes the recursion
    and deflates the shift with Newton-Schulz — see there.
    """
    n = M.shape[-1]
    if n <= base:
        return _chol_inverse(M)
    k = ((n + 1) // 2 + 7) & ~7        # split at a multiple of 8 (VPU lane)
    k = min(k, n - 1)
    A = M[..., :k, :k]
    B = M[..., :k, k:]
    C = M[..., k:, k:]
    Ai = _schur_inverse(A, base)
    W = Ai @ B                          # [k, n-k]
    S = C - B.transpose(-1, -2) @ W     # Schur complement, SPD
    Si = _schur_inverse(S, base)
    WSi = W @ Si
    TL = Ai + WSi @ W.transpose(-1, -2)
    out = jnp.block([[TL, -WSi], [-WSi.transpose(-1, -2), Si]])
    return out


def _shifted_schur_inverse(M, delta: float = 1e-3, ns: int = 14):
    """GEMM-only SPD inverse robust to near-singularity: recursive Schur
    on the SHIFTED matrix M + delta I (the shift lifts every intermediate
    Schur complement to lambda_min >= delta, so the f32 recursion never
    goes indefinite), then Newton-Schulz deflation of the shift,
    X <- X (2I - M X), whose initial residual is delta/(delta+lambda_min)
    < 1 ALWAYS and squares per step.

    Measured on real equilibrated IPM KKT matrices (r4, f32, n=232):
    matches or beats `_chol_inverse` residuals across the spectrum — the
    near-singular pure-H init matrix 3.1e-2 vs chol 3.1e-2 (both floored
    by kappa*eps), W-dominated 1e±4: 1.2e-4 vs 2.5e-4, 1e±6: 2.3e-3 vs
    3.0e-3 — where the UNSHIFTED recursion NaNs.  Cost: the recursion's
    GEMMs + 2*ns GEMMs, all MXU work, vs a batched Cholesky + two
    triangular passes of custom-call latency (~95% of a 22 ms exact sweep
    at batch 128).  `delta`/`ns` trade accuracy for GEMMs: residual after
    deflation ~ (delta/(delta+lambda_min))^(2^k) until the kappa*eps
    floor; delta 1e-3 with ns 14 covers lambda_min >= 1e-6.

    STATUS: EXPERIMENTAL — measured NOT faster on the TPU (r4): a
    batch-128 10-exact-sweep solve runs ~122 ms vs ~96 ms for the
    Cholesky path in-cadence.  The recursion's many small, odd-shaped
    GEMMs (232 -> 120 -> 64 splits, unaligned to the 128-lane MXU tiles)
    plus 28 deflation GEMMs per refresh waste the MXU as badly as the
    batched-Cholesky custom call they replace.  A competitive version
    needs 128-aligned splits and a fused Pallas GEMM chain; parked with
    the numerics validated (test_pdip).
    """
    n = M.shape[-1]
    I = jnp.eye(n, dtype=M.dtype)
    X = _schur_inverse(M + delta * I)
    for _ in range(ns):
        X = X @ (2.0 * I - M @ X)
    return X


def _gj_inverse(M):
    """SPD inverse via the Pallas Gauss-Jordan kernel (`inverse="gj"`).

    The whole matrix stays in VMEM across the elimination — no batched
    Cholesky/triangular custom calls (measured 10.25 ms per exact sweep at
    [128, 232, 232], ~150x a GEMM of the same shape).  Cholesky-class
    residuals across the IPM W spectrum (see pallas_kernels.spd_inverse).
    Falls back to `_chol_inverse` off-TPU.
    """
    from bilevel_gait_gen_tpu.ops import pallas_kernels as pk
    return pk.spd_inverse(M)


def _ns_refresh(X, M, steps: int = 2):
    """Newton-Schulz inverse tracking: X <- X (2I - M X).

    Quadratic convergence: with ||I - M X|| = r the residual becomes r^2
    per step.  Between IPM iterations M changes by G^T dW G — small early,
    larger late — so the solver refreshes the exact inverse on a fixed
    cadence (see `exact_every`) and tracks in between with pure GEMMs,
    avoiding the triangular-solve custom calls that dominate TPU time.
    """
    n = M.shape[-1]
    I2 = 2.0 * jnp.eye(n, dtype=M.dtype)
    for _ in range(steps):
        X = X @ (I2 - M @ X)
    return X


def _mv(M, v):
    """Matrix-vector product via a rank-2 dot.

    Semantically `M @ v`, but keeps both dot operands 2-D: the Mosaic
    (Pallas TPU) lowering rejects rank-1 `dot_general`, and the shared
    iteration math (`_iteration_math`) runs both under XLA and inside the
    fused kernel.  XLA canonicalizes this to the same GEMV.
    """
    return (M @ v[:, None])[:, 0]


def _vtm(v, M):
    """`M.T @ v` without materializing the transpose.

    Inside the fused kernel a transposed [m, n] constraint matrix would
    cost an extra ~1.3 MB VMEM relayout per use; `v^T M` contracts the
    same axis with M in its stored layout.
    """
    return (v[None, :] @ M)[0]


def _kkt_solve(Mi, A, Si, r1, r2):
    """Solve [[M, A^T], [A, 0]] [dx, dy] = [r1, r2] given M^{-1}, S^{-1}.

    S = A M^{-1} A^T (+ reg).  Standard block elimination, all matmuls.
    """
    Mi_r1 = _mv(Mi, r1)
    dy = _mv(Si, _mv(A, Mi_r1) - r2)
    dx = Mi_r1 - _mv(Mi, _vtm(dy, A))
    return dx, dy


def _refine(Mi, A, Si, M, r1, r2, dx, dy, steps: int = 1):
    """Iterative refinement of the KKT solve (recovers f64-ish accuracy in
    f32 — important because derivative quality through the QP depends on
    solve accuracy; the reference runs Clarabel at 1e-15 gap for the same
    reason, a1_configuration.yaml:189-200)."""
    for _ in range(steps):
        e1 = r1 - (_mv(M, dx) + _vtm(dy, A))
        e2 = r2 - _mv(A, dx)
        cx, cy = _kkt_solve(Mi, A, Si, e1, e2)
        dx = dx + cx
        dy = dy + cy
    return dx, dy


def _iteration_math(H, q, A, b, G, h, g_active, x, y, lam, s, done, it, best,
                    M, Mi, *, reg, tol, refine_steps, chol_inverse_fn):
    """One full IPM iteration AFTER the reduced-matrix inverse Mi is known.

    Shared verbatim between the XLA path and the fused Pallas kernel
    (ops/pallas_kernels.py::ipm_iter) so the two are numerically equivalent
    by construction.  Everything here is VPU elementwise + small matvecs.
    """
    dtype = q.dtype
    eps = float(jnp.finfo(dtype).eps)
    w_hi = 0.01 / eps
    m = h.shape[-1]
    p = b.shape[-1]
    m_act = jnp.maximum(jnp.sum(g_active), 1).astype(dtype)
    W = jnp.clip(lam / s, 1.0 / w_hi, w_hi)

    # S = (A Mi) A^T via a last-axis contraction: Mi is symmetric, and this
    # form needs no [n, n] or [m, n] transpose in VMEM
    AMi = A @ Mi
    S_mat = jax.lax.dot_general(AMi, A, (((1,), (1,)), ((), ()))) \
        + jnp.maximum(reg, 1e-7) * jnp.eye(p, dtype=dtype)
    Si = chol_inverse_fn(S_mat)

    r_d = _mv(H, x) + q + _vtm(y, A) + _vtm(lam, G)     # dual residual
    r_p = _mv(A, x) - b                             # eq primal residual
    r_g = _mv(G, x) + s - h                         # ineq primal residual
    mu = jnp.sum(s * lam) / m_act

    def solve_dir(sigma_mu, ds_extra):
        # eliminate (ds, dlam):  ds = -r_g - G dx
        # dlam = (sigma*mu - lam*ds_extra)/s - lam - W*ds
        rhs_c = (sigma_mu - lam * ds_extra) / s     # [m]
        r1 = -(r_d + _vtm(rhs_c - lam + W * r_g, G))
        r2 = -r_p
        dx, dy = _kkt_solve(Mi, A, Si, r1, r2)
        dx, dy = _refine(Mi, A, Si, M, r1, r2, dx, dy, refine_steps)
        ds = -r_g - _mv(G, dx)
        dlam = rhs_c - lam - W * ds
        return dx, dy, ds, dlam

    # predictor (affine)
    dx_a, dy_a, ds_a, dl_a = solve_dir(jnp.zeros((), dtype),
                                       jnp.zeros(m, dtype))

    def max_step(v, dv):
        ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
        return jnp.minimum(1.0, jnp.min(ratio))

    a_p = max_step(s, ds_a)
    a_d = max_step(lam, dl_a)
    mu_aff = jnp.sum((s + a_p * ds_a) * (lam + a_d * dl_a)) / m_act
    sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)

    # corrector
    dx_c, dy_c, ds_c, dl_c = solve_dir(sigma * mu, ds_a * dl_a)

    frac = jnp.asarray(0.99, dtype)
    a_p = frac * max_step(s, ds_c)
    a_d = frac * max_step(lam, dl_c)

    scale = 1.0 + jnp.max(jnp.abs(q))
    mu_floor = jnp.asarray(100.0, dtype) * jnp.finfo(dtype).eps * scale
    conv = ((mu < jnp.maximum(tol * scale, mu_floor))
            & (jnp.max(jnp.abs(r_p)) < 1e3 * tol * scale)
            & (jnp.max(jnp.abs(r_d)) < 1e3 * tol * scale))
    # reject non-finite steps (blown-up Cholesky): freeze at the last
    # good iterate rather than poisoning the solution
    step_ok = (jnp.all(jnp.isfinite(dx_c)) & jnp.all(jnp.isfinite(dy_c))
               & jnp.all(jnp.isfinite(ds_c)) & jnp.all(jnp.isfinite(dl_c)))
    new_done = done | conv
    take = ~(new_done | ~step_ok)

    # best-iterate tracking: late IPM iterations can wander once mu
    # drops below the regularization floor; always return the iterate
    # with the lowest KKT merit (gap + primal + dual residuals).
    merit = (mu + jnp.max(jnp.abs(r_p)) / scale
             + jnp.max(jnp.abs(r_d)) / scale)
    bx, by, blam, bs, bmerit = best
    improved = (merit < bmerit) & jnp.all(jnp.isfinite(merit))
    best = (jnp.where(improved, x, bx), jnp.where(improved, y, by),
            jnp.where(improved, lam, blam), jnp.where(improved, s, bs),
            jnp.where(improved, merit, bmerit))

    # jnp.where (not a 0/1 multiplier): 0 * NaN = NaN would poison the
    # iterate whenever a step is rejected for a blown-up factorization
    x = jnp.where(take, x + a_p * dx_c, x)
    y = jnp.where(take, y + a_d * dy_c, y)
    s = jnp.where(take, jnp.maximum(s + a_p * ds_c, 1e-30), s)
    lam = jnp.where(take, jnp.maximum(lam + a_d * dl_c, 1e-30), lam)
    it = it + jnp.where(new_done, 0, 1)
    return x, y, lam, s, new_done, it, best


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _use_pallas_auto(dtype, n: int) -> bool:
    """Engage the fused Pallas path for production-sized f32 problems on
    TPU; small QPs (WBQP, projection QP) and f64 test runs stay on XLA."""
    return (dtype == jnp.float32 and n >= 64
            and jax.default_backend() in ("tpu", "axon"))


def solve(H: jax.Array, q: jax.Array, A: jax.Array, b: jax.Array,
          G: jax.Array, h: jax.Array, *, iters: int = 25,
          tol: float = 1e-9, reg: float = 1e-8,
          refine_steps: int = 1, exact_every: int = 1, ns_steps: int = 2,
          use_pallas: bool | None = None, inverse: str = "chol",
          warm: QPSolution | None = None) -> QPSolution:
    """Mehrotra predictor-corrector interior point, fixed ``iters`` sweeps.

    Masked rows: a disabled equality row must be all-zero with b=0; a
    disabled inequality row all-zero with h=1 (slack rests at 1, its dual
    decays to ~0 and never binds).

    All matmuls run at `highest` precision: on TPU the default matmul
    precision is bfloat16, which destroys interior-point convergence — the
    f32 path with bf16x6 passes keeps the MXU while preserving ~f32
    accuracy (and iterative refinement recovers the rest).
    """
    if use_pallas is None:
        use_pallas = _use_pallas_auto(q.dtype, q.shape[-1])
    with jax.default_matmul_precision("highest"):
        Hs, qs, As, bs, Gs, hs, d, e_a, e_g = _equilibrate(H, q, A, b, G, h)
        warm_s = None
        if warm is not None:
            # scale the warm start into the equilibrated space and push it
            # strictly interior (the RTI warm start: reference carries
            # prev_qp_sol/prev_dual_sol_ across solves, mpc.h:267-291).
            # warm_ok gates on the sentinel: a state that never solved
            # (gap = inf, see solver.make_state) falls back to the Mehrotra
            # start — an arbitrary (x, 1, 1) point stalls the IPM.
            warm_ok = jnp.isfinite(warm.gap) & jnp.all(jnp.isfinite(warm.x))
            warm_s = (warm.x / d, warm.y / e_a,
                      jnp.maximum(warm.lam / e_g, 1e-3),
                      jnp.maximum(warm.s * e_g, 1e-3), warm_ok)
        sol = _solve_impl(Hs, qs, As, bs, Gs, hs, iters=iters, tol=tol,
                          reg=reg, refine_steps=refine_steps, warm=warm_s,
                          exact_every=exact_every, ns_steps=ns_steps,
                          use_pallas=use_pallas, inverse=inverse)
        x = d * sol.x
        y = e_a * sol.y
        lam = e_g * sol.lam
        s = sol.s / e_g
        # report residuals in the ORIGINAL scaling
        g_active = jnp.any(G != 0, axis=-1)
        m_act = jnp.maximum(jnp.sum(g_active), 1).astype(x.dtype)
        gap = jnp.dot(s, lam) / m_act
        pri = (jnp.max(jnp.abs(A @ x - b)) if b.shape[-1] > 0
               else jnp.zeros((), x.dtype))
        r_g = G @ x + s - h
        pri = jnp.maximum(pri, jnp.max(jnp.abs(jnp.where(g_active, r_g, 0.0))))
        dua = jnp.max(jnp.abs(H @ x + q + A.T @ y + G.T @ lam))
        if iters == 0 and warm_s is not None:
            # the IFT fast path has no iterations to recover with: a
            # sentinel/never-solved or non-finite warm start must surface as
            # inf residuals, not masquerade as a solution (its recomputed
            # residuals here can be finite — e.g. the make_state neutral's
            # gap is exactly 1)
            bad = jnp.asarray(jnp.inf, x.dtype)
            ok = warm_s[-1]
            gap = jnp.where(ok, gap, bad)
            pri = jnp.where(ok, pri, bad)
            dua = jnp.where(ok, dua, bad)
        return QPSolution(x=x, y=y, lam=lam, s=s, iters=sol.iters, gap=gap,
                          pri_res=pri, dua_res=dua)


def _solve_impl(H, q, A, b, G, h, *, iters, tol, reg, refine_steps,
                warm=None, exact_every: int = 1, ns_steps: int = 2,
                use_pallas: bool = False, inverse: str = "chol"):
    # dtype-aware floors: f32 needs ~50*eps regularization and a tighter
    # complementarity-ratio clamp to keep the Cholesky finite
    eps = float(jnp.finfo(q.dtype).eps)
    reg = max(reg, 50.0 * eps)
    w_hi = 0.01 / eps            # 1e10 in f64, ~8e4 in f32
    n = q.shape[-1]
    m = h.shape[-1]
    p = b.shape[-1]
    dtype = q.dtype

    n_real, m_real = n, m
    if iters == 0 and warm is not None:
        # IFT-at-solution fast path (bilevel.outer_gradient_at): the caller
        # already holds the solution of THIS QP (the production RTI's), so
        # the forward pass is the identity on the warm point — skip the
        # Mehrotra initialization's two factorizations entirely.  The
        # backward custom-VJP then evaluates the adjoint at this point,
        # mirroring the reference's derivatives-from-the-production-solve
        # (mpc/mpc.cpp:1047-1056).
        g_active = jnp.any(G != 0, axis=-1)
        m_act = jnp.maximum(jnp.sum(g_active), 1).astype(dtype)
        wx, wy, wlam, ws, warm_ok = warm
        x, y = wx, wy
        s = jnp.where(g_active, ws, 1.0)
        lam = jnp.where(g_active, wlam, 1e-6).astype(dtype)
        gap = jnp.dot(s, lam) / m_act
        pri = jnp.max(jnp.abs(A @ x - b)) if p > 0 else jnp.zeros((), dtype)
        r_g = G @ x + s - h
        pri = jnp.maximum(pri,
                          jnp.max(jnp.abs(jnp.where(g_active, r_g, 0.0))))
        dua = jnp.max(jnp.abs(H @ x + q + A.T @ y + G.T @ lam))
        # a sentinel/never-solved or non-finite warm start is NOT a solution:
        # report inf residuals so every caller's solve-quality gate rejects it
        # (the fast path has no iterations to recover with)
        bad = jnp.asarray(jnp.inf, dtype)
        gap = jnp.where(warm_ok, gap, bad)
        pri = jnp.where(warm_ok, pri, bad)
        dua = jnp.where(warm_ok, dua, bad)
        return QPSolution(x=x, y=y, lam=lam, s=s,
                          iters=jnp.zeros((), jnp.int32), gap=gap,
                          pri_res=pri, dua_res=dua)
    if use_pallas:
        # pad to MXU/VPU-friendly shapes (lane dim multiples of 128).  The
        # padded rows follow the masked-row convention the solver already
        # supports: zero G rows with h=1 (slack rests at 1, dual decays),
        # unit H diagonal on padded variables (x stays 0 there).
        n_p = _round_up(n, 128)
        m_p = _round_up(max(m, 8), 128)
        if (n_p, m_p) != (n, m):
            H = jnp.pad(H, ((0, n_p - n), (0, n_p - n)))
            H = H + jnp.diag(jnp.concatenate(
                [jnp.zeros(n, dtype), jnp.ones(n_p - n, dtype)]))
            q = jnp.pad(q, (0, n_p - n))
            A = jnp.pad(A, ((0, 0), (0, n_p - n)))
            G = jnp.pad(G, ((0, m_p - m), (0, n_p - n)))
            h = jnp.pad(h, (0, m_p - m), constant_values=1.0)
            if warm is not None:
                wx, wy, wlam, ws, warm_ok = warm
                warm = (jnp.pad(wx, (0, n_p - n)), wy,
                        jnp.pad(wlam, (0, m_p - m), constant_values=1e-6),
                        jnp.pad(ws, (0, m_p - m), constant_values=1.0),
                        warm_ok)
            n, m = n_p, m_p

    # detect masked inequality rows so they don't pollute the residual norms
    g_active = jnp.any(G != 0, axis=-1)
    a_active = jnp.any(A != 0, axis=-1)
    m_act = jnp.maximum(jnp.sum(g_active), 1).astype(dtype)

    # Mehrotra-style starting point: solve the equality-constrained QP
    # (inequalities ignored), then shift slacks/duals strictly interior.
    inv = {"schur": _shifted_schur_inverse,
           "gj": _gj_inverse}.get(inverse, _chol_inverse)
    M0 = H + jnp.maximum(reg, 1e-8) * jnp.eye(n, dtype=dtype)
    Mi0 = inv(M0)
    S0 = A @ (Mi0 @ A.T) + jnp.maximum(reg, 1e-7) * jnp.eye(
        p, dtype=dtype)
    Si0 = _chol_inverse(S0)
    x, y = _kkt_solve(Mi0, A, Si0, -q, b)
    s_raw = h - G @ x
    s_floor = 0.1 * (1.0 + jnp.max(jnp.abs(h)))
    s = jnp.where(g_active, jnp.maximum(s_raw, s_floor), 1.0)
    mu0 = 1.0 + jnp.max(jnp.abs(q)) / jnp.asarray(n, dtype)
    lam = jnp.where(g_active, mu0 / s, 1e-6).astype(dtype)

    if warm is not None:
        wx, wy, wlam, ws, warm_ok = warm
        ws = jnp.where(g_active, ws, 1.0)
        wlam = jnp.where(g_active, wlam, 1e-6).astype(dtype)
        x = jnp.where(warm_ok, wx, x)
        y = jnp.where(warm_ok, wy, y)
        lam = jnp.where(warm_ok, wlam, lam)
        s = jnp.where(warm_ok, ws, s)

    g_active_f = g_active.astype(dtype)

    if not use_pallas:
        # UNROLLED iteration loop (production XLA path).  The exact/NS
        # choice depends only on the (static) iteration index, so
        # unrolling makes it a Python-level branch — the body compiles
        # straight-line with NO lax.cond.  Measured at the bench shape
        # ([128, 232] batch, iters=10, exact_every=3): the scan + cond
        # structure costs ~6 ms PER ITERATION beyond the isolated
        # iteration math (18.5 ms/exact and 7.4 ms/NS in-scan vs 11.3 and
        # 1.5 isolated — the cond boundary blocks fusion and forces
        # HBM round trips of the [B, n, n] operands), dominating the
        # solve; unrolling removes it.  Compile time grows with `iters`
        # (10-25 inlined bodies) — covered by the persistent cache.
        x_, y_, lam_, s_ = x, y, lam, s
        done_ = jnp.zeros((), bool)
        it_ = jnp.zeros((), jnp.int32)
        best_ = (x, y, lam, s, jnp.asarray(jnp.inf, dtype))
        Mi_prev = Mi0
        for i_static in range(iters):
            exact = (i_static < 2) or (i_static % exact_every == 0)
            W = jnp.clip(lam_ / s_, 1.0 / w_hi, w_hi)
            Gw = G * W[:, None]
            M = H + G.T @ Gw + reg * jnp.eye(n, dtype=dtype)
            if exact:
                Mi = inv(M)
            else:
                Mi_ns = _ns_refresh(Mi_prev, M, ns_steps)
                ok = jnp.all(jnp.isfinite(Mi_ns))
                Mi = jnp.where(ok, Mi_ns, Mi_prev)
            x_, y_, lam_, s_, done_, it_, best_ = _iteration_math(
                H, q, A, b, G, h, g_active_f, x_, y_, lam_, s_, done_,
                it_, best_, M, Mi, reg=reg, tol=tol,
                refine_steps=refine_steps, chol_inverse_fn=_chol_inverse)
            Mi_prev = Mi
        x, y, lam, s, it, best = x_, y_, lam_, s_, it_, best_
        return _finalize(H, q, A, b, G, h, g_active, m_act, x, y, lam, s,
                         it, best, n_real, m_real, p, dtype)

    def body(carry, i):
        x, y, lam, s, done, it, best, Mi_prev = carry
        # inverse tracking: exact Cholesky inverse on a fixed cadence,
        # Newton-Schulz GEMM updates in between (the predicate depends only
        # on the scan counter, so it stays a real branch under vmap and the
        # exact path's triangular-solve custom calls are actually skipped).
        # Note: residual-gating the NS update (falling back to the stale
        # inverse) was tried and made things WORSE — a marginal NS inverse
        # still beats a stale one; divergent cases are caught downstream by
        # the non-finite step rejection + solve-quality gate.
        # exact during the first iterations (W swings violently from any
        # cold-ish start) and on the cadence after
        exact = (i < 2) | (i % exact_every == 0)

        if use_pallas:
            # the Pallas kernel fuses M-formation, the NS refresh, and the
            # whole iteration in VMEM; XLA only contributes the exact
            # Cholesky refresh (batched custom call beats a sequential
            # in-kernel factorization)
            from bilevel_gait_gen_tpu.ops import pallas_kernels as pk

            def exact_mi(_):
                W = jnp.clip(lam / s, 1.0 / w_hi, w_hi)
                M = H + G.T @ (G * W[:, None]) + reg * jnp.eye(n, dtype=dtype)
                return _chol_inverse(M)

            Mi_in = jax.lax.cond(exact, exact_mi, lambda _: Mi_prev, None)
            do_ns = jnp.where(exact, jnp.zeros((), dtype),
                              jnp.ones((), dtype))
            x, y, lam, s, new_done, it, best, Mi = pk.ipm_iter(
                H, q, A, b, G, h, g_active_f, x, y, lam, s, done, it, best,
                Mi_in, do_ns, reg=reg, tol=tol, refine_steps=refine_steps,
                ns_steps=ns_steps)
            return (x, y, lam, s, new_done, it, best, Mi), None

        # clamped scaling guards the Cholesky against extreme final iterates
        W = jnp.clip(lam / s, 1.0 / w_hi, w_hi)         # [m]
        Gw = G * W[:, None]
        M = H + G.T @ Gw + reg * jnp.eye(n, dtype=dtype)

        def ns_branch(op):
            # a divergent NS refresh (||I - M X|| >= 1, e.g. a cold
            # Mehrotra restart whose W swings violently — the sentinel
            # reset path, solver.solve_step warm notes) produces NaN/inf;
            # falling back to the stale-but-finite previous inverse bounds
            # the damage to wasted NS iterations until the next exact
            # refresh on the cadence, instead of poisoning every later NS
            # refresh in the scan.  (Residual-gating finite-but-marginal
            # NS results was tried and made things worse — see above; this
            # guard fires only on outright non-finite blowup.)
            M_, Mi_p = op
            Mi_ns = _ns_refresh(Mi_p, M_, ns_steps)
            ok = jnp.all(jnp.isfinite(Mi_ns))
            return jnp.where(ok, Mi_ns, Mi_p)

        Mi = jax.lax.cond(exact, lambda op: inv(op[0]), ns_branch,
                          (M, Mi_prev))
        x, y, lam, s, new_done, it, best = _iteration_math(
            H, q, A, b, G, h, g_active_f, x, y, lam, s, done, it, best,
            M, Mi, reg=reg, tol=tol, refine_steps=refine_steps,
            chol_inverse_fn=_chol_inverse)
        return (x, y, lam, s, new_done, it, best, Mi), None

    best0 = (x, y, lam, s, jnp.asarray(jnp.inf, dtype))
    init = (x, y, lam, s, jnp.zeros((), bool), jnp.zeros((), jnp.int32),
            best0, Mi0)
    (x, y, lam, s, _, it, best, _), _ = jax.lax.scan(
        body, init, jnp.arange(iters))
    return _finalize(H, q, A, b, G, h, g_active, m_act, x, y, lam, s, it,
                     best, n_real, m_real, p, dtype)


def _finalize(H, q, A, b, G, h, g_active, m_act, x, y, lam, s, it, best,
              n_real, m_real, p, dtype):
    """Best-iterate competition + final residuals (shared by the unrolled
    and scanned solve paths)."""
    # final iterate competes with the tracked best
    def merit_of(x_, y_, lam_, s_):
        mu_ = jnp.dot(s_, lam_) / m_act
        rp_ = jnp.max(jnp.abs(A @ x_ - b))
        rd_ = jnp.max(jnp.abs(H @ x_ + q + A.T @ y_ + G.T @ lam_))
        sc = 1.0 + jnp.max(jnp.abs(q))
        return mu_ + rp_ / sc + rd_ / sc

    bx, by, blam, bs, bmerit = best
    final_merit = merit_of(x, y, lam, s)
    take_final = final_merit < bmerit
    x = jnp.where(take_final, x, bx)
    y = jnp.where(take_final, y, by)
    lam = jnp.where(take_final, lam, blam)
    s = jnp.where(take_final, s, bs)

    gap = jnp.dot(s, lam) / m_act
    pri = jnp.max(jnp.abs(A @ x - b)) if p > 0 else jnp.zeros((), dtype)
    r_g = G @ x + s - h
    pri = jnp.maximum(pri, jnp.max(jnp.abs(jnp.where(g_active, r_g, 0.0))))
    dua = jnp.max(jnp.abs(H @ x + q + A.T @ y + G.T @ lam))
    # strip the MXU-alignment padding (Pallas path) before returning
    x, lam, s = x[:n_real], lam[:m_real], s[:m_real]
    return QPSolution(x=x, y=y, lam=lam, s=s, iters=it, gap=gap,
                      pri_res=pri, dua_res=dua)


# ----------------------------------------------------------------------------
# Differentiable wrapper: implicit-function-theorem custom VJP
# ----------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def solve_primal(H, q, A, b, G, h, opts: tuple = (), warm=None):
    """QP solve returning only the primal x, differentiable w.r.t. all data.

    Backward implements the OptNet/IFT adjoint — the reference's
    SetupDerivativeCalcs + CalcDerivativeWrtMats/Vecs
    (clarabel_interface.cpp:182-612) — but reuses the reduced KKT solve
    instead of factorizing a fresh sparse KKT-differential matrix.

    ``warm`` (optional QPSolution) warm-starts the forward solve exactly
    like ``solve(warm=...)`` — the RTI's carried duals make the gradient's
    forward solve converge tighter at the same sweep count (the reference
    computes derivatives from its warm-started production solve too,
    mpc/mpc.cpp:1047-1056).  It is treated as a constant: the IFT adjoint
    is evaluated at the solution, so warm receives zero cotangent.
    """
    sol = solve(H, q, A, b, G, h, warm=warm, **dict(opts))
    return sol.x


def _solve_fwd(H, q, A, b, G, h, opts, warm):
    sol = solve(H, q, A, b, G, h, warm=warm, **dict(opts))
    return sol.x, (H, q, A, b, G, h, sol, warm)


def _solve_bwd(opts, res, gx):
    """IFT adjoint.  KKT residuals at the solution (s = h - G x > 0):
    (warm start receives a zero cotangent — see solve_primal.)

        g1 = H x + q + A^T y + G^T lam = 0
        g2 = A x - b = 0
        g3 = D(lam) (G x - h) = 0

    The adjoint solves J^T v = [gx, 0, 0] where J = d(g)/d(x, y, lam).
    Eliminating v_lam = D(s)^{-1} G v_x reduces the first block to
    (H + G^T W G) v_x + A^T v_y = gx with W = lam/s — the SAME reduced
    matrix the forward IPM factorizes.  Gradients then follow from
    dL/dtheta = -v^T d(g)/dtheta.
    """
    H, q, A, b, G, h, sol, warm = res
    with jax.default_matmul_precision("highest"):
        grads = _bwd_impl(opts, H, q, A, b, G, h, sol, gx)
    warm_ct = None if warm is None else jax.tree.map(jnp.zeros_like, warm)
    return (*grads, warm_ct)


def _bwd_impl(opts, H, q, A, b, G, h, sol, gx):
    x, y, lam, s = sol.x, sol.y, sol.lam, sol.s
    dtype = x.dtype
    reg = dict(opts).get("reg", 1e-8)

    # solve the adjoint in the equilibrated space (same conditioning fix as
    # the forward solve): with x = D xt, M_t = D M D and W_t = W / e_g^2.
    Hs, _, As, _, Gs, _, d, e_a, e_g = _equilibrate(H, q, A, b, G, h)
    n = x.shape[-1]
    eps = float(jnp.finfo(dtype).eps)
    reg = max(reg, 50.0 * eps)
    W = jnp.clip(lam / s, 100.0 * eps, 0.01 / eps)
    Wt = W / (e_g * e_g)
    M = Hs + Gs.T @ (Gs * Wt[:, None]) + reg * jnp.eye(n, dtype=dtype)
    inv = {"gj": _gj_inverse}.get(dict(opts).get("inverse", "chol"),
                                  _chol_inverse)
    Mi = inv(M)
    p = A.shape[0]
    S_mat = As @ (Mi @ As.T) + jnp.maximum(reg, 1e-7) * jnp.eye(p, dtype=dtype)
    Si = _chol_inverse(S_mat)
    zero_p = jnp.zeros(p, dtype)
    gxs = d * gx
    vxs, vys = _kkt_solve(Mi, As, Si, gxs, zero_p)
    vxs, vys = _refine(Mi, As, Si, M, gxs, zero_p, vxs, vys, 2)
    vx = d * vxs
    vy = e_a * vys
    c = W * (G @ vx)                   # = D(lam) v_lam

    dH = -0.5 * (jnp.outer(vx, x) + jnp.outer(x, vx))
    dq = -vx
    dA = -(jnp.outer(y, vx) + jnp.outer(vy, x))
    db = vy
    dG = -(jnp.outer(lam, vx) + jnp.outer(c, x))
    dh = c
    return (dH, dq, dA, db, dG, dh)


solve_primal.defvjp(_solve_fwd, _solve_bwd)
