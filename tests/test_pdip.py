"""Interior-point QP solver tests.

Mirrors the reference's solver unit test (test/mpc_test.cpp:916+ "Clarabel
interface" on a small QP) plus the differentiation contract (the reference
finite-differences the whole pipeline at tol 1e-4, mpc_test.cpp:41-270).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bilevel_gait_gen_tpu.ops import pdip


def random_qp(rng, n=20, m=15, p=5):
    """Random strictly-convex QP with feasible interior."""
    R = rng.standard_normal((n, n))
    H = R @ R.T + n * np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((p, n))
    x_feas = rng.standard_normal(n)
    b = A @ x_feas
    G = rng.standard_normal((m, n))
    h = G @ x_feas + np.abs(rng.standard_normal(m)) + 0.1
    return map(jnp.asarray, (H, q, A, b, G, h))


def scipy_solution(H, q, A, b, G, h):
    from scipy.optimize import minimize, LinearConstraint
    H, q, A, b, G, h = map(np.asarray, (H, q, A, b, G, h))
    cons = [LinearConstraint(A, b, b), LinearConstraint(G, -np.inf, h)]
    r = minimize(lambda x: 0.5 * x @ H @ x + q @ x,
                 np.zeros(len(q)), jac=lambda x: H @ x + q,
                 constraints=cons, method="SLSQP",
                 options={"maxiter": 500, "ftol": 1e-12})
    return r.x


@pytest.mark.parametrize("seed", range(4))
def test_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    H, q, A, b, G, h = random_qp(rng)
    sol = pdip.solve(H, q, A, b, G, h, iters=30, tol=1e-10)
    x_ref = scipy_solution(H, q, A, b, G, h)
    assert float(sol.gap) < 1e-8
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=1e-5)


def test_kkt_residuals():
    rng = np.random.default_rng(10)
    H, q, A, b, G, h = random_qp(rng, n=40, m=60, p=8)
    sol = pdip.solve(H, q, A, b, G, h, iters=30, tol=1e-11)
    x, y, lam = map(np.asarray, (sol.x, sol.y, sol.lam))
    H_, q_, A_, b_, G_, h_ = map(np.asarray, (H, q, A, b, G, h))
    # explicit-inverse KKT solves trade ~one digit of dual residual for a
    # large TPU speedup (see ops/pdip._chol_inverse)
    assert np.max(np.abs(H_ @ x + q_ + A_.T @ y + G_.T @ lam)) < 5e-6
    assert np.max(np.abs(A_ @ x - b_)) < 1e-7
    assert np.max(G_ @ x - h_) < 1e-7
    assert np.min(lam) >= 0


def test_masked_rows():
    """Zero equality/inequality rows behave as absent constraints."""
    rng = np.random.default_rng(3)
    H, q, A, b, G, h = random_qp(rng, n=15, m=10, p=3)
    # append masked rows
    A2 = jnp.vstack([A, jnp.zeros((2, 15))])
    b2 = jnp.concatenate([b, jnp.zeros(2)])
    G2 = jnp.vstack([G, jnp.zeros((4, 15))])
    h2 = jnp.concatenate([h, jnp.ones(4)])
    sol = pdip.solve(H, q, A, b, G, h, iters=30)
    sol2 = pdip.solve(H, q, A2, b2, G2, h2, iters=30)
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(sol2.x),
                               atol=1e-6)


def test_batched_vmap():
    rng = np.random.default_rng(4)
    qps = [random_qp(rng) for _ in range(8)]
    Hs, qs, As, bs, Gs, hs = [jnp.stack(z) for z in zip(*qps)]
    xs = jax.vmap(lambda *a: pdip.solve(*a, iters=30).x)(Hs, qs, As, bs, Gs, hs)
    for i in range(8):
        x_ref = scipy_solution(Hs[i], qs[i], As[i], bs[i], Gs[i], hs[i])
        np.testing.assert_allclose(np.asarray(xs[i]), x_ref, atol=1e-5)


def test_gradient_matches_fd():
    """IFT custom-VJP gradient vs central finite differences.

    Contract test for the bilevel gradient pipeline — reference analog:
    mpc_test.cpp:41-270 finite-differencing QP data partials at tol 1e-4.
    """
    rng = np.random.default_rng(5)
    H, q, A, b, G, h = random_qp(rng, n=12, m=8, p=3)
    w = jnp.asarray(rng.standard_normal(12))
    opts = (("iters", 50), ("tol", 1e-12))

    def loss(q_, h_, b_):
        x = pdip.solve_primal(H, q_, A, b_, G, h_, opts)
        return jnp.sum(w * x) + jnp.sum(x ** 2)

    gq, gh, gb = jax.grad(loss, argnums=(0, 1, 2))(q, h, b)
    eps = 1e-6
    for name, val, grad in [("q", q, gq), ("h", h, gh), ("b", b, gb)]:
        v = np.asarray(val, dtype=np.float64)
        g = np.asarray(grad)
        for k in range(len(v)):
            vp, vm = v.copy(), v.copy()
            vp[k] += eps
            vm[k] -= eps
            if name == "q":
                fd = (loss(jnp.asarray(vp), h, b) - loss(jnp.asarray(vm), h, b))
            elif name == "h":
                fd = (loss(q, jnp.asarray(vp), b) - loss(q, jnp.asarray(vm), b))
            else:
                fd = (loss(q, h, jnp.asarray(vp)) - loss(q, h, jnp.asarray(vm)))
            fd = float(fd) / (2 * eps)
            assert abs(g[k] - fd) < 1e-3 * max(1.0, abs(fd)), (
                f"{name}[{k}]: ift={g[k]:.8f} fd={fd:.8f}")


def test_gradient_wrt_matrices_fd():
    rng = np.random.default_rng(6)
    H, q, A, b, G, h = random_qp(rng, n=8, m=6, p=2)
    opts = (("iters", 50), ("tol", 1e-12))

    def loss(G_):
        x = pdip.solve_primal(H, q, A, b, G_, h, opts)
        return jnp.sum(x ** 2)

    gG = np.asarray(jax.grad(loss)(G))
    eps = 1e-6
    G_np = np.asarray(G, dtype=np.float64)
    for i in range(G_np.shape[0]):
        for j in range(0, G_np.shape[1], 3):
            Gp, Gm = G_np.copy(), G_np.copy()
            Gp[i, j] += eps
            Gm[i, j] -= eps
            fd = (float(loss(jnp.asarray(Gp))) - float(loss(jnp.asarray(Gm)))) / (2 * eps)
            assert abs(gG[i, j] - fd) < 1e-3 * max(1.0, abs(fd)), (
                f"G[{i},{j}]: ift={gG[i, j]:.8f} fd={fd:.8f}")


def test_iters0_fast_path_rejects_sentinel_warm():
    """The iters=0 IFT fast path must not return a never-solved sentinel
    warm start as a 'solution' — it reports inf residuals so any caller's
    solve-quality gate rejects it (ADVICE r3, ops/pdip.py fast path)."""
    rng = np.random.default_rng(3)
    H, q, A, b, G, h = random_qp(rng)
    n, m, p = q.shape[0], h.shape[0], b.shape[0]
    dtype = q.dtype
    # the make_state neutral: gap = inf marks "never solved"
    sentinel = pdip.QPSolution(
        x=jnp.zeros(n, dtype), y=jnp.zeros(p, dtype),
        lam=jnp.ones(m, dtype), s=jnp.ones(m, dtype),
        iters=jnp.zeros((), jnp.int32), gap=jnp.full((), jnp.inf, dtype),
        pri_res=jnp.ones((), dtype), dua_res=jnp.ones((), dtype))
    sol = pdip.solve(H, q, A, b, G, h, iters=0, warm=sentinel)
    assert not bool(jnp.isfinite(sol.gap))
    assert not bool(sol.converged)

    # whereas a REAL warm start passes through (finite residuals; the gap is
    # inflated only by the interiorization floor on lam/s, not by x error)
    good = pdip.solve(H, q, A, b, G, h, iters=30, tol=1e-10)
    sol2 = pdip.solve(H, q, A, b, G, h, iters=0, warm=good)
    assert bool(jnp.isfinite(sol2.gap)) and float(sol2.gap) < 1e-2
    np.testing.assert_allclose(np.asarray(sol2.x), np.asarray(good.x),
                               atol=1e-10)


def test_warm_problem_large_batch_shapes():
    """Batch of 64 at MPC-like sizes solves and stays finite."""
    rng = np.random.default_rng(7)
    qps = [random_qp(rng, n=64, m=96, p=10) for _ in range(4)]
    Hs, qs, As, bs, Gs, hs = [jnp.stack(z) for z in zip(*qps)]
    sols = jax.vmap(lambda *a: pdip.solve(*a, iters=35))(Hs, qs, As, bs, Gs, hs)
    assert np.all(np.isfinite(np.asarray(sols.x)))
    assert np.all(np.asarray(sols.gap) < 1e-5)


def test_schur_inverse_matches_chol_on_ipm_matrices():
    """`_schur_inverse` (+1 NS polish) matches `_chol_inverse` residuals on
    W-dominated IPM KKT matrices (the experimental `inverse="schur"` path;
    uses the SHIFTED recursion + NS deflation, robust to near-singular
    matrices where the raw recursion NaNs; parked — measured slower on
    TPU, see its docstring)."""
    import numpy as np
    rng = np.random.default_rng(3)
    n, m = 96, 256
    Gm = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(n), jnp.float32)
    H = jnp.eye(n, dtype=jnp.float32)
    eye = jnp.eye(n, dtype=jnp.float32)
    # 0.0 exercises the near-singular pure-H-like case (lambda_min 1e-5)
    for wexp in (0.0, 1.0, 3.0, 4.0):
        w = jnp.asarray(10.0 ** rng.uniform(-wexp, wexp, m), jnp.float32)
        M = H + (Gm.T * w[None, :]) @ Gm + 1e-5 * eye
        Ms = pdip._shifted_schur_inverse(M)
        Mc = pdip._chol_inverse(M)
        rs = float(jnp.abs(M @ Ms - eye).max())
        rc = float(jnp.abs(M @ Mc - eye).max())
        assert np.isfinite(rs), wexp
        assert rs < 20 * max(rc, 1e-6), (wexp, rs, rc)
