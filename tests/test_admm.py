"""ADMM backend tests (reference OSQPInterface analog): agreement with the
interior-point solver, warm-start speedup, two-sided bounds."""
import jax
import jax.numpy as jnp
import numpy as np

from bilevel_gait_gen_tpu.ops import admm, pdip


def random_qp(rng, n=20, m=15, p=4):
    R = rng.standard_normal((n, n))
    H = R @ R.T + n * np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((p, n))
    x = rng.standard_normal(n)
    b = A @ x
    G = rng.standard_normal((m, n))
    h = G @ x + np.abs(rng.standard_normal(m)) + 0.1
    return map(jnp.asarray, (H, q, A, b, G, h))


def test_matches_pdip():
    rng = np.random.default_rng(0)
    H, q, A, b, G, h = random_qp(rng)
    sol_ip = pdip.solve(H, q, A, b, G, h, iters=30, tol=1e-11)
    P, qq, Aa, l, u = admm.from_onesided(H, q, A, b, G, h)
    sol_admm = admm.solve(P, qq, Aa, l, u, iters=2000, tol=1e-9)
    np.testing.assert_allclose(np.asarray(sol_admm.x), np.asarray(sol_ip.x),
                               atol=2e-4)


def test_warm_start_fewer_iters():
    rng = np.random.default_rng(1)
    H, q, A, b, G, h = random_qp(rng)
    P, qq, Aa, l, u = admm.from_onesided(H, q, A, b, G, h)
    cold = admm.solve(P, qq, Aa, l, u, iters=2000, tol=1e-8)
    # perturb q slightly and re-solve warm vs cold
    q2 = qq + 0.01
    warm = admm.solve(P, q2, Aa, l, u, iters=2000, tol=1e-8, warm=cold)
    cold2 = admm.solve(P, q2, Aa, l, u, iters=2000, tol=1e-8)
    assert int(warm.iters) < int(cold2.iters)
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(cold2.x),
                               atol=1e-5)


def test_batched():
    rng = np.random.default_rng(2)
    qps = [random_qp(rng) for _ in range(6)]
    Hs, qs, As, bs, Gs, hs = [jnp.stack(z) for z in zip(*qps)]

    def solve_one(H, q, A, b, G, h):
        return admm.solve(*admm.from_onesided(H, q, A, b, G, h), iters=1500,
                          tol=1e-8).x

    xs = jax.vmap(solve_one)(Hs, qs, As, bs, Gs, hs)
    for i in range(6):
        ip = pdip.solve(Hs[i], qs[i], As[i], bs[i], Gs[i], hs[i], iters=30,
                        tol=1e-11)
        np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(ip.x),
                                   atol=5e-4)
