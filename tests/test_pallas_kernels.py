"""Pallas kernel tests (interpret mode on CPU): fused G^T W G correctness."""
import jax
import jax.numpy as jnp
import numpy as np

from bilevel_gait_gen_tpu.ops import pallas_kernels as pk


def test_gtwg_matches_reference_interpret():
    rng = np.random.default_rng(0)
    B, m, n = 2, 300, 130      # deliberately unaligned
    H = jnp.asarray(rng.standard_normal((B, n, n)), jnp.float32)
    G = jnp.asarray(rng.standard_normal((B, m, n)), jnp.float32)
    W = jnp.asarray(np.abs(rng.standard_normal((B, m))), jnp.float32)
    ref = pk.gtwg_reference(H, G, W)
    out = pk.gtwg(H, G, W, block_n=128, block_k=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-3)


def test_gtwg_fallback_on_cpu():
    rng = np.random.default_rng(1)
    H = jnp.asarray(rng.standard_normal((1, 16, 16)), jnp.float32)
    G = jnp.asarray(rng.standard_normal((1, 24, 16)), jnp.float32)
    W = jnp.asarray(np.abs(rng.standard_normal((1, 24))), jnp.float32)
    out = pk.gtwg(H, G, W)    # CPU -> reference path
    ref = pk.gtwg_reference(H, G, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)

def _random_qp(seed, n=40, m=60, p=12):
    rng = np.random.default_rng(seed)
    L = rng.standard_normal((n, n)).astype(np.float32)
    H = (L @ L.T + np.eye(n)).astype(np.float32)
    q = rng.standard_normal(n).astype(np.float32)
    A = rng.standard_normal((p, n)).astype(np.float32)
    b = rng.standard_normal(p).astype(np.float32)
    G = rng.standard_normal((m, n)).astype(np.float32)
    h = (rng.standard_normal(m) + 2.0).astype(np.float32)
    return map(jnp.asarray, (H, q, A, b, G, h))


def test_fused_ipm_matches_xla_interpret():
    """The fused Pallas iteration (interpret mode) must agree with the XLA
    reference path: same _iteration_math, so agreement is to padding +
    Schur-inverse rounding only."""
    from bilevel_gait_gen_tpu.ops import pdip

    H, q, A, b, G, h = _random_qp(0)
    old = pk.INTERPRET
    pk.INTERPRET = True
    try:
        sx = pdip.solve(H, q, A, b, G, h, iters=20, tol=1e-7,
                        use_pallas=False)
        sp = pdip.solve(H, q, A, b, G, h, iters=20, tol=1e-7,
                        use_pallas=True)
    finally:
        pk.INTERPRET = old
    assert float(sp.gap) < 1e-5
    assert float(sp.pri_res) < 1e-4
    np.testing.assert_allclose(np.asarray(sp.x), np.asarray(sx.x),
                               rtol=1e-3, atol=1e-4)


def test_fused_ipm_warm_and_ns_interpret():
    """Warm-started + Newton-Schulz cadence (the production RTI regime)
    through the fused kernel."""
    from bilevel_gait_gen_tpu.ops import pdip

    H, q, A, b, G, h = _random_qp(1)
    old = pk.INTERPRET
    pk.INTERPRET = True
    try:
        cold = pdip.solve(H, q, A, b, G, h, iters=20, tol=1e-7,
                          use_pallas=True)
        warm = pdip.solve(H, q, A, b, G, h, iters=8, tol=1e-7,
                          exact_every=3, use_pallas=True, warm=cold)
    finally:
        pk.INTERPRET = old
    assert float(warm.gap) < 1e-5
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(cold.x),
                               rtol=1e-3, atol=1e-4)


def test_gj_inverse_matches_chol_interpret():
    """The Gauss-Jordan Pallas leaf (interpret mode) inverts SPD matrices
    to Cholesky-equivalent residuals, batched."""
    from bilevel_gait_gen_tpu.ops import pdip
    rng = np.random.default_rng(5)
    n, B = 128, 3
    L = rng.standard_normal((B, n, n)).astype(np.float32) / np.sqrt(n)
    M = jnp.asarray(L @ np.swapaxes(L, -1, -2) + 0.1 * np.eye(n),
                    jnp.float32)
    X = pk.gj_inverse(M, interpret=True)
    Xc = jax.vmap(pdip._chol_inverse)(M)
    eye = np.eye(n, dtype=np.float32)
    for b in range(B):
        r = float(jnp.abs(M[b] @ X[b] - eye).max())
        rc = float(jnp.abs(M[b] @ Xc[b] - eye).max())
        assert np.isfinite(r)
        assert r < 20 * max(rc, 1e-6), (b, r, rc)


def test_spd_inverse_ipm_spectrum_interpret():
    """`spd_inverse` (128-aligned Schur + GJ leaves) on W-dominated IPM
    KKT matrices across the conditioning spectrum, UNALIGNED n=232 —
    the exact production shape; must match Cholesky residuals and stay
    finite on the near-singular pure-H-like case that NaNs the raw
    Cholesky-leaf Schur recursion (ops/pdip._schur_inverse caveat)."""
    from bilevel_gait_gen_tpu.ops import pdip
    rng = np.random.default_rng(7)
    n, m = 232, 400
    Gm = jnp.asarray(rng.normal(size=(m, n)) / np.sqrt(n), jnp.float32)
    H = jnp.eye(n, dtype=jnp.float32)
    eye = jnp.eye(n, dtype=jnp.float32)
    for wexp in (0.0, 1.0, 3.0, 4.0):
        w = jnp.asarray(10.0 ** rng.uniform(-wexp, wexp, m), jnp.float32)
        M = H + (Gm.T * w[None, :]) @ Gm + 1e-5 * eye
        Ms = pk.spd_inverse(M, interpret=True)
        Mc = pdip._chol_inverse(M)
        rs = float(jnp.abs(M @ Ms - eye).max())
        rc = float(jnp.abs(M @ Mc - eye).max())
        assert np.isfinite(rs), wexp
        assert rs < 20 * max(rc, 1e-6), (wexp, rs, rc)


def test_spd_inverse_f64_exact():
    """f64 interpret run converges to tight residuals (algorithm sanity
    independent of f32 rounding)."""
    rng = np.random.default_rng(9)
    n = 160
    L = rng.standard_normal((n, n)) / np.sqrt(n)
    M = jnp.asarray(L @ L.T + 0.05 * np.eye(n), jnp.float64)
    X = pk.spd_inverse(M, interpret=True)
    r = float(jnp.abs(M @ X - jnp.eye(n, dtype=jnp.float64)).max())
    assert r < 1e-9, r
