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


def test_gradient_matches_fd():
    """FD contract on the ADMM IFT adjoint (the reference's OSQP derivative
    path, osqp_interface.cpp:275-312): d/dtheta of a scalar of the primal
    solution must match central finite differences."""
    rng = np.random.default_rng(3)
    H, q, A, b, G, h = random_qp(rng)
    P, qq, Aa, l, u = admm.from_onesided(H, q, A, b, G, h)
    opts = (("iters", 4000), ("tol", 1e-11))
    w = jnp.asarray(rng.standard_normal(q.shape[-1]))

    def loss(qv, hv):
        uu = u.at[b.shape[-1]:].set(hv)
        return jnp.dot(w, admm.solve_primal(P, qv, Aa, l, uu, opts))

    gq, gh = jax.grad(loss, argnums=(0, 1))(qq, h)
    # eps large enough that solver noise (~1e-9) stays below FD signal
    eps = 1e-5
    for idx in [0, 7, 19]:
        e = jnp.zeros_like(qq).at[idx].set(eps)
        fd = (loss(qq + e, h) - loss(qq - e, h)) / (2 * eps)
        np.testing.assert_allclose(float(gq[idx]), float(fd), rtol=5e-3,
                                   atol=1e-6)
    for idx in [0, 5, 14]:
        e = jnp.zeros_like(h).at[idx].set(eps)
        fd = (loss(qq, h + e) - loss(qq, h - e)) / (2 * eps)
        np.testing.assert_allclose(float(gh[idx]), float(fd), rtol=5e-3,
                                   atol=1e-6)


def test_mpc_solve_step_on_admm_backend():
    """cfg.qp_backend='admm' drives a full MPC real-time iteration
    (the reference's solver switch, mpc/mpc.cpp:49,71)."""
    from bilevel_gait_gen_tpu.models import a1, rbd, srb
    from bilevel_gait_gen_tpu.mpc import gait, solver
    from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
    from bilevel_gait_gen_tpu.utils.config import MPCConfig

    cfg = MPCConfig(qp_backend="admm", admm_iters=1600).validate()
    model = a1.make_a1()
    q0 = jnp.asarray(a1.stand_config(), jnp.float64)
    params = srb.make_srb_params(model, q0)
    x0 = srb.reconstruct_state(params, q0, jnp.zeros(model.nv, jnp.float64))
    feet0 = rbd.ee_positions(model, q0)
    traj = default_trajectory(cfg, gait.make_trot(cfg), x0, feet0[:, :2])
    st = solver.SolverState(traj=traj,
                            ee_box=jnp.asarray(cfg.ee_box_size, jnp.float64))
    x_des = srb.manifold_to_tangent(x0)
    st, stats = solver.solve_step(cfg, params, st, x0, jnp.array(0.0),
                                  feet0, x_des, shift_window=False)
    assert bool(stats.solved)
    assert float(stats.qp_pri) < 1e-3
    assert np.all(np.isfinite(np.asarray(st.traj.f_nodes)))
