"""Bilevel (outer-loop) tests: gradient through the QP, projection step,
batched line search.

Reference contract: the "Model Partials" integration test finite-differences
the bilevel pipeline (test/mpc_test.cpp:120-270, tol 1e-4); here the whole
dH/dtheta is one jax.grad, checked against finite differences of the actual
solved QP objective.
"""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import bilevel, gait, qp as qp_mod, solver
from bilevel_gait_gen_tpu.mpc.gait import GaitSchedule
from bilevel_gait_gen_tpu.mpc.trajectory import Trajectory, default_trajectory
from bilevel_gait_gen_tpu.ops import pdip
from bilevel_gait_gen_tpu.utils.config import MPCConfig

CFG = MPCConfig().validate()
MODEL = a1.make_a1()
Q0 = jnp.array(a1.stand_config(), dtype=jnp.float64)
PARAMS = srb.make_srb_params(MODEL, Q0)
X0 = srb.reconstruct_state(PARAMS, Q0, jnp.zeros(MODEL.nv, jnp.float64))


def converged_state():
    feet0 = rbd.ee_positions(MODEL, Q0)
    traj = default_trajectory(CFG, gait.make_trot(CFG), X0, feet0[:, :2])
    st = solver.SolverState(traj=traj,
                            ee_box=jnp.asarray(CFG.ee_box_size, jnp.float64))
    x_des = srb.manifold_to_tangent(X0)
    st, _ = solver.create_initial_run(CFG, PARAMS, st, X0, feet0, x_des)
    return st, feet0, x_des


STATE, FEET0, X_DES = converged_state()


@functools.lru_cache(maxsize=1)
def warm_converged_state():
    """Production-shaped state: qp_warm is a REAL carried QPSolution (the
    sentinel replaced by actual solves), exactly what gait_opt_update sees
    in deployment — the path ADVICE.md flagged as production-only."""
    feet0 = rbd.ee_positions(MODEL, Q0)
    traj = default_trajectory(CFG, gait.make_trot(CFG), X0, feet0[:, :2])
    st = solver.make_state(CFG, traj,
                           jnp.asarray(CFG.ee_box_size, jnp.float64))
    x_des = srb.manifold_to_tangent(X0)
    st, _ = solver.create_initial_run(CFG, PARAMS, st, X0, feet0, x_des)
    st, stats = solver.solve_step(CFG, PARAMS, st, X0, jnp.array(0.0),
                                  feet0, x_des)
    assert bool(stats.solved)
    return st, feet0, x_des


def outer_cost_at(bounds):
    traj_b = Trajectory(x_man=STATE.traj.x_man, f_nodes=STATE.traj.f_nodes,
                        footholds=STATE.traj.footholds,
                        sched=GaitSchedule(bounds=bounds))
    qp = qp_mod.assemble(CFG, PARAMS, traj_b, X0, jnp.array(0.0), FEET0,
                         X_DES, STATE.ee_box)
    sol = pdip.solve(qp.H, qp.q, qp.A, qp.b, qp.G, qp.h, iters=40, tol=1e-12)
    return float(0.5 * sol.x @ qp.H @ sol.x + qp.q @ sol.x + qp.cost_const)


def test_outer_gradient_matches_fd():
    """FD contract over EVERY free (in-horizon, future) boundary at 1e-3
    relative — the reference's bar ("Model Partials", test/mpc_test.cpp:
    120-268, tol 1e-4 on its own scale).  Both sides run at tight solve
    accuracy (iters=40, tol=1e-12): the contract tests the IFT adjoint, not
    the production iteration budget (production-precision quality is held
    by tests/test_parity.py instead)."""
    tight = (("iters", 40), ("tol", 1e-12))

    def outer_cost_tight(bounds):
        traj_b = Trajectory(x_man=STATE.traj.x_man,
                            f_nodes=STATE.traj.f_nodes,
                            footholds=STATE.traj.footholds,
                            sched=GaitSchedule(bounds=bounds))
        qp = qp_mod.assemble(CFG, PARAMS, traj_b, X0, jnp.array(0.0), FEET0,
                             X_DES, STATE.ee_box)
        u = pdip.solve_primal(qp.H, qp.q, qp.A, qp.b, qp.G, qp.h, tight)
        return 0.5 * u @ qp.H @ u + qp.q @ u + qp.cost_const

    b0 = np.asarray(STATE.traj.sched.bounds, dtype=np.float64)
    free = (b0 > 0.0) & (b0 < CFG.horizon)
    # evaluate at a GENERIC point: the default trot boundaries sit exactly
    # on the dt node grid, where the cost has kinks (a node's stance mask
    # flips as the boundary crosses it) — central FD straddling a kink
    # measures the average of the two one-sided slopes, not the autodiff
    # branch, and fails spuriously at ~3e-3.  An off-grid offset keeps the
    # whole FD stencil on one smooth branch.
    b0 = b0 + 0.0173 * free
    g = np.asarray(jax.grad(outer_cost_tight)(jnp.asarray(b0)))
    assert np.all(np.isfinite(g))

    idx = np.argwhere(free)
    assert len(idx) >= 10, "expected >= 10 free boundaries in the window"
    eps = 1e-5
    perturbed = []
    for ee, i in idx:
        bp, bm = b0.copy(), b0.copy()
        bp[ee, i] += eps
        bm[ee, i] -= eps
        perturbed += [bp, bm]
    costs = jax.vmap(outer_cost_tight)(jnp.asarray(np.stack(perturbed)))
    costs = np.asarray(costs, np.float64)
    failures = []
    for k, (ee, i) in enumerate(idx):
        fd = (costs[2 * k] - costs[2 * k + 1]) / (2 * eps)
        denom = max(1.0, abs(fd), abs(g[ee, i]))
        rel = abs(g[ee, i] - fd) / denom
        if rel > 1e-3:
            failures.append((int(ee), int(i), float(g[ee, i]), float(fd),
                             float(rel)))
    assert not failures, f"IFT-vs-FD >1e-3 at {failures}"


def test_contact_time_step_respects_constraints():
    g = jnp.ones_like(STATE.traj.sched.bounds) * -1.0  # push all later
    d = bilevel.contact_time_step(CFG, STATE.traj.sched, g, jnp.array(0.0))
    d_np = np.asarray(d)
    b0 = np.asarray(STATE.traj.sched.bounds)
    # pinned past boundaries don't move
    assert np.all(np.abs(d_np[b0 <= 0.0]) < 1e-6)
    # trust region respected
    assert np.max(np.abs(d_np)) <= CFG.trust_region + 1e-6
    # new times keep ordering
    b1 = b0 + d_np
    assert np.all(np.diff(b1, axis=1) > -1e-6)


def test_line_search_improves_or_keeps():
    g = bilevel.outer_gradient(CFG, PARAMS, STATE.traj, X0, jnp.array(0.0),
                               FEET0, X_DES, STATE.ee_box)
    d = bilevel.contact_time_step(CFG, STATE.traj.sched, g, jnp.array(0.0))
    res = bilevel.line_search(CFG, PARAMS, STATE, d, X0, jnp.array(0.0),
                              FEET0, X_DES)
    assert np.isfinite(float(res.cost))
    # alpha=0 is in the grid, so the winner can never be worse than staying
    _, stats0 = solver.solve_step(CFG, PARAMS, STATE, X0, jnp.array(0.0),
                                  FEET0, X_DES, shift_window=False)
    assert float(res.cost) <= float(stats0.cost) + 1e-6


def test_trust_region_rejects_poisoned_step(monkeypatch):
    """A poisoned gradient concentrated on beyond-horizon boundaries
    predicts a cost reduction but cannot actually change the QP (no horizon
    node lives in the final phase slot), so the ratio test must reject the
    step and shrink the trust radius (gait_optimizer.cpp:199-211,568-579).

    (A plain sign-flipped gradient is NOT a valid poison here: on this
    nonconvex landscape an ascent direction of the linearization can still
    genuinely reduce the cost, and accepting it would be correct.)"""
    bounds = np.asarray(STATE.traj.sched.bounds)
    horizon = CFG.horizon
    assert np.all(bounds[:, -1] > horizon + CFG.trust_region), \
        "test precondition: final boundary must stay beyond the horizon"
    g_fake = np.zeros_like(bounds)
    g_fake[:, -1] = -1.0      # push the final boundary later (always feasible)
    monkeypatch.setattr(bilevel, "outer_gradient_at",
                        lambda *a, **k: jnp.asarray(g_fake))
    res = bilevel.gait_opt_update(CFG, PARAMS, STATE, X0, jnp.array(0.0),
                                  FEET0, X_DES, trust=CFG.trust_region)
    assert not bool(res.accepted)
    assert float(res.alpha) == 0.0
    assert float(res.trust) == pytest.approx(
        max(CFG.trust_region * CFG.tr_shrink, CFG.tr_min))
    # rejected update keeps the incoming gait untouched
    np.testing.assert_array_equal(np.asarray(res.state.traj.sched.bounds),
                                  np.asarray(STATE.traj.sched.bounds))


def test_gait_opt_update_warm_started():
    """Production path end to end on a WARM state (ADVICE r2): exercises the
    custom-VJP with a warm pytree (zero cotangent incl. the int32 iters
    leaf), the embedded full-depth RTI, and the ls_ipm_iters lane depth."""
    st, feet0, x_des = warm_converged_state()
    res = bilevel.gait_opt_update(CFG, PARAMS, st, X0, jnp.array(0.0),
                                  feet0, x_des, trust=CFG.trust_region)
    assert bool(res.rti_stats.solved)
    assert np.isfinite(float(res.cost))
    assert np.isfinite(float(res.cost0))
    assert np.all(np.isfinite(np.asarray(res.state.traj.sched.bounds)))
    # warm start is carried (still finite, real solution — not the sentinel)
    assert np.isfinite(float(res.state.qp_warm.gap))
    # bounds move only when accepted
    moved = not np.allclose(np.asarray(res.state.traj.sched.bounds),
                            np.asarray(st.traj.sched.bounds))
    assert moved == bool(res.accepted)


def test_outer_gradient_at_matches_fd_production_opts():
    """FD contract for the production gradient path (ADVICE r2): the IFT
    gradient evaluated AT the captured warm RTI solution (ipm_grad_polish
    sweeps, not the tight 40-iteration contract solve) must still match
    finite differences of the converged objective."""
    st, feet0, x_des = warm_converged_state()
    # generic (off-node-grid) evaluation point — see
    # test_outer_gradient_matches_fd for why on-grid boundaries have kinks
    b0 = np.asarray(st.traj.sched.bounds, np.float64)
    free = (b0 > 0.0) & (b0 < CFG.horizon)
    b_off = jnp.asarray(b0 + 0.0173 * free)
    st = dataclasses.replace(
        st, traj=dataclasses.replace(st.traj,
                                     sched=GaitSchedule(bounds=b_off)))
    st1, stats, ext = solver.solve_step(CFG, PARAMS, st, X0, jnp.array(0.0),
                                        feet0, x_des, return_ext=True)
    assert bool(stats.solved)
    g = np.asarray(bilevel.outer_gradient_at(
        CFG, PARAMS, ext.traj_lin, X0, jnp.array(0.0), feet0, x_des,
        st.ee_box, ext.sol))
    assert np.all(np.isfinite(g))

    tight = (("iters", 40), ("tol", 1e-12))

    def outer_cost_tight(bounds):
        traj_b = dataclasses.replace(ext.traj_lin,
                                     sched=GaitSchedule(bounds=bounds))
        qp = qp_mod.assemble(CFG, PARAMS, traj_b, X0, jnp.array(0.0), feet0,
                             x_des, st.ee_box)
        u = pdip.solve_primal(qp.H, qp.q, qp.A, qp.b, qp.G, qp.h, tight)
        return 0.5 * u @ qp.H @ u + qp.q @ u + qp.cost_const

    b1 = np.asarray(ext.traj_lin.sched.bounds, np.float64)
    idx = np.argwhere((b1 > 0.0) & (b1 < CFG.horizon))
    assert len(idx) >= 10
    eps = 1e-5
    perturbed = []
    for ee, i in idx:
        bp, bm = b1.copy(), b1.copy()
        bp[ee, i] += eps
        bm[ee, i] -= eps
        perturbed += [bp, bm]
    costs = np.asarray(
        jax.vmap(outer_cost_tight)(jnp.asarray(np.stack(perturbed))),
        np.float64)
    failures = []
    for k, (ee, i) in enumerate(idx):
        fd = (costs[2 * k] - costs[2 * k + 1]) / (2 * eps)
        denom = max(1.0, abs(fd), abs(g[ee, i]))
        rel = abs(g[ee, i] - fd) / denom
        if rel > 5e-3:
            failures.append((int(ee), int(i), float(g[ee, i]), float(fd),
                             float(rel)))
    assert not failures, \
        f"production-opts IFT-vs-FD >5e-3 at {failures}"


def test_projection_qp_converges_at_budget(monkeypatch):
    """cfg.proj_iters is enough for the projection QP to actually converge
    (ADVICE r2: the budget was cut 30 -> proj_iters with only a loose
    pri_res < 1e-2 downstream gate)."""
    captured = {}
    orig = pdip.solve

    def spy(*a, **k):
        sol = orig(*a, **k)
        captured["sol"] = sol
        captured["iters"] = k.get("iters")
        return sol

    monkeypatch.setattr(bilevel.pdip, "solve", spy)
    g = jnp.ones_like(STATE.traj.sched.bounds) * -1.0
    bilevel.contact_time_step(CFG, STATE.traj.sched, g, jnp.array(0.0))
    assert captured["iters"] == CFG.proj_iters
    sol = captured["sol"]
    assert float(sol.gap) < 1e-8
    assert float(sol.pri_res) < 1e-8
    assert float(sol.dua_res) < 1e-6


def test_lane_depth_ranks_like_full_depth():
    """A/B pin (ADVICE r2 medium): reduced-depth lanes (ls_ipm_iters +
    Newton-Schulz cadence) must not HARMFULLY mis-rank the step the ratio
    test consumes.  Near-tie flips between candidates of almost-equal
    converged objective are benign (truncation noise ~2% can swap a 1%
    gap); the contract is bounded REGRET: the reduced pick's converged
    objective must capture >= 90% of the full-depth winner's improvement
    over alpha=0.  (The stale-warm bug this test was written against had
    the reduced pick at +7860 vs the true winner's -2814 — infinite
    regret.)"""
    st, feet0, x_des = warm_converged_state()
    st1, stats, ext = solver.solve_step(CFG, PARAMS, st, X0, jnp.array(0.0),
                                        feet0, x_des, return_ext=True)
    g = bilevel.outer_gradient_at(CFG, PARAMS, ext.traj_lin, X0,
                                  jnp.array(0.0), feet0, x_des, st.ee_box,
                                  ext.sol)
    d = bilevel.contact_time_step(CFG, st1.traj.sched, g, jnp.array(0.0))
    assert float(jnp.max(jnp.abs(d))) > 0.0, "precondition: nonzero step"
    a_red, o_red, _, _ = bilevel._lane_search(CFG, PARAMS, st1, d, X0,
                                           jnp.array(0.0), feet0, x_des)
    # full depth, all-exact factorizations (0 -> ipm_iters)
    cfg_full = dataclasses.replace(CFG, ls_ipm_iters=0, ls_exact_every=1)
    a_full, o_full, _, _ = bilevel._lane_search(cfg_full, PARAMS, st1, d, X0,
                                             jnp.array(0.0), feet0, x_des)

    def conv_obj(alpha):
        bounds_a = st1.traj.sched.bounds + alpha * d
        traj_a = dataclasses.replace(st1.traj,
                                     sched=GaitSchedule(bounds=bounds_a))
        qp = qp_mod.assemble(CFG, PARAMS, traj_a, X0, jnp.array(0.0),
                             feet0, x_des, st1.ee_box)
        sol = pdip.solve(qp.H, qp.q, qp.A, qp.b, qp.G, qp.h, iters=40,
                         tol=1e-12)
        return float(0.5 * sol.x @ qp.H @ sol.x + qp.q @ sol.x
                     + qp.cost_const)

    c0 = conv_obj(0.0)
    c_red = conv_obj(float(a_red))
    c_full = conv_obj(float(a_full))
    improvement = c0 - c_full
    assert improvement > 0, "precondition: the step improves the objective"
    regret = c_red - c_full
    assert regret <= 0.1 * improvement, \
        (f"reduced-depth lanes lose {regret:.1f} of {improvement:.1f} "
         f"improvement (picked alpha={float(a_red)} conv={c_red:.1f}; "
         f"full-depth picked {float(a_full)} conv={c_full:.1f})")
    # the reduced-depth winner's objective estimate is usable by the ratio
    # test (a few percent of NS truncation noise)
    assert float(o_red) == pytest.approx(c_red, rel=0.1)


def test_gait_opt_reduces_cost_on_mistimed_schedule():
    """The reference's own demonstration of the outer loop: planning-cost
    reduction over a rollout (test/gait_opt_line_search.cpp:112-203).
    Scenario: the trot deliberately mistimed (all phases stretched 1.5x).
    Both arms run the identical number of RTIs; the gait-on arm replaces
    every 5th RTI with the bilevel update.  Gait-on must end cheaper."""
    feet0 = rbd.ee_positions(MODEL, Q0)
    sched = gait.make_trot(CFG)
    sched = GaitSchedule(bounds=sched.bounds * 1.5)
    traj = default_trajectory(CFG, sched, X0, feet0[:, :2])
    st = solver.make_state(CFG, traj, jnp.asarray(CFG.ee_box_size,
                                                  jnp.float64))
    x_des = srb.manifold_to_tangent(X0)
    st, _ = solver.create_initial_run(CFG, PARAMS, st, X0, feet0, x_des)

    FREQ, CYCLES = 5, 3
    t0 = jnp.array(0.0)
    st_on = st_off = st
    trust = jnp.asarray(CFG.trust_region, jnp.float64)
    accepts = 0
    for _ in range(CYCLES):
        for _ in range(FREQ - 1):
            st_on, _ = solver.solve_step(CFG, PARAMS, st_on, X0, t0, feet0,
                                         x_des)
            st_off, _ = solver.solve_step(CFG, PARAMS, st_off, X0, t0,
                                          feet0, x_des)
        res = bilevel.gait_opt_update(CFG, PARAMS, st_on, X0, t0, feet0,
                                      x_des, trust=trust)
        st_on, trust = res.state, res.trust
        accepts += int(bool(res.accepted))
        st_off, _ = solver.solve_step(CFG, PARAMS, st_off, X0, t0, feet0,
                                      x_des)
    _, stats_on = solver.solve_step(CFG, PARAMS, st_on, X0, t0, feet0,
                                    x_des)
    _, stats_off = solver.solve_step(CFG, PARAMS, st_off, X0, t0, feet0,
                                     x_des)
    assert accepts >= 1, "outer loop never accepted a step on a mistimed gait"
    assert float(stats_on.cost) < float(stats_off.cost), \
        (f"gait-opt did not pay: on={float(stats_on.cost)} "
         f"off={float(stats_off.cost)} accepts={accepts}")
    # and the schedule actually moved (phase lengths, not just the window)
    dlen = np.abs(np.diff(np.asarray(st_on.traj.sched.bounds), axis=-1)
                  - np.diff(np.asarray(st_off.traj.sched.bounds), axis=-1))
    assert dlen.max() > 1e-3


def test_trust_region_adapts_on_real_gradient():
    """The genuine gradient produces a finite-cost update and a sane radius
    in [tr_min, trust_region]; accepted steps keep or grow the radius."""
    res = bilevel.gait_opt_update(CFG, PARAMS, STATE, X0, jnp.array(0.0),
                                  FEET0, X_DES, trust=0.1)
    assert np.isfinite(float(res.cost))
    t = float(res.trust)
    assert CFG.tr_min - 1e-9 <= t <= CFG.trust_region + 1e-9
    if bool(res.accepted):
        assert t >= 0.1 - 1e-9
    else:
        assert t == pytest.approx(max(0.1 * CFG.tr_shrink, CFG.tr_min))


def test_bfgs_curvature_carry():
    """Damped-BFGS outer curvature (cfg.gait_bfgs — the reference's
    UpdateBk path, shipped disabled there, gait_optimizer.cpp:541-561):
    the carry threads through consecutive gait_opt_update calls, B stays
    finite and positive semidefinite (Powell damping), and the updates
    stay accepted/stable on the mistimed-trot scenario."""
    cfg = dataclasses.replace(CFG, gait_bfgs=True).validate()
    sched = GaitSchedule(bounds=gait.make_trot(CFG).bounds * 1.3)
    feet0 = rbd.ee_positions(MODEL, Q0)
    traj = default_trajectory(cfg, sched, X0, feet0[:, :2])
    st = solver.SolverState(traj=traj,
                            ee_box=jnp.asarray(CFG.ee_box_size,
                                               jnp.float64))
    x_des = srb.manifold_to_tangent(X0)
    st, _ = solver.create_initial_run(cfg, PARAMS, st, X0, feet0, x_des)

    curv = bilevel.init_curvature(cfg, dtype=jnp.float64)
    trust = jnp.asarray(cfg.trust_region, jnp.float64)
    costs = []
    for k in range(4):
        res = bilevel.gait_opt_update(cfg, PARAMS, st, X0, jnp.array(0.0),
                                      feet0, x_des, trust=trust, curv=curv)
        st, trust, curv = res.state, res.trust, res.curv
        costs.append(float(res.cost))
        assert curv is not None
        assert bool(jnp.all(jnp.isfinite(curv.B)))
        # Powell damping keeps B PSD (up to roundoff)
        ev = np.linalg.eigvalsh(np.asarray(curv.B))
        assert ev.min() > -1e-6, ev.min()
    # after the first pair the carry is live and the curvature is in use
    assert bool(curv.ok)
    assert float(jnp.abs(curv.B).max()) > 0.0
    # the outer loop still descends on the mistimed schedule
    assert costs[-1] <= costs[0] + 1e-6


def test_bfgs_update_psd_and_secant():
    """_bfgs_update: secant condition B s = y holds after an undamped
    update from B = I, and a negative-curvature pair is damped to PSD."""
    n = 6
    rng = np.random.default_rng(0)
    B = jnp.eye(n, dtype=jnp.float64)
    s = jnp.asarray(rng.normal(size=n))
    y = 2.0 * s  # positive curvature, s.y > 0.2 s.B.s
    B1 = bilevel._bfgs_update(B, s, y)
    np.testing.assert_allclose(np.asarray(B1 @ s), np.asarray(y),
                               rtol=1e-10, atol=1e-10)
    # negative curvature: damped update must stay PSD
    y_neg = -s
    B2 = bilevel._bfgs_update(B1, s, y_neg)
    ev = np.linalg.eigvalsh(np.asarray(B2))
    assert ev.min() > -1e-10
