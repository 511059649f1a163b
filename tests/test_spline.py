"""Spline and gait-schedule tests.

Mirrors the reference spline unit tests (test/splines_tests.cpp): value
correctness, linearity in the variables, finite-difference validation of the
contact-time partials (the reference checks ComputePartialWrtTime /
ComputeCoefPartialWrtTime by finite differences at tol 1e-4,
splines_tests.cpp:239-327; here jax.grad plays that role and is checked the
same way).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bilevel_gait_gen_tpu.mpc import gait
from bilevel_gait_gen_tpu.ops import spline
from bilevel_gait_gen_tpu.utils.config import MPCConfig

CFG = MPCConfig().validate()


def make_vars(rng, cfg=CFG):
    S = cfg.num_stance_slots
    F = cfg.num_force_polys
    f_nodes = jnp.array(rng.standard_normal((cfg.num_ee, S, F - 1, 3, 2)))
    footholds = jnp.array(rng.standard_normal((cfg.num_ee, cfg.num_footholds, 2)) * 0.1)
    return f_nodes, footholds


def test_trot_schedule_contacts():
    sched = gait.make_trot(CFG)
    # At t=0.05: FR(1), RL(2) in stance; FL(0), RR(3) in swing
    flags = gait.contact_flags(sched, jnp.array(0.05))
    np.testing.assert_array_equal(np.asarray(flags), [False, True, True, False])
    # Half a phase later the pattern flips
    flags2 = gait.contact_flags(sched, jnp.array(0.35))
    np.testing.assert_array_equal(np.asarray(flags2), [True, False, False, True])


def test_force_zero_in_swing_and_at_boundaries():
    rng = np.random.default_rng(0)
    f_nodes, _ = make_vars(rng)
    sched = gait.make_trot(CFG)
    b = sched.bounds[1]  # FR: stance [0, 0.3]
    # swing time
    f = spline.force_value(b, f_nodes[1], jnp.array(0.45), CFG.num_force_polys)
    np.testing.assert_allclose(f, 0.0, atol=1e-12)
    # stance boundaries: force exactly zero (touchdown / liftoff)
    for t in [0.0, 0.3]:
        f = spline.force_value(b, f_nodes[1], jnp.array(float(t)),
                               CFG.num_force_polys)
        np.testing.assert_allclose(f, 0.0, atol=1e-9)


def test_force_interpolates_node_values():
    """At an interior sub-grid node the spline equals the node value."""
    rng = np.random.default_rng(1)
    f_nodes, _ = make_vars(rng)
    sched = gait.make_trot(CFG)
    b = sched.bounds[1]
    F = CFG.num_force_polys
    dur = 0.3
    for j in range(1, F):
        t = jnp.array(j * dur / F)
        got = spline.force_value(b, f_nodes[1], t, F)
        want = f_nodes[1][0, j - 1, :, 0]
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_force_linear_in_vars():
    rng = np.random.default_rng(2)
    f_nodes, _ = make_vars(rng)
    sched = gait.make_trot(CFG)
    b = sched.bounds[1]
    t = jnp.array(0.13)

    def val(fn):
        return spline.force_value(b, fn, t, CFG.num_force_polys)

    J = jax.jacobian(val)(f_nodes[1])
    lin = jnp.einsum('i...,...->i', J, f_nodes[1])
    np.testing.assert_allclose(lin, val(f_nodes[1]), atol=1e-8)


def test_position_stance_constant_swing_interpolates():
    rng = np.random.default_rng(3)
    _, footholds = make_vars(rng)
    sched = gait.make_trot(CFG)
    b = sched.bounds[1]  # stance [0, 0.3], swing [0.3, 0.6]
    fh = footholds[1]
    p1 = spline.foot_position(b, fh, jnp.array(0.05), CFG.swing_height,
                              CFG.foot_offset)
    p2 = spline.foot_position(b, fh, jnp.array(0.25), CFG.swing_height,
                              CFG.foot_offset)
    np.testing.assert_allclose(p1, p2, atol=1e-9)
    np.testing.assert_allclose(p1[:2], fh[0], atol=1e-9)
    np.testing.assert_allclose(p1[2], CFG.foot_offset, atol=1e-9)
    # swing endpoints hit the footholds; apex at mid-swing
    p_mid = spline.foot_position(b, fh, jnp.array(0.45), CFG.swing_height,
                                 CFG.foot_offset)
    np.testing.assert_allclose(p_mid[:2], 0.5 * (fh[0] + fh[1]), atol=1e-9)
    np.testing.assert_allclose(p_mid[2], CFG.swing_height, atol=1e-9)
    p_end = spline.foot_position(b, fh, jnp.array(0.599), CFG.swing_height,
                                 CFG.foot_offset)
    np.testing.assert_allclose(p_end[:2], fh[1], atol=1e-4)


@pytest.mark.parametrize("t", [0.07, 0.13, 0.22, 0.44, 0.52, 0.75])
def test_force_partial_wrt_bounds_matches_fd(t):
    """jax.grad w.r.t. the contact times vs central finite differences.

    This is the contract the reference checks for ComputePartialWrtTime
    (splines_tests.cpp:239-327, tol 1e-4).
    """
    rng = np.random.default_rng(4)
    f_nodes, _ = make_vars(rng)
    sched = gait.make_trot(CFG)
    b = np.asarray(sched.bounds[1], dtype=np.float64)
    tt = jnp.array(t, dtype=jnp.float64)
    fn = f_nodes[1].astype(jnp.float64)

    def val(bb):
        return spline.force_value(bb, fn, tt, CFG.num_force_polys)

    J = np.asarray(jax.jacobian(val)(jnp.array(b)))
    eps = 1e-6
    for k in range(len(b)):
        bp, bm = b.copy(), b.copy()
        bp[k] += eps
        bm[k] -= eps
        fd = (np.asarray(val(jnp.array(bp))) - np.asarray(val(jnp.array(bm)))) / (2 * eps)
        np.testing.assert_allclose(J[:, k], fd, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("t", [0.07, 0.35, 0.45, 0.52])
def test_position_partial_wrt_bounds_matches_fd(t):
    rng = np.random.default_rng(5)
    _, footholds = make_vars(rng)
    sched = gait.make_trot(CFG)
    b = np.asarray(sched.bounds[1], dtype=np.float64)
    tt = jnp.array(t, dtype=jnp.float64)
    fh = footholds[1].astype(jnp.float64)

    def val(bb):
        return spline.foot_position(bb, fh, tt, CFG.swing_height,
                                    CFG.foot_offset)

    J = np.asarray(jax.jacobian(val)(jnp.array(b)))
    eps = 1e-6
    for k in range(len(b)):
        bp, bm = b.copy(), b.copy()
        bp[k] += eps
        bm[k] -= eps
        fd = (np.asarray(val(jnp.array(bp))) - np.asarray(val(jnp.array(bm)))) / (2 * eps)
        np.testing.assert_allclose(J[:, k], fd, atol=1e-4, rtol=1e-4)


def test_advance_window_rolls_cycles():
    cfg = CFG
    sched = gait.make_trot(cfg)
    b0 = np.asarray(sched.bounds)
    t0 = jnp.array(0.65)  # first cycle of every EE fully past for FR/RL
    shifted = gait.advance_window(sched, t0, cfg)
    b1 = np.asarray(shifted.bounds)
    # per-EE: first boundary pair dropped where the cycle ended before t0
    for ee in range(cfg.num_ee):
        n_past = int(np.sum(b0[ee, 2::2] <= 0.65))
        np.testing.assert_allclose(b1[ee, :len(b0[ee]) - 2 * n_past],
                                   b0[ee, 2 * n_past:], atol=1e-6)
        # appended boundaries continue at the nominal cadence
        assert np.all(np.diff(b1[ee]) > -1e-9)


def test_roll_spline_vars_shapes():
    cfg = CFG
    rng = np.random.default_rng(6)
    f_nodes, footholds = make_vars(rng)
    n_past = jnp.array([1, 0, 2, 0], dtype=jnp.int32)
    f2, p2 = gait.roll_spline_vars(f_nodes, footholds, n_past)
    assert f2.shape == f_nodes.shape and p2.shape == footholds.shape
    # ee 0 shifted by one stance slot
    np.testing.assert_allclose(f2[0, 0], f_nodes[0, 1], atol=1e-9)
    # ee 1 unchanged
    np.testing.assert_allclose(f2[1], f_nodes[1], atol=1e-9)


def test_next_touchdown_and_swing_time():
    sched = gait.make_trot(CFG)
    b_fl = sched.bounds[0]  # FL starts in swing: [-0.3, 0, ...] wait
    # FL starts in swing at t=0+: its stance slot 0 is [-0.3, 0]
    td = gait.next_touchdown_time(b_fl, jnp.array(0.05))
    np.testing.assert_allclose(td, 0.3, atol=1e-6)
    st = gait.current_swing_time(b_fl, jnp.array(0.05))
    np.testing.assert_allclose(st, 0.3, atol=1e-6)


def test_adjust_for_current_contacts():
    """Early touchdown snaps the upcoming stance start to now
    (AdjustForCurrentContacts, mpc/mpc.cpp:1195-1203)."""
    sched = gait.make_trot(CFG)
    t = jnp.array(0.56)
    # FR (ee 1) swings [0.3, 0.6]; it measures contact 40 ms early
    measured = jnp.array([False, True, False, False])
    sched2 = gait.adjust_for_current_contacts(sched, measured, t)
    b1 = np.asarray(sched2.bounds[1])
    assert abs(b1[2] - 0.56) < 1e-6, b1  # TD at 0.6 snapped to 0.56
    assert np.all(np.diff(b1) >= -1e-6)
    # other feet unchanged
    np.testing.assert_allclose(np.asarray(sched2.bounds[0]),
                               np.asarray(sched.bounds[0]))
    # a foot measuring contact long before its touchdown is NOT snapped
    measured2 = jnp.array([False, True, False, False])
    sched3 = gait.adjust_for_current_contacts(sched, measured2,
                                              jnp.array(0.35))
    np.testing.assert_allclose(np.asarray(sched3.bounds[1]),
                               np.asarray(sched.bounds[1]))


def test_total_support_force_zero_at_phase_boundaries():
    """Characterization: spline forces are structurally pinned to zero at
    every contact-phase boundary (reference semantics: boundary nodes are
    never decision variables, splines_tests.cpp force contracts).  For the
    zero-overlap trot BOTH diagonal pairs hit a boundary at the same
    instant, so the planned total support force passes through zero every
    phase — the root cause of the penalty-engine hop/sag cycle
    (docs/DESIGN.md, "Penalty-engine closed-loop stability")."""
    rng = np.random.default_rng(7)
    f_nodes, _ = make_vars(rng)
    F = CFG.num_force_polys

    trot = gait.make_trot(CFG)
    for t in [0.0, 0.3, 0.6]:          # trot phase boundaries (all EEs)
        f = spline.forces_all(trot.bounds, f_nodes, jnp.asarray(t), F)
        np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-12)
    # mid-phase the stance pair carries force
    f_mid = spline.forces_all(trot.bounds, f_nodes, jnp.asarray(0.15), F)
    assert np.any(np.abs(np.asarray(f_mid)) > 1e-3)


def test_double_support_trot_keeps_support():
    """With double_support > 0 (DESIGN.md stability fix #3) the two diagonal
    pairs' stances overlap, so at every structurally-zero-force instant of
    one pair the OTHER pair is mid-stance and can carry force; and the t0
    plan does not start at a zero instant.  Reduces to the reference layout
    at double_support = 0 (held by test_trot_schedule_contacts etc.)."""
    cfg = MPCConfig(double_support=0.1).validate()
    sched = gait.make_trot(cfg)
    b = np.asarray(sched.bounds)
    d, ov = cfg.phase_duration, cfg.double_support
    # layout: in-contact rows stance [t0-ov, t0+d]; stances d+ov, swings d-ov
    np.testing.assert_allclose(b[1, 0], -ov, atol=1e-12)
    np.testing.assert_allclose(b[1, 1], d, atol=1e-12)
    np.testing.assert_allclose(b[0, 1], 0.0, atol=1e-12)

    # at t0 both in-contact feet are mid-stance (support available)
    flags = gait.contact_flags(sched, jnp.asarray(0.0))
    np.testing.assert_array_equal(np.asarray(flags),
                                  [False, True, True, False])
    # unit interior nodes: planned support capacity never hits zero on a
    # dense time grid inside the horizon
    f_nodes = jnp.ones((cfg.num_ee, cfg.num_stance_slots,
                        cfg.num_force_polys - 1, 3, 2)
                       ).at[..., 1].set(0.0)   # unit values, zero derivs
    ts = np.linspace(0.0, cfg.horizon, 201)
    support = [float(jnp.sum(spline.forces_all(
        sched.bounds, f_nodes, jnp.asarray(t), cfg.num_force_polys)[:, 2]))
        for t in ts]
    assert min(support) > 0.05, min(support)

    # window shift preserves the overlap pattern (stance d+ov, swing d-ov)
    sched2 = gait.advance_window(sched, jnp.asarray(2.05), cfg)
    b2 = np.asarray(sched2.bounds)
    stances = b2[:, 1::2] - b2[:, 0:-1:2]
    swings = b2[:, 2::2] - b2[:, 1:-1:2]
    np.testing.assert_allclose(stances, d + ov, atol=1e-9)
    np.testing.assert_allclose(swings, d - ov, atol=1e-9)


def test_standing_schedule_stands_forever():
    """make_standing: chained 2d stances with zero-length swings — stance
    contact flags at every t, and advance_window's pattern-preserving
    extension keeps it standing indefinitely (the old merged-slot layout
    ran out at t0 + P*d and the extension turned it into a trot)."""
    cfg = MPCConfig(force_carrier=True).validate()
    standing = gait.make_standing(cfg)
    b = np.asarray(standing.bounds)
    assert b[0, 0] < 0.0
    # all feet in stance throughout the window
    for t in [0.0, 0.3, 0.6, cfg.horizon]:
        flags = gait.contact_flags(standing, jnp.asarray(t))
        assert np.all(np.asarray(flags)), t
    # carrier-inclusive planned support never dips below m*g anywhere
    mg = 134.8
    for t in np.linspace(0.0, cfg.horizon, 101):
        c = spline.carrier_forces(standing.bounds, jnp.asarray(t), mg,
                                  cfg.carrier_ramp)
        np.testing.assert_allclose(float(jnp.sum(c[:, 2])), mg, rtol=1e-6)
    # window advance far past the original slots: still standing
    sched2 = standing
    for t0 in [1.0, 2.5, 4.0, 7.0]:
        sched2 = gait.advance_window(sched2, jnp.asarray(t0), cfg)
        for dt_probe in [0.0, 0.15, 0.45, cfg.horizon]:
            flags = gait.contact_flags(sched2, jnp.asarray(t0 + dt_probe))
            assert np.all(np.asarray(flags)), (t0, dt_probe)
        c = spline.carrier_forces(sched2.bounds, jnp.asarray(t0 + 0.33), mg,
                                  cfg.carrier_ramp)
        np.testing.assert_allclose(float(jnp.sum(c[:, 2])), mg, rtol=1e-6)


def test_carrier_total_support_is_mg_everywhere():
    """Static-support carrier (ops/spline.py::carrier_weights): planned
    total support equals m*g at EVERY instant for both the overlapped trot
    and merged standing — the structural fix for the penalty-engine
    free-fall plans (the spline alone pins support to zero at stance
    boundaries)."""
    mg = 134.8
    cfg_ov = MPCConfig(double_support=0.1, force_carrier=True).validate()
    cfg_std = MPCConfig(force_carrier=True).validate()
    # (the ov=0 trot genuinely exchanges support instantaneously at shared
    # boundaries — all ramps hit zero there — which is exactly why the
    # on-device engine pairs the carrier with double_support > 0)
    for cfg, sched in [(cfg_ov, gait.make_trot(cfg_ov)),
                       (cfg_std, gait.make_standing(cfg_std))]:
        for t in np.linspace(0.0, cfg.horizon, 201):
            c = spline.carrier_forces(sched.bounds, jnp.asarray(t), mg,
                                      cfg.carrier_ramp)
            np.testing.assert_allclose(float(jnp.sum(c[:, 2])), mg,
                                       rtol=1e-6)
            assert np.all(np.asarray(c[:, 2]) >= 0.0)
            # xy components are zero (carrier is vertical support only)
            np.testing.assert_allclose(np.asarray(c[:, :2]), 0.0)


def test_carrier_zero_in_swing_and_continuous():
    """Carrier force is zero for swing feet and continuous in t."""
    cfg = MPCConfig(double_support=0.1, force_carrier=True).validate()
    sched = gait.make_trot(cfg)
    mg = 134.8
    prev = None
    for t in np.linspace(0.0, cfg.horizon, 801):
        c = spline.carrier_forces(sched.bounds, jnp.asarray(t), mg,
                                  cfg.carrier_ramp)
        flags = np.asarray(gait.contact_flags(sched, jnp.asarray(t)))
        assert np.all(np.asarray(c[~flags, 2]) < 1e-6)
        if prev is not None:
            assert np.max(np.abs(np.asarray(c) - prev)) < mg * 0.02
        prev = np.asarray(c)
