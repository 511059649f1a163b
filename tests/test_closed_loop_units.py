"""Unit contracts for the closed-loop harness helpers (sim/closed_loop.py,
mpc/gait.py r4 additions) — the fast-level counterparts of the slow MuJoCo
acceptance tests.
"""
import jax.numpy as jnp
import numpy as np

from bilevel_gait_gen_tpu.mpc import gait
from bilevel_gait_gen_tpu.utils.config import MPCConfig

CFG = MPCConfig().validate()


def test_hold_for_flight_pauses_clock_only_when_airborne():
    """gait.hold_for_flight: shifts EVERY boundary by dt_slip iff no foot
    measures contact — a pure time translation (durations preserved)."""
    sched = gait.make_trot(CFG)
    held = gait.hold_for_flight(sched, jnp.zeros(CFG.num_ee, bool), 0.03)
    np.testing.assert_allclose(np.asarray(held.bounds),
                               np.asarray(sched.bounds) + 0.03, rtol=0,
                               atol=1e-7)
    # durations unchanged
    np.testing.assert_allclose(np.diff(np.asarray(held.bounds)),
                               np.diff(np.asarray(sched.bounds)), atol=1e-6)
    # any contact -> no shift
    mc = jnp.zeros(CFG.num_ee, bool).at[2].set(True)
    same = gait.hold_for_flight(sched, mc, 0.03)
    np.testing.assert_array_equal(np.asarray(same.bounds),
                                  np.asarray(sched.bounds))


def test_contact_snap_window_gates_the_early_touchdown_snap():
    """adjust_for_current_contacts honors the window argument
    (cfg.contact_snap_window): a foot landing EARLIER than the window
    before its planned touchdown is not snapped; within it, the touchdown
    snaps to now (MPC::AdjustForCurrentContacts, mpc/mpc.cpp:1195-1203)."""
    sched = gait.make_trot(CFG)
    # foot 0 starts in swing; its touchdown is at bounds[0, 2]
    td = float(sched.bounds[0, 2])
    measured = jnp.zeros(CFG.num_ee, bool).at[0].set(True)
    # far from touchdown: narrow window does nothing
    t_far = jnp.asarray(td - 0.2)
    s1 = gait.adjust_for_current_contacts(sched, measured, t_far,
                                          window=0.07)
    np.testing.assert_array_equal(np.asarray(s1.bounds),
                                  np.asarray(sched.bounds))
    # same instant, wide window snaps the touchdown to now
    s2 = gait.adjust_for_current_contacts(sched, measured, t_far,
                                          window=0.25)
    assert abs(float(s2.bounds[0, 2]) - float(t_far)) < 1e-6
    # other feet untouched
    np.testing.assert_array_equal(np.asarray(s2.bounds[1:]),
                                  np.asarray(sched.bounds[1:]))


def test_goal_carrot_stopping_point_and_caps():
    """GoalCarrot fields: defaults encode the r4-measured safe
    configuration (lateral integral cap ZERO — a y-trim wound the biped
    march into a runaway; fore-aft cap 0.06 over 0.10 — the stronger trim
    tipped the marginal march under numerics variation)."""
    from bilevel_gait_gen_tpu.sim.closed_loop import GoalCarrot
    c = GoalCarrot(goal=(0.5, 0.0))
    assert tuple(np.asarray(c.int_cap)) == (0.06, 0.0)
    assert c.ki == 0.0                       # opt-in
    assert c.v_deadband > 0.0                # march-in-place near goal
