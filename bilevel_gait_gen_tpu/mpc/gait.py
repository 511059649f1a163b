"""Gait schedules: fixed-shape contact-phase slots (pure JAX pytrees).

TPU-native replacement for the reference's mutable, contact-indexed spline
time grid (reference: mpc/spline/end_effector_splines.cpp:34-153 construction,
:366-500 AddPoly/RemovePoly, mpc/mpc.cpp:1220-1230 UpdateInitTime).

Design: per end effector, a fixed array of ``P`` phase slots with boundary
times ``bounds[P+1]``.  Even slots are stance, odd slots are swing — always.
A foot that is mid-swing "now" simply has its slot-0 stance interval in the
past.  Window shifts never mutate topology; they roll the arrays left by one
full (stance, swing) cycle and append a new cycle at the end, keeping every
shape static.  The phase boundary times ARE the bilevel decision variables
theta (the reference's contact times).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from bilevel_gait_gen_tpu.utils.config import MPCConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaitSchedule:
    """Contact schedule for all end effectors.

    bounds: [E, P+1] absolute phase boundary times, nondecreasing per row.
            Slot p spans [bounds[:, p], bounds[:, p+1]); even p = stance.
    """
    bounds: jax.Array

    @property
    def num_phases(self) -> int:
        return self.bounds.shape[-1] - 1


def make_trot(cfg: MPCConfig, t0: float = 0.0) -> GaitSchedule:
    """Default trot: 0.3 s alternating phases, diagonal pairs out of phase.

    Matches the reference default: switching times every 0.3 s
    (mpc/mpc.cpp:707-712 CreateDefaultSwitchingTimes) with FR(1)/RL(2)
    starting in contact and FL(0)/RR(3) starting in swing
    (mpc/trajectory.cpp:24-28).  An EE starting in swing gets its slot-0
    stance placed wholly in the past.

    With ``cfg.double_support = ov > 0`` each stance lasts d+ov and each
    swing d-ov (cycle length preserved at 2d), and the in-contact pair's
    stance starts ov BEFORE t0 — so the two diagonal pairs' stances overlap
    by ov, planned total support never passes through zero, and the t0
    plan does not start at a structurally-zero force instant.  At ov=0 this
    is exactly the reference layout.
    """
    E, P, d = cfg.num_ee, cfg.num_phase_slots, cfg.phase_duration
    ov = cfg.double_support
    ft = jnp.result_type(float)
    k = jnp.arange(P + 1, dtype=ft)
    # boundaries alternate spacing (d+ov, d-ov): even index 2c at 2c*d - ov
    # (stance start), odd index 2c+1 at (2c+1)*d (stance end)
    base = t0 + k * d - jnp.where(k % 2 == 0, ov, 0.0)
    rows = []
    for ee in range(E):
        start_in_contact = ee in (1, 2) if E == 4 else (ee % 2 == 1)
        # stance slots are even: a foot in contact at t0 starts its stance at
        # t0-ov; a foot in swing at t0 had its stance end at t0 (shift back).
        rows.append(base if start_in_contact else base - d)
    return GaitSchedule(bounds=jnp.stack(rows))


def make_standing(cfg: MPCConfig, t0: float = 0.0) -> GaitSchedule:
    """All feet in stance forever: chained 2d stances, zero-length swings.

    Stance slot c spans [t0 + (2c-1) d, t0 + (2c+1) d] and each swing slot
    between them is zero-length (liftoff == next touchdown), so contact
    flags are stance at every t, force-node density stays at the walking
    cadence (interior nodes every 2d/F), and :func:`advance_window`'s
    pattern-preserving extension keeps the robot standing indefinitely.
    The force spline still pins to zero at the chained boundaries; the
    static-support carrier (ops/spline.py::carrier_weights, which skips
    ramps at zero-length swings) carries m*g across them so the PLAN never
    dips below weight support (docs/DESIGN.md "Penalty-engine closed-loop
    stability")."""
    E, P, d = cfg.num_ee, cfg.num_phase_slots, cfg.phase_duration
    ft = jnp.result_type(float)
    k = jnp.arange(P + 1, dtype=ft)
    # even k: stance start at (k-1) d; odd k: stance end at k d
    bounds = t0 + d * jnp.where(k % 2 == 0, k - 1, k)
    return GaitSchedule(bounds=jnp.tile(bounds[None, :], (cfg.num_ee, 1)))


# ----------------------------------------------------------------------------
# Queries (all pure; vmap-able over the EE axis by passing a single row)
# ----------------------------------------------------------------------------

def phase_index(bounds: jax.Array, t: jax.Array) -> jax.Array:
    """Slot p with bounds[p] <= t < bounds[p+1], clipped to [0, P-1].

    Ties at a boundary resolve to the later slot (matching the reference's
    GetLowerNodeIdx convention of `time >= node_time`).  Zero-length slots
    are skipped by the strict comparison on the right edge.
    """
    P = bounds.shape[-1] - 1
    # count boundaries <= t among bounds[1..P]; zero-length slots collapse
    idx = jnp.sum(t >= bounds[1:], axis=-1)
    # back off zero-length slots: ensure chosen slot has positive length when
    # possible by preferring the last slot whose start <= t and end > t.
    idx = jnp.clip(idx, 0, P - 1)
    return idx.astype(jnp.int32)


def in_contact(bounds: jax.Array, t: jax.Array) -> jax.Array:
    """True if the EE is in stance at time t (even slot)."""
    return phase_index(bounds, t) % 2 == 0


def contact_flags(sched: GaitSchedule, t: jax.Array) -> jax.Array:
    """[E] bool stance flags at time t (reference Trajectory::GetContacts)."""
    return jax.vmap(lambda b: in_contact(b, t))(sched.bounds)


def next_touchdown_time(bounds: jax.Array, t: jax.Array) -> jax.Array:
    """Earliest stance-start boundary strictly after t.

    Reference: Trajectory::GetNextContactTime.  Touchdowns are the even-slot
    start boundaries bounds[2s].
    """
    P = bounds.shape[-1] - 1
    starts = bounds[0::2]  # even boundaries = touchdowns
    big = bounds[-1] + 1e6
    masked = jnp.where(starts > t, starts, big)
    return jnp.min(masked)


def current_swing_time(bounds: jax.Array, t: jax.Array) -> jax.Array:
    """Duration of the swing phase active (or most recently started) at t.

    Reference: Trajectory::GetCurrentSwingTime — used by the touchdown-pin
    constraint gate.  If t is in stance, returns the duration of the next
    swing slot.
    """
    p = phase_index(bounds, t)
    swing_slot = jnp.where(p % 2 == 1, p, jnp.minimum(p + 1, bounds.shape[-1] - 2))
    return bounds[swing_slot + 1] - bounds[swing_slot]


def advance_window(sched: GaitSchedule, t0: jax.Array,
                   cfg: MPCConfig) -> GaitSchedule:
    """Receding-horizon shift: drop fully-past cycles, append new ones.

    Fixed-shape equivalent of RemoveUnusedPolys + AddPolys
    (mpc/mpc.cpp:1220-1230): per EE, while the first (stance, swing) cycle is
    entirely before t0, roll the bounds left by 2 and extend the tail by one
    nominal cycle.  Implemented as a single gather with a per-EE shift count,
    so it is jit-friendly and O(P).
    """
    b = sched.bounds  # [E, P+1]
    P = b.shape[-1] - 1
    d = cfg.phase_duration
    # number of full cycles (2 slots) completely before t0, per EE
    # cycle c is past iff bounds[2(c+1)] <= t0
    cyc_ends = b[:, 2::2]  # [E, P//2] boundaries at ends of cycles
    n_past = jnp.sum(cyc_ends <= t0[..., None], axis=-1).astype(jnp.int32)  # [E]
    shift = 2 * n_past

    idx = jnp.arange(P + 1)[None, :] + shift[:, None]          # [E, P+1]
    overflow = idx > P
    idx_c = jnp.clip(idx, 0, P)
    gathered = jnp.take_along_axis(b, idx_c, axis=-1)
    # entries past the original array extend by REPEATING THE LAST CYCLE's
    # (stance, swing) durations, so the window shift preserves whatever
    # cadence the schedule encodes: nominal trot (d, d), overlapped trot
    # (d+ov, d-ov), standing (2d, 0), or gait-optimizer-adapted times.
    # b[P] is an even (stance-start) boundary (P even, config.validate),
    # so overflow step k alternates +stance_dur, +swing_dur.
    sd = b[:, -2:-1] - b[:, -3:-2]                      # last stance duration
    wd = b[:, -1:] - b[:, -2:-1]                        # last swing duration
    k = (idx - P).astype(b.dtype)
    extra = jnp.ceil(k / 2) * sd + jnp.floor(k / 2) * wd
    new_b = jnp.where(overflow, b[:, -1:] + extra, gathered)
    return GaitSchedule(bounds=new_b)


def roll_spline_vars(f_nodes: jax.Array, footholds: jax.Array,
                     n_past: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Shift per-stance-slot decision variables in lockstep with the window.

    f_nodes:   [E, S, F-1, 3, 2]; footholds: [E, S+1, 2]; n_past: [E] cycles
    dropped by :func:`advance_window`.  New tail slots REPEAT the last
    in-window slot's values (periodic warm start); footholds copy the last
    foothold.  Zero-filling the tail forces instead plans free fall for
    every tail node that enters the horizon: measured on a stretched trot,
    each window-shift tick then carries a defect of ~47 (vs ~1e-3 steady)
    and a one-RTI cost spike of +2e5 — a periodic plan transient at every
    shift (the reference's AddPolys warm-starts new polys from the
    existing spline for the same reason, trajectory.cpp:225-246).
    """
    S = f_nodes.shape[1]
    idx_f = jnp.arange(S)[None, :] + n_past[:, None]
    idx_fc = jnp.clip(idx_f, 0, S - 1)
    f_new = jnp.take_along_axis(f_nodes, idx_fc[:, :, None, None, None],
                                axis=1)

    Sp1 = footholds.shape[1]
    idx_p = jnp.arange(Sp1)[None, :] + n_past[:, None]
    idx_pc = jnp.clip(idx_p, 0, Sp1 - 1)
    p_new = jnp.take_along_axis(footholds, idx_pc[:, :, None], axis=1)
    # overflow footholds keep the last known value (clip already does this)
    return f_new, p_new


def past_cycles(sched: GaitSchedule, t0: jax.Array) -> jax.Array:
    """[E] number of fully-past (stance, swing) cycles — input to the rolls."""
    cyc_ends = sched.bounds[:, 2::2]
    return jnp.sum(cyc_ends <= t0[..., None], axis=-1).astype(jnp.int32)


def adjust_for_current_contacts(sched: GaitSchedule, measured: jax.Array,
                                t: jax.Array,
                                window: float = 7e-2) -> GaitSchedule:
    """Early-touchdown fixup (MPC::AdjustForCurrentContacts,
    mpc/mpc.cpp:1195-1203): feet that measure contact while still scheduled
    for swing, within `window` seconds of their planned touchdown, get the
    touchdown snapped to now."""
    desired = contact_flags(sched, t)
    next_td = jax.vmap(lambda b: next_touchdown_time(b, t))(sched.bounds)
    mask = measured & ~desired & ((next_td - t) < window)
    return set_ee_in_contact(sched, mask, t)


def hold_for_flight(sched: GaitSchedule, measured: jax.Array,
                    dt_slip: jax.Array | float) -> GaitSchedule:
    """Flight-phase schedule hold: while NO foot measures contact, the gait
    clock pauses — every boundary shifts later by the airborne time.

    The braking transient at the capture limit launches a brief flight
    phase (diagnosed r3, PARITY.md): the schedule keeps advancing while the
    robot is airborne, so the landing arrives mid-slot, desynced from the
    plan, and single-foot support builds roll/pitch.  Holding ALL bounds by
    the measured flight duration keeps the planned touchdown pattern
    aligned with the instant the robot can actually land; the existing
    early-touchdown snap (:func:`adjust_for_current_contacts`, the
    reference's one-sided fixup, mpc/mpc.cpp:1195-1203) then syncs the
    exact landing instant.  Gating on FULL flight (no foot in contact) is
    what distinguishes this from the blanket late-landing delay measured
    destabilizing in r3: with any support present, delaying planned support
    is positive feedback on a fall; with zero support there is no support
    to delay — only the landing time to re-phase.

    Shifting the whole bounds array preserves every phase duration and the
    inter-leg pattern (it is a time translation of the schedule), so the
    bilevel decision variables stay consistent.
    """
    airborne = ~jnp.any(measured)
    shift = jnp.where(airborne, dt_slip, 0.0).astype(sched.bounds.dtype)
    return GaitSchedule(bounds=sched.bounds + shift)


def set_ee_in_contact(sched: GaitSchedule, ee_mask: jax.Array,
                      t: jax.Array) -> GaitSchedule:
    """Early-touchdown fixup: pull the next touchdown back to time t.

    Reference: MPC::AdjustForCurrentContacts + Trajectory::SetEEInContact
    (mpc/mpc.cpp:1195-1203) — when a foot lands early (within 70 ms of its
    scheduled touchdown), snap the upcoming stance start to now.  ee_mask is
    a [E] bool of feet to adjust.
    """
    b = sched.bounds  # [E, P+1]
    starts_idx = jnp.arange(b.shape[-1])
    is_td = (starts_idx % 2 == 0)[None, :]
    future = b > t
    # first future touchdown boundary per EE
    cand = jnp.where(is_td & future, b, b[:, -1:] + 1e6)
    td_col = jnp.argmin(cand, axis=-1)  # [E]
    onehot = jax.nn.one_hot(td_col, b.shape[-1], dtype=b.dtype)
    new_b = jnp.where(ee_mask[:, None], b * (1 - onehot) + t * onehot, b)
    # keep monotonic: boundaries before the moved one must not exceed it
    new_b = jnp.minimum(new_b, jnp.where(
        starts_idx[None, :] <= td_col[:, None], t + 0.0 * new_b, jnp.inf))
    new_b = jnp.where(ee_mask[:, None], new_b, b)
    return GaitSchedule(bounds=new_b)
