"""Contact-phase cubic-Hermite splines for forces and foot positions.

Pure-function, fixed-shape replacement for the reference's
``EndEffectorSplines`` (mpc/spline/end_effector_splines.cpp).  Semantics
preserved:

* FORCE (per coord): inside a stance slot the force is a chain of
  ``F = num_force_polys`` cubic Hermite segments on a uniform sub-grid of the
  stance interval.  Only the F-1 *interior* nodes are decision variables,
  each (value, deriv) with the derivative variable scaled by FORCE_MULT=100
  for conditioning (end_effector_splines.h:152).  The stance boundary nodes
  are fixed at (0, 0) and the force is identically zero in swing — the
  reference achieves this by making boundary nodes NoDeriv with never-set
  zero vars (GetMutableNodes returns only FullDeriv force nodes,
  end_effector_splines.cpp:905-914).

* POSITION xy (per coord): one foothold variable per stance slot (the
  reference ties the TouchDown and LiftOff NoDeriv nodes of a stance to a
  single QP variable, end_effector_splines.cpp:916-935); during swing the
  position is a zero-end-derivative Hermite (smoothstep) between consecutive
  footholds.

* POSITION z: NOT a decision variable.  foot_offset during stance; during
  swing a two-segment Hermite lifting to ``swing_height`` at mid-swing with
  zero apex derivative (Trajectory::SetSwingPosZ, trajectory.cpp:303-317).

Everything is differentiable in the phase boundary times ``bounds`` — the
reference's ~1.3k LoC of hand-written ComputePartialWrtTime /
ComputeCoefPartialWrtTime (end_effector_splines.cpp:513-804) are replaced by
``jax.grad`` through these functions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from bilevel_gait_gen_tpu.mpc.gait import phase_index

FORCE_MULT = 100.0
_EPS = 1e-8


def _hermite(x0, x1, d0, d1, dt, s):
    """Cubic Hermite value at local time s in [0, dt] (reference
    EndEffectorSplines::ValueAt, end_effector_splines.cpp:169-199)."""
    dt = jnp.maximum(dt, _EPS)
    a2 = -(3.0 * (x0 - x1)) / dt**2 - (2.0 * d0 + d1) / dt
    a3 = (2.0 * (x0 - x1)) / dt**3 + (d0 + d1) / dt**2
    return x0 + d0 * s + a2 * s * s + a3 * s * s * s


def force_value(bounds: jax.Array, f_nodes: jax.Array, t: jax.Array,
                num_force_polys: int) -> jax.Array:
    """Contact force of one EE at time t -> [3].

    bounds:  [P+1] phase boundaries (even slots stance)
    f_nodes: [S, F-1, 3, 2] interior stance nodes (value, scaled-deriv)
    """
    F = num_force_polys
    p = phase_index(bounds, t)
    is_stance = (p % 2 == 0)
    s_idx = p // 2

    t_lo = bounds[p]
    t_hi = bounds[p + 1]
    dur = jnp.maximum(t_hi - t_lo, _EPS)
    seg_dt = dur / F
    j = jnp.clip(jnp.floor((t - t_lo) / seg_dt).astype(jnp.int32), 0, F - 1)
    s_local = t - (t_lo + j.astype(t.dtype) * seg_dt)

    nodes = f_nodes[s_idx]  # [F-1, 3, 2]
    zero = jnp.zeros((3, 2), dtype=f_nodes.dtype)
    # node j (left) and j+1 (right) of the sub-grid; grid node k in 1..F-1 is
    # variable nodes[k-1]; grid nodes 0 and F are fixed (0, 0).
    left = jnp.where((j == 0)[..., None, None], zero, nodes[jnp.maximum(j - 1, 0)])
    right = jnp.where((j == F - 1)[..., None, None], zero,
                      nodes[jnp.minimum(j, F - 2)])

    val = _hermite(left[:, 0], right[:, 0],
                   FORCE_MULT * left[:, 1], FORCE_MULT * right[:, 1],
                   seg_dt, s_local)
    return jnp.where(is_stance, val, jnp.zeros(3, dtype=f_nodes.dtype))


def foot_position(bounds: jax.Array, footholds: jax.Array, t: jax.Array,
                  swing_height: float, foot_offset: float) -> jax.Array:
    """World foot position of one EE at time t -> [3].

    bounds:    [P+1]; footholds: [S+1, 2] xy per stance slot (slot 2s ->
    foothold s; the trailing entry is the target past the last stance).
    """
    p = phase_index(bounds, t)
    is_stance = (p % 2 == 0)
    s_idx = p // 2

    # xy
    xy_stance = footholds[s_idx]
    t_lo = bounds[p]
    dur = jnp.maximum(bounds[p + 1] - t_lo, _EPS)
    tau = jnp.clip((t - t_lo) / dur, 0.0, 1.0)
    blend = tau * tau * (3.0 - 2.0 * tau)  # zero-deriv Hermite (smoothstep)
    xy_swing = footholds[s_idx] + blend * (footholds[jnp.minimum(
        s_idx + 1, footholds.shape[0] - 1)] - footholds[s_idx])
    xy = jnp.where(is_stance, xy_stance, xy_swing)

    # z: prescribed swing profile (two Hermite halves to the apex)
    half = 0.5 * dur
    first_half = tau < 0.5
    s_loc = jnp.where(first_half, t - t_lo, t - t_lo - half)
    z_swing = jnp.where(
        first_half,
        _hermite(foot_offset, swing_height, 0.0, 0.0, half, s_loc),
        _hermite(swing_height, foot_offset, 0.0, 0.0, half, s_loc),
    )
    z = jnp.where(is_stance, jnp.asarray(foot_offset, dtype=xy.dtype), z_swing)
    return jnp.concatenate([xy, z[None]])


# ----------------------------------------------------------------------------
# Dense basis weights (assembly fast path)
#
# The QP assembly needs d(force)/d(vars) and d(position)/d(vars) at many
# fixed times.  Autodiff per constraint row works but is gather-heavy; these
# closed forms produce the same weights as dense masked arithmetic over the
# static slot grid — no dynamic indexing, MXU/VPU-friendly, and still
# differentiable in `bounds` (the reference's GetPolyVarsLin / GetVarsIdx
# pair, end_effector_splines.cpp:201-354, done as one vectorized expression).
# ----------------------------------------------------------------------------

def _hermite_basis(dt, s):
    """Cubic Hermite basis (h00, h01, h10, h11) at local time s in [0, dt]."""
    dt = jnp.maximum(dt, _EPS)
    r2 = (s * s) / (dt * dt)
    r3 = (s * s * s) / (dt * dt * dt)
    h00 = 1.0 - 3.0 * r2 + 2.0 * r3
    h01 = 3.0 * r2 - 2.0 * r3
    h10 = s - 2.0 * s * s / dt + s * s * s / (dt * dt)
    h11 = -s * s / dt + s * s * s / (dt * dt)
    return h00, h01, h10, h11


def force_weights(bounds: jax.Array, t: jax.Array,
                  num_force_polys: int) -> jax.Array:
    """[S, F-1, 2] weights with force_coord(t) = sum w * f_nodes[:, :, coord].

    Same for every coordinate.  Zero outside stance (swing / out of window).
    """
    F = num_force_polys
    P = bounds.shape[-1] - 1
    S = (P + 1) // 2
    t0 = bounds[0:2 * S:2]
    t1 = bounds[1:2 * S + 1:2]
    dur = jnp.maximum(t1 - t0, _EPS)
    seg = dur / F
    active = (t >= t0) & (t < t1)                      # [S]
    j = jnp.clip(jnp.floor((t - t0) / seg), 0, F - 1)  # [S] float
    s_loc = t - (t0 + j * seg)
    h00, h01, h10, h11 = _hermite_basis(seg, s_loc)    # [S] each
    k = jnp.arange(1, F, dtype=bounds.dtype)           # [F-1] interior nodes
    left = (j[:, None] == k[None, :])                  # node k is x0 of seg j
    right = (j[:, None] == k[None, :] - 1.0)           # node k is x1 of seg j
    w_val = jnp.where(left, h00[:, None], 0.0) + jnp.where(
        right, h01[:, None], 0.0)
    w_dot = (jnp.where(left, h10[:, None], 0.0)
             + jnp.where(right, h11[:, None], 0.0)) * FORCE_MULT
    w = jnp.stack([w_val, w_dot], axis=-1)             # [S, F-1, 2]
    return w * active[:, None, None]


def foothold_weights(bounds: jax.Array, t: jax.Array) -> jax.Array:
    """[S+1] weights with foot_xy(t) = sum w * footholds (per coord)."""
    P = bounds.shape[-1] - 1
    S = (P + 1) // 2
    n_fh = S + 1
    t0 = bounds[0:2 * S:2]                             # stance starts [S]
    t1 = bounds[1:2 * S + 1:2]                         # stance ends   [S]
    # stance s: weight 1 on foothold s
    stance_active = (t >= t0) & (t < t1)               # [S]
    # swing after stance s: slot [t1[s], t0[s+1]) blending s -> s+1
    t0_next = jnp.concatenate([t0[1:], bounds[-1:]])   # [S]
    swing_active = (t >= t1) & (t < t0_next)
    dur = jnp.maximum(t0_next - t1, _EPS)
    tau = jnp.clip((t - t1) / dur, 0.0, 1.0)
    blend = tau * tau * (3.0 - 2.0 * tau)
    w = jnp.zeros(n_fh, dtype=bounds.dtype)
    # NOTE: stance_active.astype, not where(cond, 1.0, 0.0) — scalar-only
    # where branches promote to f64 under jax_enable_x64 and silently run
    # all downstream foot-position math at doubled precision (test envs
    # then diverge from the f32 production rollout)
    w = w.at[:S].add(stance_active.astype(bounds.dtype))
    w = w.at[:S].add(jnp.where(swing_active, 1.0 - blend, 0.0))
    w = w.at[1:].add(jnp.where(swing_active, blend, 0.0))
    # before the first stance (t < t0[0]): hold foothold 0
    before = t < t0[0]
    w = jnp.where(before, jnp.zeros(n_fh, bounds.dtype).at[0].set(1.0), w)
    # after the last boundary: hold the final foothold
    after = t >= bounds[-1]
    w = jnp.where(after, jnp.zeros(n_fh, bounds.dtype).at[-1].set(1.0), w)
    return w


def foot_z_value(bounds: jax.Array, t: jax.Array, swing_height: float,
                 foot_offset: float) -> jax.Array:
    """Prescribed z profile (not a decision variable)."""
    P = bounds.shape[-1] - 1
    S = (P + 1) // 2
    t1 = bounds[1:2 * S + 1:2]
    t0 = bounds[0:2 * S:2]
    t0_next = jnp.concatenate([t0[1:], bounds[-1:]])
    swing_active = (t >= t1) & (t < t0_next)
    dur = jnp.maximum(t0_next - t1, _EPS)
    tau = jnp.clip((t - t1) / dur, 0.0, 1.0)
    half = 0.5 * dur
    first = tau < 0.5
    s_loc = jnp.where(first, t - t1, t - t1 - half)
    z_sw = jnp.where(first,
                     _hermite(foot_offset, swing_height, 0.0, 0.0, half, s_loc),
                     _hermite(swing_height, foot_offset, 0.0, 0.0, half, s_loc))
    z = jnp.where(jnp.any(swing_active),
                  jnp.sum(jnp.where(swing_active, z_sw, 0.0)),
                  jnp.asarray(foot_offset, bounds.dtype))
    return z


def forces_all(sched_bounds: jax.Array, f_nodes: jax.Array, t: jax.Array,
               num_force_polys: int) -> jax.Array:
    """[E, 3] forces for all EEs at time t."""
    return jax.vmap(lambda b, fn: force_value(b, fn, t, num_force_polys))(
        sched_bounds, f_nodes)


def carrier_weights(all_bounds: jax.Array, t: jax.Array,
                    ramp: float) -> jax.Array:
    """[E] normalized static-support weights (sum = 1 whenever any stance).

    The force spline pins its value to ZERO at every stance boundary
    (reference NoDeriv boundary nodes) and spaces its F-1 interior nodes
    proportionally to the stance length, so a plan structurally cannot hold
    the robot's weight near a boundary (or anywhere early in a long merged
    stance) — the planned total support dips below mg and the closed loop
    tracks a falling plan (measured: 73 N of 135 N at t0 for standing).
    The carrier reparameterizes planned forces as
    ``f = carrier + spline(u)``: a trapezoidal weight-transfer profile per
    stance (linear ramp of length `ramp` at each end, clipped to half the
    stance) distributing m*g over the stance feet, normalized so total
    planned support is exactly m*g at every instant at least one foot has
    positive weight.  The QP optimizes the *delta* spline u around it; the
    boundary zero-pin then means "default to static support", not "default
    to free fall".  Piecewise-linear in `bounds` — differentiable for the
    bilevel gradient.
    """
    P = all_bounds.shape[-1] - 1
    S = (P + 1) // 2
    t0 = all_bounds[:, 0:2 * S:2]                       # [E, S] stance starts
    t1 = all_bounds[:, 1:2 * S + 1:2]                   # [E, S] stance ends
    dur = t1 - t0
    r = jnp.minimum(jnp.asarray(ramp, all_bounds.dtype),
                    jnp.maximum(dur / 2, _EPS))
    # ramps only exist at REAL contact transitions: a zero-length swing
    # between two chained stance slots (the standing schedule) is not a
    # liftoff, so the weight stays 1 across it — otherwise the carrier
    # would dip to zero at an instant where no foot actually leaves ground
    big = jnp.asarray(1e9, all_bounds.dtype)
    nxt_swing = jnp.concatenate([t0[:, 1:], t0[:, -1:] + big],
                                axis=-1) - t1            # [E, S]
    # the first slot's preceding swing is outside the window (advance_window
    # dropped it); infer its duration from the schedule's own tail cadence —
    # the same pattern the window extension repeats.  Standing (zero-length
    # swings) then keeps carrying across window shifts instead of re-ramping
    # from zero at the shifted boundary (measured: planned support hit 0 at
    # t=0.3 right after the first shift, unloading all four feet).
    wd_tail = all_bounds[:, -1:] - all_bounds[:, -2:-1]  # [E, 1] last swing
    prv_swing = t0 - jnp.concatenate([t0[:, :1] - wd_tail, t1[:, :-1]],
                                     axis=-1)
    sw_eps = 1e-4
    inside = (t >= t0) & (t < t1)
    up = jnp.where(prv_swing > sw_eps, jnp.clip((t - t0) / r, 0.0, 1.0), 1.0)
    down = jnp.where(nxt_swing > sw_eps, jnp.clip((t1 - t) / r, 0.0, 1.0),
                     1.0)
    w = jnp.sum(inside * up * down * (dur > _EPS), axis=-1)  # [E]
    return w / jnp.maximum(jnp.sum(w), 1e-3)


def carrier_forces(all_bounds: jax.Array, t: jax.Array, total_weight,
                   ramp: float) -> jax.Array:
    """[E, 3] static-support carrier forces (z only); total_weight = m*g."""
    w = carrier_weights(all_bounds, t, ramp) * total_weight
    zero = jnp.zeros_like(w)
    return jnp.stack([zero, zero, w], axis=-1)


def foot_positions_all(sched_bounds: jax.Array, footholds: jax.Array,
                       t: jax.Array, swing_height: float,
                       foot_offset: float) -> jax.Array:
    """[E, 3] foot positions for all EEs at time t."""
    return jax.vmap(lambda b, fh: foot_position(b, fh, t, swing_height,
                                                foot_offset))(
        sched_bounds, footholds)
