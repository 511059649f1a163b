"""Block-level reference-parity contracts (VERDICT r2 item 10).

Independent of the repo's own golden rollout: each test HAND-COMPUTES a
reference constraint block from the formulas the reference implements —
friction pyramid rows sampled through a stance
(MPC::AddFrictionConeConstraints, mpc/mpc.cpp:166-238), force-box rows
(AddForceBoxConstraints, :352-414), the touchdown-position pin
(AddTDPositionConstraints, mpc_single_rigid_body.cpp:849-887), and the
Euler-discretized SRB dynamics step (CalcDynamics,
single_rigid_body_model.cpp:222-256 + discretization :246-248) — using its
own cubic-Hermite / pyramid / rigid-body math written from the textbook
formulas, and asserts the assembled condensed QP realizes exactly those
values.  This is the style of the reference's own "Basic MPC"/"Model
Partials" contract tests (test/mpc_test.cpp:41-270), done against this
repo's independent implementations rather than its conventions.
"""
import numpy as np
import jax
import jax.numpy as jnp

from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import gait, qp as qp_mod, solver
from bilevel_gait_gen_tpu.mpc.gait import GaitSchedule
from bilevel_gait_gen_tpu.mpc.trajectory import (Trajectory,
                                                 default_trajectory,
                                                 make_unravel, ravel_u)
from bilevel_gait_gen_tpu.utils.config import MPCConfig

CFG = MPCConfig().validate()
MODEL = a1.make_a1()
Q0 = jnp.array(a1.stand_config(), dtype=jnp.float64)
PARAMS = srb.make_srb_params(MODEL, Q0)
X0 = srb.reconstruct_state(PARAMS, Q0, jnp.zeros(MODEL.nv, jnp.float64))
FEET0 = rbd.ee_positions(MODEL, Q0)
X_DES = srb.manifold_to_tangent(X0)
FORCE_MULT = 100.0   # end_effector_splines.h:152


def _rand_traj(key=0, scale=20.0):
    """Trajectory with NONZERO force nodes / perturbed footholds so the
    hand-computed values exercise the full Hermite basis, not zeros."""
    traj = default_trajectory(CFG, gait.make_trot(CFG), X0, FEET0[:, :2])
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    f_nodes = scale * jax.random.normal(k1, traj.f_nodes.shape,
                                        jnp.float64)
    footholds = traj.footholds + 0.03 * jax.random.normal(
        k2, traj.footholds.shape, jnp.float64)
    return Trajectory(x_man=traj.x_man, f_nodes=f_nodes,
                      footholds=footholds, sched=traj.sched)


def _assembled(traj):
    return qp_mod.assemble(CFG, PARAMS, traj, X0, jnp.array(0.0), FEET0,
                           X_DES, jnp.asarray(CFG.ee_box_size, jnp.float64))


# ---------------------------------------------------------------------------
# independent hand math (numpy, written from the formulas — NOT calling
# ops/spline.py)
# ---------------------------------------------------------------------------

def _hand_hermite(x0, x1, m0, m1, dt, s):
    """Textbook cubic Hermite on [0, dt] with endpoint values/derivatives."""
    tau = s / dt
    h00 = 2 * tau**3 - 3 * tau**2 + 1
    h10 = tau**3 - 2 * tau**2 + tau
    h01 = -2 * tau**3 + 3 * tau**2
    h11 = tau**3 - tau**2
    return h00 * x0 + h10 * dt * m0 + h01 * x1 + h11 * dt * m1


def _hand_force(bounds_ee, f_nodes_ee, t, F):
    """Reference force spline: per stance, F cubic-Hermite segments on a
    uniform sub-grid; boundary grid nodes fixed (0, 0); interior node k has
    (value, FORCE_MULT-scaled derivative) variables
    (end_effector_splines.cpp:34-199)."""
    b = np.asarray(bounds_ee)
    S = (len(b) - 1 + 1) // 2
    for s_idx in range(S):
        lo, hi = b[2 * s_idx], b[2 * s_idx + 1]
        if lo <= t < hi:
            seg = (hi - lo) / F
            j = min(int((t - lo) // seg), F - 1)
            # grid node j -> variable j-1 (grid 0 and F fixed zero)
            def node(g):
                if g == 0 or g == F:
                    return np.zeros(3), np.zeros(3)
                v = np.asarray(f_nodes_ee[s_idx, g - 1, :, 0])
                d = FORCE_MULT * np.asarray(f_nodes_ee[s_idx, g - 1, :, 1])
                return v, d
            x0, m0 = node(j)
            x1, m1 = node(j + 1)
            s_loc = t - (lo + j * seg)
            return _hand_hermite(x0, x1, m0, m1, seg, s_loc)
    return np.zeros(3)   # swing / out of window


def _hand_foot_xy(bounds_ee, fh_ee, t):
    """Reference position spline: constant foothold in stance; smoothstep
    (zero-end-derivative Hermite) blend between consecutive footholds in
    swing (end_effector_splines.cpp position nodes + Trajectory swing)."""
    b = np.asarray(bounds_ee)
    fh = np.asarray(fh_ee)
    S = (len(b) - 1 + 1) // 2
    if t < b[0]:
        return fh[0]
    for s_idx in range(S):
        lo, hi = b[2 * s_idx], b[2 * s_idx + 1]
        if lo <= t < hi:
            return fh[s_idx]
        nxt = b[2 * s_idx + 2] if 2 * s_idx + 2 < len(b) else b[-1]
        if hi <= t < nxt:
            tau = np.clip((t - hi) / max(nxt - hi, 1e-8), 0.0, 1.0)
            blend = tau * tau * (3.0 - 2.0 * tau)
            return fh[s_idx] + blend * (fh[min(s_idx + 1, len(fh) - 1)]
                                        - fh[s_idx])
    return fh[-1]


def _pyramid(mu):
    """Reference SetFrictionPyramid rows (mpc/mpc.cpp:153-163):
    h - mu n, -(h + mu n), l - mu n, -(l + mu n)."""
    return np.array([[1.0, 0.0, -mu],
                     [-1.0, 0.0, -mu],
                     [0.0, 1.0, -mu],
                     [0.0, -1.0, -mu]])


# ---------------------------------------------------------------------------
# contracts
# ---------------------------------------------------------------------------

def test_friction_cone_rows_match_hand_pyramid():
    """G/h cone rows realize pyr_row . f(t_sample) <= 0 at the reference's
    sample times t = td + (i/FB)(lo - td) (AddFrictionConeConstraints,
    mpc/mpc.cpp:174-181), with f(t) the hand-computed Hermite force."""
    traj = _rand_traj()
    qp = _assembled(traj)
    u = ravel_u(traj.f_nodes, traj.footholds)
    Gu_h = np.asarray(qp.G @ u - qp.h)

    E, S, FB = CFG.num_ee, CFG.num_stance_slots, CFG.samples_per_stance
    F = CFG.num_force_polys
    pyr = _pyramid(CFG.friction_coef)
    b = np.asarray(traj.sched.bounds)

    checked = 0
    for e in range(E):
        for s_idx in range(S):
            td, lo = b[e, 2 * s_idx], b[e, 2 * s_idx + 1]
            if lo <= td:
                continue
            for i in range(FB):
                t = td + (i / FB) * (lo - td)
                f = _hand_force(b[e], np.asarray(traj.f_nodes[e]), t, F)
                for r in range(4):
                    idx = ((e * S + s_idx) * FB + i) * 4 + r
                    want = pyr[r] @ f
                    np.testing.assert_allclose(Gu_h[idx], want, atol=1e-8,
                                               err_msg=f"cone row {idx}")
                    checked += 1
    assert checked >= 4 * FB * E, "too few active cone rows checked"


def test_force_box_rows_match_hand_bound():
    """fz rows realize fz(t) <= force_bound and -fz(t) <= 0
    (AddForceBoxConstraints, mpc/mpc.cpp:352-414)."""
    traj = _rand_traj(key=1)
    qp = _assembled(traj)
    u = ravel_u(traj.f_nodes, traj.footholds)
    Gu_h = np.asarray(qp.G @ u - qp.h)

    E, S, FB = CFG.num_ee, CFG.num_stance_slots, CFG.samples_per_stance
    F = CFG.num_force_polys
    n_cone = E * S * FB * 4
    n_fz = E * S * FB
    b = np.asarray(traj.sched.bounds)

    checked = 0
    for e in range(E):
        for s_idx in range(S):
            td, lo = b[e, 2 * s_idx], b[e, 2 * s_idx + 1]
            if lo <= td:
                continue
            for i in range(FB):
                t = td + (i / FB) * (lo - td)
                fz = _hand_force(b[e], np.asarray(traj.f_nodes[e]), t, F)[2]
                idx = (e * S + s_idx) * FB + i
                np.testing.assert_allclose(Gu_h[n_cone + idx],
                                           fz - CFG.force_bound, atol=1e-8)
                np.testing.assert_allclose(Gu_h[n_cone + n_fz + idx],
                                           -fz, atol=1e-8)
                checked += 2
    assert checked >= 2 * FB * E


def test_td_pin_rows_match_hand_touchdown():
    """Active TD rows pin foot_xy(next touchdown) to its CURRENT value
    (AddTDPositionConstraints, mpc_single_rigid_body.cpp:849-887; active
    only when > td_fraction=0.75 through the swing, mpc.cpp:73,1208)."""
    traj = _rand_traj(key=2)
    # place t0 late in EE 0's first swing so its TD pin is active
    b = np.asarray(traj.sched.bounds, np.float64)
    sw_lo, sw_hi = b[0, 1], b[0, 2]          # first swing of EE 0
    t0 = sw_lo + 0.9 * (sw_hi - sw_lo)
    qp = qp_mod.assemble(CFG, PARAMS, traj, X0, jnp.asarray(t0), FEET0,
                         X_DES, jnp.asarray(CFG.ee_box_size, jnp.float64))
    u = ravel_u(traj.f_nodes, traj.footholds)
    Au = np.asarray(qp.A @ u)
    beq = np.asarray(qp.b)

    E = CFG.num_ee
    checked = 0
    for e in range(E):
        # the next touchdown after t0 (boundaries at even indices)
        tds = b[e, 0::2]
        nxt = tds[tds > t0]
        swing_start = b[e, 1::2][b[e, 1::2] <= t0]
        if not len(nxt) or not len(swing_start):
            continue
        td_t = float(nxt[0])
        sw = td_t - float(swing_start[-1])
        if (td_t - t0) >= CFG.td_fraction * sw:
            continue                          # row masked inactive
        # a different foothold set: the row residual must equal the hand
        # foot-position delta (the constraint's content, not an identity)
        fh2 = np.asarray(traj.footholds) + 0.05
        u2 = ravel_u(traj.f_nodes, jnp.asarray(fh2))
        Au2 = np.asarray(qp.A @ u2)
        want = _hand_foot_xy(b[e], np.asarray(traj.footholds[e]), td_t)
        want2 = _hand_foot_xy(b[e], fh2[e], td_t)
        for c in range(2):
            row = 2 * E + 2 * e + c           # after the EE-start rows
            # A u = b holds AT the current trajectory (the pin target is
            # the current touchdown position)
            np.testing.assert_allclose(Au[row], beq[row], atol=1e-8)
            np.testing.assert_allclose(Au2[row] - beq[row],
                                       want2[c] - want[c], atol=1e-8)
            checked += 1
    assert checked >= 2, "no active TD row found (scenario precondition)"


def test_condensed_dynamics_first_step_matches_hand_euler():
    """recover_states realizes the Euler-discretized SRB dynamics: at the
    linearization point, x1 = x0 + dt * f(x0, u) with f the reference's
    rigid-body equations pdot = h/m, hdot = m g + sum f,
    qdot = Ir^-1 w, wdot = -w x Ir w + sum (r_ee - p) x f
    (CalcDynamics, single_rigid_body_model.cpp:222-256; Euler
    discretization :246-248) — all hand-computed, forces/feet via the
    hand Hermite/smoothstep splines."""
    traj = _rand_traj(key=3)
    # linearization trajectory starts exactly at the measured state, so the
    # first condensed step has no Jacobian correction terms
    assert np.allclose(np.asarray(traj.x_man[0]), np.asarray(X0))
    qp = _assembled(traj)
    u = ravel_u(traj.f_nodes, traj.footholds)
    xs = np.asarray(qp_mod.recover_states(qp, u))     # [N+1, 12] tangent

    b = np.asarray(traj.sched.bounds)
    F = CFG.num_force_polys
    mass = float(PARAMS.mass)
    Ir = np.asarray(PARAMS.inertia)
    Ir_inv = np.linalg.inv(Ir)

    x0_tan = np.asarray(srb.manifold_to_tangent(X0))
    p, h, w = x0_tan[0:3], x0_tan[3:6], x0_tan[9:12]
    t = 0.0
    forces = np.stack([_hand_force(b[e], np.asarray(traj.f_nodes[e]), t, F)
                       for e in range(CFG.num_ee)])
    feet = []
    for e in range(CFG.num_ee):
        xy = _hand_foot_xy(b[e], np.asarray(traj.footholds[e]), t)
        feet.append(np.array([xy[0], xy[1], CFG.foot_offset]))  # stance z
    feet = np.stack(feet)

    pdot = h / mass
    hdot = mass * np.array([0.0, 0.0, -9.81]) + forces.sum(axis=0)
    qdot = Ir_inv @ w
    wdot = (-np.cross(w, Ir @ w)
            + np.cross(feet - p[None, :], forces).sum(axis=0))
    xdot = np.concatenate([pdot, hdot, qdot, wdot])

    x1_hand = x0_tan + CFG.dt * xdot
    np.testing.assert_allclose(xs[0], x0_tan, atol=1e-9)
    np.testing.assert_allclose(xs[1], x1_hand, atol=1e-7, rtol=1e-7)
