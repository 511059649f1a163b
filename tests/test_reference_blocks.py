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


def test_ee_start_rows_match_hand_positions():
    """EE-start rows realize foot_xy(t0) = measured foot position
    (AddEEStartConstraints, mpc_single_rigid_body.cpp:445-475): the row's
    A.u equals the hand smoothstep foot position at t0 and its b equals the
    measured xy.  t0 is placed mid-swing of EE 0 so the blend weights (not
    just a foothold identity) are exercised."""
    traj = _rand_traj(key=5)
    b = np.asarray(traj.sched.bounds, np.float64)
    t0 = 0.5 * (b[0, 1] + b[0, 2])          # mid first swing of EE 0
    qp = qp_mod.assemble(CFG, PARAMS, traj, X0, jnp.asarray(t0), FEET0,
                         X_DES, jnp.asarray(CFG.ee_box_size, jnp.float64))
    u = ravel_u(traj.f_nodes, traj.footholds)
    Au = np.asarray(qp.A @ u)
    beq = np.asarray(qp.b)
    E = CFG.num_ee
    for e in range(E):
        want = _hand_foot_xy(b[e], np.asarray(traj.footholds[e]), t0)
        for c in range(2):
            row = 2 * e + c
            np.testing.assert_allclose(Au[row], want[c], atol=1e-9,
                                       err_msg=f"EE-start row ({e},{c})")
            np.testing.assert_allclose(beq[row], float(FEET0[e, c]),
                                       atol=1e-9)


def test_ee_box_rows_match_hand_box():
    """EE-box rows realize  lb <= foot_xy(t_k) - com_xy(t_k) <= ub with
    ub/lb = hip_offset +- box/2 (AddEELocationConstraints,
    mpc_single_rigid_body.cpp:381-443, split +- rows for the one-sided
    form).  foot_xy is the hand smoothstep spline; com_xy comes from the
    condensed state map, itself contract-tested against the hand Euler
    dynamics above."""
    traj = _rand_traj(key=6)
    qp = _assembled(traj)
    u = ravel_u(traj.f_nodes, traj.footholds)
    Gu_h = np.asarray(qp.G @ u - qp.h)
    xs = np.asarray(qp_mod.recover_states(qp, u))

    E, S, FB, N = (CFG.num_ee, CFG.num_stance_slots,
                   CFG.samples_per_stance, CFG.num_nodes)
    n_cone = E * S * FB * 4
    n_fz = E * S * FB
    n_box = (N + 1 - CFG.ee_node_start) * E * 2
    base_ub = n_cone + 2 * n_fz
    base_lb = base_ub + n_box
    b = np.asarray(traj.sched.bounds)
    hip = np.asarray(PARAMS.hip_offset)
    half = np.asarray(CFG.ee_box_size) / 2

    checked = 0
    for k in range(CFG.ee_node_start, N + 1):
        t = k * CFG.dt
        for e in range(E):
            foot = _hand_foot_xy(b[e], np.asarray(traj.footholds[e]), t)
            for c in range(2):
                idx = ((k - CFG.ee_node_start) * E + e) * 2 + c
                val = foot[c] - xs[k, c]
                ub = hip[e, c] + half[c]
                lb = hip[e, c] - half[c]
                np.testing.assert_allclose(
                    Gu_h[base_ub + idx], val - ub, atol=1e-7,
                    err_msg=f"EE-box ub row (k={k},e={e},c={c})")
                np.testing.assert_allclose(
                    Gu_h[base_lb + idx], lb - val, atol=1e-7,
                    err_msg=f"EE-box lb row (k={k},e={e},c={c})")
                checked += 2
    assert checked == 2 * n_box


def test_raibert_rows_match_hand_heuristic():
    """Raibert rows realize foot_xy(td_j) - com_xy(node_j) -
    kappa (h_xy(node_j) - h_des) = hip_raw with kappa = vel_gain T_st/(2m)
    (AddRaibertHeuristic, mpc_single_rigid_body.cpp:939-1017 — the
    reference ships the velocity coefficient as literal 0.00; here the
    per-axis gains and the DESIRED-momentum tracking term are exercised
    with nonzero values)."""
    cfg_r = MPCConfig(raibert=True,
                      raibert_vel_gain=(1.8, 1.2)).validate()
    traj = default_trajectory(cfg_r, gait.make_trot(cfg_r), X0,
                              FEET0[:, :2])
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    traj = Trajectory(
        x_man=traj.x_man,
        f_nodes=20.0 * jax.random.normal(k1, traj.f_nodes.shape,
                                         jnp.float64),
        footholds=traj.footholds + 0.03 * jax.random.normal(
            k2, traj.footholds.shape, jnp.float64),
        sched=traj.sched)
    # desired state WITH momentum: the kappa * h_des term must be nonzero
    x_des_man = X0.at[3].set(0.8 * float(PARAMS.mass))
    x_des = srb.manifold_to_tangent(x_des_man)
    t0 = 0.0
    qp = qp_mod.assemble(cfg_r, PARAMS, traj, X0, jnp.asarray(t0), FEET0,
                         x_des, jnp.asarray(cfg_r.ee_box_size, jnp.float64))
    u = ravel_u(traj.f_nodes, traj.footholds)
    Au_b = np.asarray(qp.A @ u - qp.b)
    xs = np.asarray(qp_mod.recover_states(qp, u))

    E, N, dt = cfg_r.num_ee, cfg_r.num_nodes, cfg_r.dt
    b = np.asarray(traj.sched.bounds)
    mass = float(PARAMS.mass)
    hip_raw = np.asarray(PARAMS.hip_offset_raw)
    h_des = np.asarray(x_des)[3:5]
    vg = np.array([1.8, 1.2])

    # replicate the reference's row-activity rules: the TD pin claims the
    # gated next touchdown; zero-length previous swings are not landings
    td_t = np.array([b[e, 0::2][b[e, 0::2] > t0][0] for e in range(E)])
    swing = []
    for e in range(E):
        sw_slots = b[e, 1::2]
        p = np.searchsorted(b[e, 1:], t0, side="right")
        p = min(p, b.shape[1] - 2)
        sp = p if p % 2 == 1 else min(p + 1, b.shape[1] - 2)
        swing.append(b[e, sp + 1] - b[e, sp])
    td_pin_active = (td_t - t0) < cfg_r.td_fraction * np.asarray(swing)

    NT = b[:, 0::2].shape[1]
    checked_active = 0
    checked_masked = 0
    for e in range(E):
        td_all = b[e, 0::2]
        t_st = b[e, 1::2] - b[e, 0:-1:2]
        t_st = np.concatenate([t_st, [1.0]])[:NT]
        prv_sw = td_all - np.concatenate([[td_all[0] - 1.0],
                                          b[e, 1::2][:NT - 1]])
        for j in range(NT):
            node = int(np.clip(np.floor((td_all[j] - t0) / dt
                                        - 1e-2 / dt), 0, N))
            kap = vg * t_st[j] / (2.0 * mass)
            active = (td_all[j] > t0 and td_all[j] < t0 + N * dt
                      and prv_sw[j] > 1e-4
                      and not (td_pin_active[e]
                               and abs(td_all[j] - td_t[e]) < 1e-9))
            for c in range(2):
                row = 4 * E + (e * NT + j) * 2 + c
                if not active:
                    np.testing.assert_allclose(Au_b[row], 0.0, atol=1e-12)
                    checked_masked += 1
                    continue
                foot = _hand_foot_xy(b[e], np.asarray(traj.footholds[e]),
                                     td_all[j])
                want = (foot[c] - xs[node, c]
                        - kap[c] * (xs[node, 3 + c] - h_des[c])
                        - hip_raw[e, c])
                np.testing.assert_allclose(
                    Au_b[row], want, atol=1e-7,
                    err_msg=f"Raibert row (e={e},j={j},c={c})")
                checked_active += 1
    assert checked_active >= 2 * E, "too few active Raibert rows"
    assert checked_masked >= 2, "masking rule never exercised"


# ---------------------------------------------------------------------------
# hand-derived spline derivatives w.r.t. contact times (the reference's
# trickiest code: EndEffectorSplines::ComputePartialWrtTime,
# end_effector_splines.cpp:513-650, with its direct lower/upper-node
# dependence and indirect interior-node rescaling dtdth/dDTdth split).
# Here the same split is derived BY HAND from the Hermite closed form and
# checked against jax.grad of ops/spline.py.
# ---------------------------------------------------------------------------

def _hand_force_dtheta(lo, hi, f_nodes_ee_s, t, F):
    """d force(t) / d (lo, hi) for t inside stance [lo, hi], hand chain
    rule.  Let D = hi-lo, seg = D/F, j = floor((t-lo)/seg) (constant for t
    strictly inside a segment), s = t - lo - j seg.

    Direct dependence: s shifts with the boundary (ds/dlo = -1 + j/F,
    ds/dhi = -j/F).  Indirect dependence: every interior node's time
    rescales through seg (dseg/dlo = -1/F, dseg/dhi = +1/F) — the
    reference's dtdth/dDTdth terms.  V(s, seg) = x0 + d0 s + a2(seg) s^2 +
    a3(seg) s^3 with a2 = -3(x0-x1)/seg^2 - (2 d0 + d1)/seg,
    a3 = 2(x0-x1)/seg^3 + (d0+d1)/seg^2 (ValueAt's coefficients,
    end_effector_splines.cpp:169-199)."""
    D = hi - lo
    seg = D / F
    j = min(int((t - lo) // seg), F - 1)
    s = t - lo - j * seg

    def node(g):
        if g == 0 or g == F:
            return np.zeros(3), np.zeros(3)
        return (np.asarray(f_nodes_ee_s[g - 1, :, 0]),
                FORCE_MULT * np.asarray(f_nodes_ee_s[g - 1, :, 1]))

    x0, d0 = node(j)
    x1, d1 = node(j + 1)
    dx = x0 - x1
    a2 = -3 * dx / seg**2 - (2 * d0 + d1) / seg
    a3 = 2 * dx / seg**3 + (d0 + d1) / seg**2
    dV_ds = d0 + 2 * a2 * s + 3 * a3 * s * s
    da2_dseg = 6 * dx / seg**3 + (2 * d0 + d1) / seg**2
    da3_dseg = -6 * dx / seg**4 - 2 * (d0 + d1) / seg**3
    dV_dseg = da2_dseg * s * s + da3_dseg * s**3

    ds_dlo = -1.0 + j / F
    ds_dhi = -j / F
    dseg_dlo = -1.0 / F
    dseg_dhi = 1.0 / F
    dV_dlo = dV_ds * ds_dlo + dV_dseg * dseg_dlo
    dV_dhi = dV_ds * ds_dhi + dV_dseg * dseg_dhi
    return dV_dlo, dV_dhi


def test_force_spline_dtheta_matches_hand_boundary_terms():
    """jax.grad of force_value w.r.t. the stance's own (touchdown, liftoff)
    boundaries equals the hand chain-rule derivative, and is ZERO on every
    other boundary (the reference's node-dependence locality,
    ComputePartialWrtTime's idx checks)."""
    from bilevel_gait_gen_tpu.ops import spline as spline_ops
    traj = _rand_traj(key=8)
    b = np.asarray(traj.sched.bounds, np.float64)
    F = CFG.num_force_polys
    e = 1                                     # EE starting in contact
    fn_e = jnp.asarray(traj.f_nodes[e])

    # sample times: one per segment interior of stance slot 1 (a fully
    # future stance exercised by the window), plus an early / late point
    s_idx = 1
    lo, hi = b[e, 2 * s_idx], b[e, 2 * s_idx + 1]
    seg = (hi - lo) / F
    ts = [lo + (j + 0.37) * seg for j in range(F)] + [lo + 0.05 * seg,
                                                      hi - 0.05 * seg]
    for t in ts:
        for c in range(3):
            g = jax.grad(lambda bb: spline_ops.force_value(
                bb, fn_e, jnp.asarray(t), F)[c])(
                jnp.asarray(b[e]))
            g = np.asarray(g)
            dlo, dhi = _hand_force_dtheta(lo, hi, np.asarray(fn_e[s_idx]),
                                          t, F)
            np.testing.assert_allclose(g[2 * s_idx], dlo[c], rtol=1e-9,
                                       atol=1e-10,
                                       err_msg=f"d/dlo at t={t} c={c}")
            np.testing.assert_allclose(g[2 * s_idx + 1], dhi[c], rtol=1e-9,
                                       atol=1e-10,
                                       err_msg=f"d/dhi at t={t} c={c}")
            mask = np.ones_like(g, bool)
            mask[2 * s_idx:2 * s_idx + 2] = False
            np.testing.assert_allclose(g[mask], 0.0, atol=1e-12,
                                       err_msg="nonlocal boundary leak")


def test_position_spline_dtheta_matches_hand_boundary_terms():
    """Swing xy blend: d foot_xy(t)/d(liftoff hi, next touchdown nxt) by
    hand.  tau = (t-hi)/(nxt-hi), blend = 3 tau^2 - 2 tau^3:
    d blend/d tau = 6 tau (1-tau), d tau/d hi = (t-nxt)/(nxt-hi)^2,
    d tau/d nxt = -(t-hi)/(nxt-hi)^2.  Checks jax.grad of foot_position
    against these and locality on the other boundaries."""
    from bilevel_gait_gen_tpu.ops import spline as spline_ops
    traj = _rand_traj(key=9)
    b = np.asarray(traj.sched.bounds, np.float64)
    e = 1
    fh_e = jnp.asarray(traj.footholds[e])
    fh = np.asarray(fh_e)

    s_idx = 1                                 # swing slot 3: [b[3], b[4])
    hi, nxt = b[e, 2 * s_idx + 1], b[e, 2 * s_idx + 2]
    for frac in (0.13, 0.5, 0.87):
        t = hi + frac * (nxt - hi)
        tau = (t - hi) / (nxt - hi)
        dblend = 6 * tau * (1 - tau)
        dtau_dhi = (t - nxt) / (nxt - hi) ** 2
        dtau_dnxt = -(t - hi) / (nxt - hi) ** 2
        dfh = fh[s_idx + 1] - fh[s_idx]
        for c in range(2):
            g = np.asarray(jax.grad(lambda bb: spline_ops.foot_position(
                bb, fh_e, jnp.asarray(t), CFG.swing_height,
                CFG.foot_offset)[c])(jnp.asarray(b[e])))
            np.testing.assert_allclose(g[2 * s_idx + 1],
                                       dfh[c] * dblend * dtau_dhi,
                                       rtol=1e-9, atol=1e-10)
            np.testing.assert_allclose(g[2 * s_idx + 2],
                                       dfh[c] * dblend * dtau_dnxt,
                                       rtol=1e-9, atol=1e-10)
            mask = np.ones_like(g, bool)
            mask[2 * s_idx + 1:2 * s_idx + 3] = False
            np.testing.assert_allclose(g[mask], 0.0, atol=1e-12)


def test_swing_z_dtheta_matches_hand_boundary_terms():
    """Prescribed swing-z profile (SetSwingPosZ, trajectory.cpp:303-317):
    two Hermite halves with zero end derivatives, half = (nxt-hi)/2,
    s = t-hi (first half).  V(s, half) = off + a2 s^2 + a3 s^3 with
    a2 = -3 (off - hgt)/half^2, a3 = 2 (off - hgt)/half^3; hand chain rule
    d/dhi = -dV/ds - dV/dhalf / 2, d/dnxt = dV/dhalf / 2."""
    from bilevel_gait_gen_tpu.ops import spline as spline_ops
    traj = _rand_traj(key=10)
    b = np.asarray(traj.sched.bounds, np.float64)
    e = 1
    fh_e = jnp.asarray(traj.footholds[e])
    s_idx = 1
    hi, nxt = b[e, 2 * s_idx + 1], b[e, 2 * s_idx + 2]
    half = 0.5 * (nxt - hi)
    off, hgt = CFG.foot_offset, CFG.swing_height

    t = hi + 0.31 * (nxt - hi)                # first half
    s = t - hi
    dx = off - hgt
    a2 = -3 * dx / half**2
    a3 = 2 * dx / half**3
    dV_ds = 2 * a2 * s + 3 * a3 * s * s
    dV_dhalf = (6 * dx / half**3) * s * s + (-6 * dx / half**4) * s**3
    want_dhi = -dV_ds - 0.5 * dV_dhalf
    want_dnxt = 0.5 * dV_dhalf

    g = np.asarray(jax.grad(lambda bb: spline_ops.foot_position(
        bb, fh_e, jnp.asarray(t), hgt, off)[2])(jnp.asarray(b[e])))
    np.testing.assert_allclose(g[2 * s_idx + 1], want_dhi, rtol=1e-9,
                               atol=1e-10)
    np.testing.assert_allclose(g[2 * s_idx + 2], want_dnxt, rtol=1e-9,
                               atol=1e-10)
