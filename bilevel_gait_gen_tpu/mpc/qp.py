"""QP assembly: costs + constraints + state condensation (the L2 layer).

Replaces the reference's triplet-based sparse assembly (mpc/qp/qp_data.cpp,
MPC::Add*Constraints in mpc/mpc.cpp:166-414 and
mpc/mpc_single_rigid_body.cpp:218-475) with a *condensed dense* build:

* the dynamics equalities x_{k+1} = Ad_k x_k + Bd_k u + Cd_k are eliminated
  by a `lax.scan` (x_k = S_k u + c_k), so the decision vector is only the
  spline inputs u — every remaining matrix is dense and small, and the whole
  build is batched matmuls (MXU) instead of pointer-chasing triplets;
* constraint matrices come from `jax.jacrev` of pure *constraint value
  functions* (linear in u by construction), so the same functions serve
  assembly, merit evaluation, and — composed with theta — the bilevel
  derivative path, replacing ~1.5k LoC of hand-written coefficient code;
* variable-count churn (reference UpdateQPSizes) becomes fixed shapes with
  masked rows.

Constraint catalog mirrors qp_data.h:17-27 {Dynamics (condensed out),
FrictionCone, ForceBox, EndEffectorLocation, TDPosition, EndEffectorStart};
JointForwardKinematics/JointBox belong to the legacy centroidal MPC.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bilevel_gait_gen_tpu.mpc import gait as gait_mod
from bilevel_gait_gen_tpu.mpc.trajectory import Trajectory, make_unravel, ravel_u
from bilevel_gait_gen_tpu.models import srb
from bilevel_gait_gen_tpu.models.srb import SRBParams
from bilevel_gait_gen_tpu.ops import spline
from bilevel_gait_gen_tpu.utils.config import MPCConfig
from bilevel_gait_gen_tpu.utils.precision import highest_matmul_precision


class CondensedQP(NamedTuple):
    H: jax.Array        # [n_u, n_u]
    q: jax.Array        # [n_u]
    A: jax.Array        # [p, n_u] equalities (masked rows are zero)
    b: jax.Array        # [p]
    G: jax.Array        # [m, n_u] inequalities
    h: jax.Array        # [m]
    S: jax.Array        # [N+1, 12, n_u] state condensing maps
    c: jax.Array        # [N+1, 12] state offsets
    cost_const: jax.Array  # constant cost term (for reporting parity)


# TPU matmuls default to bfloat16.  The condensed Hessian H = S^T Q S has
# a natural scale of ~1e8 (foothold -> angular momentum -> orientation
# sensitivities times q-weights ~3e3 over a 1 s horizon), so ~0.5 % bf16
# rounding makes the *equilibrated* H indefinite (measured min-eig -0.015
# vs +5e-10 when assembled accurately) and the IPM's Cholesky NaNs.  The
# solver (ops/pdip.py) already runs at `highest`; the data it consumes
# must be built at `highest` too.
_highest_matmul_precision = highest_matmul_precision


def friction_pyramid(mu: float, dtype) -> jax.Array:
    """4x3 pyramid rows F f <= 0 (reference SetFrictionPyramid,
    mpc/mpc.cpp:153-163): +-fx - mu fz <= 0, +-fy - mu fz <= 0."""
    return jnp.array([
        [1.0, 0.0, -mu],
        [-1.0, 0.0, -mu],
        [0.0, 1.0, -mu],
        [0.0, -1.0, -mu],
    ], dtype=dtype)


def _sample_times(bounds_ee: jax.Array, cfg: MPCConfig) -> jax.Array:
    """[S, FB] force-constraint sample times: i/FB through each stance
    (reference AddFrictionConeConstraints, mpc/mpc.cpp:174-181)."""
    S, FB = cfg.num_stance_slots, cfg.samples_per_stance
    td = bounds_ee[0:2 * S:2]                  # [S] touchdowns
    lo = bounds_ee[1:2 * S + 1:2]              # [S] liftoffs
    frac = jnp.arange(FB, dtype=bounds_ee.dtype) / FB
    return td[:, None] + frac[None, :] * (lo - td)[:, None]


@_highest_matmul_precision
def assemble_ad(cfg: MPCConfig, params: SRBParams, traj: Trajectory,
             x0_man: jax.Array, t0: jax.Array, ee_pos0: jax.Array,
             x_des_tan: jax.Array, ee_box_size: jax.Array) -> CondensedQP:
    """Build the condensed QP around the previous trajectory.

    traj: linearization point (previous solution); x0_man: measured state;
    ee_pos0: [E, 3] measured foot positions (EEStart constraint); x_des_tan:
    tracking target in tangent coords; ee_box_size: [2] (runtime-adjustable
    for the IncreaseEEBox/DecreaseEEBox relaxation ladder).
    """
    N = cfg.num_nodes
    dt = cfg.dt
    dtype = x0_man.dtype
    E = cfg.num_ee
    unravel = make_unravel(cfg)
    u_prev = ravel_u(traj.f_nodes, traj.footholds)
    n_u = u_prev.shape[0]
    bounds = traj.sched.bounds

    xs_tan = jax.vmap(srb.manifold_to_tangent)(traj.x_man)  # [N+1, 12]
    times = t0 + dt * jnp.arange(N + 1, dtype=dtype)

    # ---------------- dynamics linearization + condensing scan -------------
    def lin_at(k):
        x_k = xs_tan[k]
        t_k = times[k]

        def f_xu(x, u):
            fn, fh = unravel(u)
            return srb.dynamics(params, x, fn, fh, bounds, t_k, cfg)

        # reverse mode: 12 VJPs give both A [12,12] and B [12,n_u] — forward
        # mode over the wide input vector would cost n_u JVPs per node
        A, B = jax.jacrev(f_xu, argnums=(0, 1))(x_k, u_prev)
        C = f_xu(x_k, u_prev) - A @ x_k - B @ u_prev
        # Euler discretization (mpc_single_rigid_body.cpp:246-248)
        return jnp.eye(12, dtype=dtype) + dt * A, dt * B, dt * C

    Ad, Bd, Cd = jax.vmap(lin_at)(jnp.arange(N))

    def scan_body(carry, k):
        S_k, c_k = carry
        S_n = Ad[k] @ S_k + Bd[k]
        c_n = Ad[k] @ c_k + Cd[k]
        return (S_n, c_n), (S_n, c_n)

    S0 = jnp.zeros((12, n_u), dtype=dtype)
    c0 = srb.manifold_to_tangent(x0_man)
    (_, _), (S_rest, c_rest) = jax.lax.scan(scan_body, (S0, c0), jnp.arange(N))
    S_stack = jnp.concatenate([S0[None], S_rest], axis=0)   # [N+1, 12, n_u]
    c_stack = jnp.concatenate([c0[None], c_rest], axis=0)   # [N+1, 12]

    # ---------------- cost ------------------------------------------------
    # per-node state weights: Q + reg for k<N, Phi(=Q)+reg at N
    # (AddHessianApproxCost/AddFinalCost/AddDiagonalCost, mpc.cpp:542-567,
    # 1090-1095; demos use Phi = Q, apps/mpc_demo.cpp:98-99)
    qdiag = jnp.asarray(cfg.q_diag, dtype=dtype)
    reg = jnp.asarray(cfg.diag_reg, dtype=dtype)
    Qk = jnp.tile((qdiag + reg)[None, :], (N + 1, 1))       # [N+1, 12]
    wk = jnp.tile((-qdiag * x_des_tan)[None, :], (N + 1, 1))

    # H = sum_k S_k^T diag(Qk) S_k + diag(u cost);  MXU: one big matmul
    SQ = S_stack * Qk[:, :, None]                           # [N+1, 12, n_u]
    Sf = S_stack.reshape((N + 1) * 12, n_u)
    H = (SQ.reshape((N + 1) * 12, n_u).T @ Sf)
    q = jnp.einsum('kiu,ki->u', S_stack, Qk * c_stack + wk)

    u_diag = jnp.concatenate([
        jnp.full(cfg.num_force_vars, cfg.force_cost + cfg.diag_reg, dtype),
        jnp.full(cfg.num_pos_vars, cfg.diag_reg, dtype)])
    H = H + jnp.diag(u_diag)
    cost_const = 0.5 * jnp.sum(Qk * c_stack * c_stack) + jnp.sum(wk * c_stack)

    # ---------------- inequality constraints ------------------------------
    pyr = friction_pyramid(cfg.friction_coef, dtype)
    FB = cfg.samples_per_stance
    S_slots = cfg.num_stance_slots

    def force_rows(u):
        """Friction cone (<=0) and force-box rows at the stance samples.
        The rows constrain the TOTAL planned force (carrier + spline when
        cfg.force_carrier); the carrier is u-independent so it only shifts
        the constant part (v0 -> h)."""
        fn, _ = unravel(u)

        def per_ee(e, b_ee, fn_ee):
            ts = _sample_times(b_ee, cfg)                   # [S, FB]
            f = jax.vmap(jax.vmap(
                lambda t: spline.force_value(b_ee, fn_ee, t,
                                             cfg.num_force_polys)))(ts)
            if cfg.force_carrier:
                carr = jax.vmap(jax.vmap(lambda t: spline.carrier_weights(
                    bounds, t, cfg.carrier_ramp)))(ts)      # [S, FB, E]
                f = f.at[..., 2].add(carr[..., e] * (params.mass * 9.81))
            cone = jnp.einsum('ri,sfi->sfr', pyr, f)        # [S, FB, 4]
            fz = f[..., 2]                                  # [S, FB]
            return cone.reshape(-1), fz.reshape(-1)

        cone, fz = jax.vmap(per_ee)(jnp.arange(E), bounds, fn)
        return cone.reshape(-1), fz.reshape(-1)

    def eebox_rows(u):
        """foot_xy(t_k) - com_xy(t_k) per node/EE/coord (linear in u through
        the condensing map).  Reference AddEELocationConstraints
        (mpc_single_rigid_body.cpp:381-443)."""
        fn, fh = unravel(u)
        ks = jnp.arange(cfg.ee_node_start, N + 1)

        def per_node(k):
            com_xy = S_stack[k, 0:2] @ u + c_stack[k, 0:2]
            feet = spline.foot_positions_all(bounds, fh, times[k],
                                             cfg.swing_height,
                                             cfg.foot_offset)      # [E, 3]
            return (feet[:, :2] - com_xy[None, :]).reshape(-1)     # [E*2]

        return jax.vmap(per_node)(ks).reshape(-1)

    def ineq_vals(u):
        cone, fz = force_rows(u)
        box = eebox_rows(u)
        return jnp.concatenate([cone, fz, box])

    v0 = ineq_vals(jnp.zeros_like(u_prev))
    G_half = jax.jacrev(ineq_vals)(u_prev)

    n_cone = E * S_slots * FB * 4
    n_fz = E * S_slots * FB
    n_box = (N + 1 - cfg.ee_node_start) * E * 2

    hip = params.hip_offset.astype(dtype)                   # [E, 2]
    box_ub = (ee_box_size / 2)[None, None, :] + hip[:, None, :] * 0  # per coord
    # upper/lower per (node, ee, coord): +-box/2 + hip offset
    half_box = jnp.tile((ee_box_size / 2)[None, :], (E, 1)) # [E, 2]
    ub_box = (hip + half_box)                               # [E, 2]
    lb_box = (hip - half_box)
    ub_box_full = jnp.tile(ub_box.reshape(-1), (N + 1 - cfg.ee_node_start,))
    lb_box_full = jnp.tile(lb_box.reshape(-1), (N + 1 - cfg.ee_node_start,))

    # one-sided rows: [cone <= 0] [fz <= bound] [-fz <= 0]
    # [box <= ub] [-box <= -lb]
    G = jnp.concatenate([
        G_half[:n_cone],
        G_half[n_cone:n_cone + n_fz],
        -G_half[n_cone:n_cone + n_fz],
        G_half[n_cone + n_fz:],
        -G_half[n_cone + n_fz:],
    ], axis=0)
    h = jnp.concatenate([
        -v0[:n_cone],
        jnp.full(n_fz, cfg.force_bound, dtype) - v0[n_cone:n_cone + n_fz],
        jnp.zeros(n_fz, dtype) + v0[n_cone:n_cone + n_fz],
        ub_box_full - v0[n_cone + n_fz:],
        -lb_box_full + v0[n_cone + n_fz:],
    ])

    # ---------------- equality constraints --------------------------------
    def eq_vals(u):
        fn, fh = unravel(u)
        # EE start: foot xy at t0 (AddEEStartConstraints, :445-475)
        start = jax.vmap(lambda b_ee, fh_ee: spline.foot_position(
            b_ee, fh_ee, t0, cfg.swing_height, cfg.foot_offset)[:2])(
            bounds, fh).reshape(-1)
        # TD position: foot xy at the next touchdown (AddTDPositionConstraints,
        # :849-887) — row activity handled by masking below
        td_t = jax.vmap(lambda b_ee: gait_mod.next_touchdown_time(b_ee, t0))(
            bounds)
        td = jax.vmap(lambda b_ee, fh_ee, tt: spline.foot_position(
            b_ee, fh_ee, tt, cfg.swing_height, cfg.foot_offset)[:2])(
            bounds, fh, td_t).reshape(-1)
        parts = [start, td]
        if cfg.raibert:
            # Raibert heuristic (AddRaibertHeuristic, :939-1017): per
            # in-horizon touchdown, foot_xy(td) - com_xy(node) -
            # kappa * h_xy(node) with kappa = vel_gain * T_stance / (2 m)
            # (the reference hardcodes vel_gain = 0.00).
            td_all = bounds[:, 0::2]                         # [E, NT]
            nodes = jnp.clip(jnp.floor(
                (td_all - t0) / dt - 1e-2 / dt).astype(jnp.int32), 0, N)
            # stance duration per touchdown; the final touchdown has no
            # liftoff in the window -> reference fallback 1.0 s
            # (mpc_single_rigid_body.cpp:994-999)
            t_st = bounds[:, 1::2] - bounds[:, 0:-1:2]
            t_stance = jnp.concatenate(
                [t_st, jnp.ones_like(t_st[:, :1])],
                axis=-1)[:, :td_all.shape[1]]                # [E, NT]
            # per-axis gain (scalar broadcasts): fore-aft capture and
            # lateral stepping need different feedback on a biped
            vg = jnp.broadcast_to(jnp.asarray(cfg.raibert_vel_gain), (2,))
            kappa = (vg[None, None, :] * t_stance[:, :, None]
                     / (2.0 * params.mass)).astype(dtype)    # [E, NT, 2]

            def per_td(b_ee, fh_ee, tt, node, kap):
                foot = spline.foot_position(b_ee, fh_ee, tt,
                                            cfg.swing_height,
                                            cfg.foot_offset)[:2]
                x_node = S_stack[node] @ u + c_stack[node]
                return foot - x_node[0:2] - kap * x_node[3:5]

            raib = jax.vmap(lambda b_ee, fh_ee, tts, nds, kaps: jax.vmap(
                lambda tt, nd, kp: per_td(b_ee, fh_ee, tt, nd, kp))(
                tts, nds, kaps))(bounds, fh, td_all, nodes, kappa)
            parts.append(raib.reshape(-1))                   # [E*NT*2]
        return jnp.concatenate(parts)

    ev0 = eq_vals(jnp.zeros_like(u_prev))
    A_eq = jax.jacrev(eq_vals)(u_prev)

    # TD rows active only when > td_fraction through the swing
    # (mpc.cpp:1208: next_td - t < td_fraction * swing_time)
    td_t = jax.vmap(lambda b_ee: gait_mod.next_touchdown_time(b_ee, t0))(bounds)
    swing = jax.vmap(lambda b_ee: gait_mod.current_swing_time(b_ee, t0))(bounds)
    td_active = (td_t - t0) < cfg.td_fraction * swing       # [E]
    td_mask = jnp.repeat(td_active, 2)

    # TD target: current trajectory's touchdown position (pin it)
    td_now = jax.vmap(lambda b_ee, fh_ee, tt: spline.foot_position(
        b_ee, fh_ee, tt, cfg.swing_height, cfg.foot_offset)[:2])(
        bounds, traj.footholds, td_t).reshape(-1)

    b_parts = [ee_pos0[:, :2].reshape(-1) - ev0[:2 * E],
               td_now - ev0[2 * E:4 * E]]
    mask_parts = [jnp.ones(2 * E, bool), td_mask]
    if cfg.raibert:
        td_all = bounds[:, 0::2]                             # [E, NT]
        # a "touchdown" after a zero-length swing (chained standing
        # stances) is not a real landing: no Raibert row
        prv_sw = td_all - jnp.concatenate(
            [td_all[:, :1] - 1.0,
             bounds[:, 1::2][:, :td_all.shape[1] - 1]], axis=-1)
        active = ((td_all > t0) & (td_all < t0 + N * dt)
                  & (prv_sw > 1e-4)
                  # TD pin wins over Raibert on the same touchdown
                  & ~(td_active[:, None]
                      & (jnp.abs(td_all - td_t[:, None]) < 1e-9)))
        # raw COM->hip (GetCOMToHip), NOT the margin-widened EE-box center
        hip_r = (params.hip_offset_raw
                 * jnp.asarray(cfg.raibert_hip_scale)[None, :]).astype(dtype)
        # kappa again (eq_vals computes it inside its closure): capture
        # stepping tracks the DESIRED momentum — see the fast path
        t_st_b = bounds[:, 1::2] - bounds[:, 0:-1:2]
        t_stance_b = jnp.concatenate(
            [t_st_b, jnp.ones_like(t_st_b[:, :1])],
            axis=-1)[:, :td_all.shape[1]]
        vg_b = jnp.broadcast_to(jnp.asarray(cfg.raibert_vel_gain), (2,))
        kappa_b = (vg_b[None, None, :] * t_stance_b[:, :, None]
                   / (2.0 * params.mass)).astype(dtype)
        h_des = x_des_tan[3:5].astype(dtype)
        hip_b = (hip_r[:, None, :]
                 - kappa_b * h_des[None, None, :]).reshape(-1)
        b_parts.append(hip_b - ev0[4 * E:])
        mask_parts.append(jnp.repeat(active.reshape(-1), 2))
    b_eq = jnp.concatenate(b_parts)
    mask = jnp.concatenate(mask_parts)
    A_eq = jnp.where(mask[:, None], A_eq, 0.0)
    b_eq = jnp.where(mask, b_eq, 0.0)

    return CondensedQP(H=H, q=q, A=A_eq, b=b_eq, G=G, h=h,
                       S=S_stack, c=c_stack, cost_const=cost_const)


@_highest_matmul_precision
def assemble(cfg: MPCConfig, params: SRBParams, traj: Trajectory,
             x0_man: jax.Array, t0: jax.Array, ee_pos0: jax.Array,
             x_des_tan: jax.Array, ee_box_size: jax.Array,
             node_inertia: jax.Array | None = None) -> CondensedQP:
    """Fast condensed-QP assembly: closed-form dense basis weights.

    Semantically identical to :func:`assemble_ad` (which builds every block
    via autodiff of the pure spline/dynamics functions and is kept as the
    reference implementation for tests), but with the linearization and all
    constraint coefficients expressed as dense masked einsums over the
    spline basis weights — no gathers, no per-row autodiff.  ~4x faster
    assembly on TPU, still differentiable in the contact times.

    node_inertia: optional [N, 3, 3] per-node composite rotational inertia
    (the centroidal variant's configuration-dependent Ir, reference
    MPCCentroidal/CentroidalModel); None = the SRB's constant nominal Ir.
    """
    N = cfg.num_nodes
    dt = cfg.dt
    dtype = x0_man.dtype
    E = cfg.num_ee
    F = cfg.num_force_polys
    S_slots = cfg.num_stance_slots
    K = F - 1
    NF = cfg.num_footholds
    FB = cfg.samples_per_stance
    n_u = cfg.num_u
    nf = cfg.num_force_vars
    bounds = traj.sched.bounds

    xs_tan = jax.vmap(srb.manifold_to_tangent)(traj.x_man)   # [N+1, 12]
    times = t0 + dt * jnp.arange(N + 1, dtype=dtype)

    # ---- spline basis weights at the node times --------------------------
    def weights_at(ts_):
        wf = jax.vmap(lambda t: jax.vmap(
            lambda b: spline.force_weights(b, t, F))(bounds))(ts_)
        wp = jax.vmap(lambda t: jax.vmap(
            lambda b: spline.foothold_weights(b, t))(bounds))(ts_)
        zz = jax.vmap(lambda t: jax.vmap(
            lambda b: spline.foot_z_value(b, t, cfg.swing_height,
                                          cfg.foot_offset))(bounds))(ts_)
        return wf, wp, zz

    wf_n, wp_n, z_n = weights_at(times)  # [N+1,E,S,K,2], [N+1,E,NF], [N+1,E]
    if cfg.integrator == "rk2":
        # midpoint evaluation of the input map (reference's C2 term,
        # GetLinearDynamics :160-163)
        wf_lin, wp_lin, z_lin = weights_at(times + 0.5 * dt)
    else:
        wf_lin, wp_lin, z_lin = wf_n, wp_n, z_n

    # forces / feet along the linearization trajectory (at the lin times)
    f_traj = jnp.einsum('kesnw,esncw->kec', wf_lin, traj.f_nodes)
    if cfg.force_carrier:
        lin_times = times + 0.5 * dt if cfg.integrator == "rk2" else times
        carr_lin = jax.vmap(lambda t: spline.carrier_weights(
            bounds, t, cfg.carrier_ramp))(lin_times)         # [N+1, E]
        f_traj = f_traj.at[..., 2].add(carr_lin * (params.mass * 9.81))
    feet_xy_lin = jnp.einsum('kem,emc->kec', wp_lin, traj.footholds)
    feet = jnp.concatenate([feet_xy_lin, z_lin[..., None]], axis=-1)
    # node-time feet xy for the EE-box constraint rows
    feet_xy = jnp.einsum('kem,emc->kec', wp_n, traj.footholds)

    # ---- closed-form continuous linearization (GetLinearDynamics) --------
    if node_inertia is None:
        Ir_n = jnp.broadcast_to(params.inertia, (N, 3, 3)).astype(dtype)
        Ir_inv_n = jnp.broadcast_to(params.inertia_inv,
                                    (N, 3, 3)).astype(dtype)
    else:
        Ir_n = node_inertia[:N].astype(dtype)
        Ir_inv_n = jnp.linalg.inv(Ir_n)
    m_inv = 1.0 / params.mass
    eye3 = jnp.eye(3, dtype=dtype)

    def skew(v):
        z = jnp.zeros((), dtype)
        return jnp.array([[z, -v[2], v[1]], [v[2], z, -v[0]],
                          [-v[1], v[0], z]])

    def lin_at(k):
        x = xs_tan[k]
        p, h, w = x[0:3], x[3:6], x[9:12]
        Fk = f_traj[k]                                   # [E, 3]
        rk = feet[k]                                     # [E, 3]
        F_tot = jnp.sum(Fk, axis=0)
        Ir = Ir_n[k]
        Ir_inv = Ir_inv_n[k]

        A = jnp.zeros((12, 12), dtype)
        A = A.at[0:3, 3:6].set(m_inv * eye3)
        A = A.at[6:9, 9:12].set(Ir_inv)
        A = A.at[9:12, 9:12].set(skew(Ir @ w) - skew(w) @ Ir)
        A = A.at[9:12, 0:3].set(skew(F_tot))

        # B force block: dhdot/df = I * w;  dwdot/df = skew(r - p) * w
        skews_r = jax.vmap(lambda r: skew(r - p))(rk)    # [E, 3, 3]
        Bf_mom = jnp.einsum('cd,esnw->cesndw', eye3, wf_n[k])
        Bf_ang = jnp.einsum('ecd,esnw->cesndw', skews_r, wf_n[k])
        Bf = jnp.zeros((12, E, S_slots, K, 3, 2), dtype)
        Bf = Bf.at[3:6].set(Bf_mom)
        Bf = Bf.at[9:12].set(Bf_ang)

        # B foothold block: dwdot/dr_xy = -skew(f) (xy cols) * w_p
        skews_f = jax.vmap(skew)(Fk)                     # [E, 3, 3]
        Bp_ang = jnp.einsum('ecd,em->cemd', -skews_f[:, :, 0:2], wp_n[k])
        Bp = jnp.zeros((12, E, NF, 2), dtype)
        Bp = Bp.at[9:12].set(Bp_ang)

        B = jnp.concatenate([Bf.reshape(12, nf),
                             Bp.reshape(12, n_u - nf)], axis=1)

        # xdot at the linearization point
        wdot = (-jnp.cross(w, Ir @ w)
                + jnp.sum(jnp.cross(rk - p[None, :], Fk), axis=0))
        xdot = jnp.concatenate([
            h * m_inv,
            params.mass * srb.GRAVITY.astype(dtype) + F_tot,
            Ir_inv @ w,
            wdot,
        ])
        C = xdot - A @ x - B @ ravel_u(traj.f_nodes, traj.footholds)
        if cfg.integrator == "rk2":
            # second-order hold: e^{dtA} ~ I + dtA + dt^2 A^2/2
            # (reference DiscretizeLinearDynamics, rk_integrator.cpp:32-47)
            I12 = jnp.eye(12, dtype=dtype)
            Ad_ = I12 + dt * A + 0.5 * dt * dt * (A @ A)
            M2 = dt * I12 + 0.5 * dt * dt * A
            return Ad_, M2 @ B, M2 @ C
        return (jnp.eye(12, dtype=dtype) + dt * A), dt * B, dt * C

    Ad, Bd, Cd = jax.vmap(lin_at)(jnp.arange(N))

    def scan_body(carry, k):
        S_k, c_k = carry
        S_n = Ad[k] @ S_k + Bd[k]
        c_n = Ad[k] @ c_k + Cd[k]
        return (S_n, c_n), (S_n, c_n)

    S0 = jnp.zeros((12, n_u), dtype=dtype)
    c0 = srb.manifold_to_tangent(x0_man)
    (_, _), (S_rest, c_rest) = jax.lax.scan(scan_body, (S0, c0),
                                            jnp.arange(N))
    S_stack = jnp.concatenate([S0[None], S_rest], axis=0)
    c_stack = jnp.concatenate([c0[None], c_rest], axis=0)

    # ---- cost (identical to assemble_ad) ---------------------------------
    qdiag = jnp.asarray(cfg.q_diag, dtype=dtype)
    reg = jnp.asarray(cfg.diag_reg, dtype=dtype)
    Qk = jnp.tile((qdiag + reg)[None, :], (N + 1, 1))
    wk = jnp.tile((-qdiag * x_des_tan)[None, :], (N + 1, 1))
    SQ = S_stack * Qk[:, :, None]
    Sf = S_stack.reshape((N + 1) * 12, n_u)
    H = SQ.reshape((N + 1) * 12, n_u).T @ Sf
    q = jnp.einsum('kiu,ki->u', S_stack, Qk * c_stack + wk)
    u_diag = jnp.concatenate([
        jnp.full(cfg.num_force_vars, cfg.force_cost + cfg.diag_reg, dtype),
        jnp.full(cfg.num_pos_vars, cfg.diag_reg, dtype)])
    H = H + jnp.diag(u_diag)
    cost_const = 0.5 * jnp.sum(Qk * c_stack * c_stack) + jnp.sum(wk * c_stack)

    # ---- inequality rows from sample-time weights ------------------------
    ts = jax.vmap(lambda b: _sample_times(b, cfg))(bounds)   # [E, S, FB]
    wf_s = jax.vmap(jax.vmap(jax.vmap(
        lambda b, t: spline.force_weights(b, t, F),
        in_axes=(None, 0)), in_axes=(None, 0)), in_axes=(0, 0))(bounds, ts)
    # wf_s: [E, S, FB, S, K, 2]
    pyr = friction_pyramid(cfg.friction_coef, dtype)

    # cone rows: row (e, s, f, r) has coefficient pyr[r, c] * wf on EE e's
    # own force vars only — scatter per-EE blocks into the diagonal layout
    idx_e = jnp.arange(E)
    G_cone = jnp.zeros((E, S_slots, FB, 4, E, S_slots, K, 3, 2), dtype)
    cone_full = jnp.einsum('rc,esfnkw->esfrnkcw', pyr, wf_s)
    G_cone = G_cone.at[idx_e, :, :, :, idx_e].set(cone_full)
    G_cone = G_cone.reshape(E * S_slots * FB * 4, nf)
    G_cone = jnp.concatenate(
        [G_cone, jnp.zeros((G_cone.shape[0], n_u - nf), dtype)], axis=1)

    # force-box z rows: coefficient on (e, n, k, z, w)
    G_fz = jnp.zeros((E, S_slots, FB, E, S_slots, K, 3, 2), dtype)
    zsel = jnp.zeros(3, dtype).at[2].set(1.0)
    fz_c = jnp.einsum('esfnkw,c->esfnkcw', wf_s, zsel)
    G_fz = G_fz.at[idx_e, :, :, idx_e].set(fz_c)
    G_fz = G_fz.reshape(E * S_slots * FB, nf)
    G_fz = jnp.concatenate(
        [G_fz, jnp.zeros((G_fz.shape[0], n_u - nf), dtype)], axis=1)

    # EE box rows: foot_xy - com_xy per node >= ee_node_start
    ks = jnp.arange(cfg.ee_node_start, N + 1)
    wp_k = wp_n[ks]                                           # [Nk, E, NF]
    # row (k, e, c): + wp on foothold var (e, m, c), - com_xy_c via S_stack
    Gp_box = jnp.zeros((ks.shape[0], E, 2, E, NF, 2), dtype)
    bw = jnp.einsum('kem,cd->kecmd', wp_k, jnp.eye(2, dtype=dtype))
    Gp_box = Gp_box.at[:, idx_e, :, idx_e].set(bw.transpose(1, 0, 2, 3, 4))
    # advanced-index result has E at the front: [E, Nk, 2, NF, 2] — restore
    Gp_box = Gp_box.reshape(ks.shape[0] * E * 2, E * NF * 2)
    G_box_u = jnp.concatenate(
        [jnp.zeros((Gp_box.shape[0], nf), dtype), Gp_box], axis=1)
    Sxy = S_stack[ks][:, 0:2, :]                              # [Nk, 2, n_u]
    G_com = jnp.einsum('kcu,e->kecu', Sxy, jnp.ones(E, dtype)).reshape(-1, n_u)
    G_box = G_box_u - G_com
    # constant offset: the com part contributes -c_stack_xy per (k, e, c)
    box_off = -jnp.einsum('kc,e->kec', c_stack[ks][:, 0:2],
                          jnp.ones(E, dtype)).reshape(-1)

    hip = params.hip_offset.astype(dtype)
    half_box = jnp.tile((ee_box_size / 2)[None, :], (E, 1))
    ub_box = jnp.tile((hip + half_box).reshape(-1), (ks.shape[0],))
    lb_box = jnp.tile((hip - half_box).reshape(-1), (ks.shape[0],))

    G = jnp.concatenate([G_cone, G_fz, -G_fz, G_box, -G_box], axis=0)
    if cfg.force_carrier:
        # constant carrier offsets: rows constrain carrier + G u
        carr_s = jax.vmap(lambda tt: spline.carrier_weights(
            bounds, tt, cfg.carrier_ramp))(ts.reshape(-1))   # [E*S*FB, E]
        carr_s = (carr_s.reshape(E, S_slots, FB, E)[idx_e, :, :, idx_e]
                  * (params.mass * 9.81))                    # [E, S, FB]
        h_cone = (cfg.friction_coef
                  * jnp.tile(carr_s[..., None], (1, 1, 1, 4)).reshape(-1))
        h_fz_up = cfg.force_bound - carr_s.reshape(-1)
        h_fz_dn = carr_s.reshape(-1)
    else:
        h_cone = jnp.zeros(G_cone.shape[0], dtype)
        h_fz_up = jnp.full(G_fz.shape[0], cfg.force_bound, dtype)
        h_fz_dn = jnp.zeros(G_fz.shape[0], dtype)
    h_vec = jnp.concatenate([
        h_cone,
        h_fz_up,
        h_fz_dn,
        ub_box - box_off,
        -(lb_box - box_off),
    ])

    # ---- equalities ------------------------------------------------------
    # EE start: foot_xy(t0) = measured
    wp_0 = jax.vmap(lambda b: spline.foothold_weights(b, t0))(bounds)  # [E,NF]
    A_start_p = jnp.zeros((E, 2, E, NF, 2), dtype)
    sw = jnp.einsum('em,cd->ecmd', wp_0, jnp.eye(2, dtype=dtype))
    A_start_p = A_start_p.at[idx_e, :, idx_e].set(sw)
    A_start = jnp.concatenate(
        [jnp.zeros((2 * E, nf), dtype), A_start_p.reshape(2 * E, -1)], axis=1)
    b_start = ee_pos0[:, :2].reshape(-1)

    # TD pin: foot_xy(td) = current value, active when > td_fraction through
    td_t = jax.vmap(lambda b: gait_mod.next_touchdown_time(b, t0))(bounds)
    swing = jax.vmap(lambda b: gait_mod.current_swing_time(b, t0))(bounds)
    td_active = (td_t - t0) < cfg.td_fraction * swing
    wp_td = jax.vmap(spline.foothold_weights)(bounds, td_t)   # [E, NF]
    A_td_p = jnp.zeros((E, 2, E, NF, 2), dtype)
    tw = jnp.einsum('em,cd->ecmd', wp_td, jnp.eye(2, dtype=dtype))
    A_td_p = A_td_p.at[idx_e, :, idx_e].set(tw)
    A_td = jnp.concatenate(
        [jnp.zeros((2 * E, nf), dtype), A_td_p.reshape(2 * E, -1)], axis=1)
    b_td = jnp.einsum('em,emc->ec', wp_td, traj.footholds).reshape(-1)
    td_mask = jnp.repeat(td_active, 2)
    A_td = jnp.where(td_mask[:, None], A_td, 0.0)
    b_td = jnp.where(td_mask, b_td, 0.0)

    A_parts, b_parts = [A_start, A_td], [b_start, b_td]
    if cfg.raibert:
        # Raibert heuristic rows (AddRaibertHeuristic, :939-1017):
        # foot_xy(td) - com_xy(node) - kappa h_xy(node) = hip_offset for
        # every touchdown inside the horizon; kappa = vel_gain T_st/(2m)
        # (reference ships the velocity coefficient as literal 0.00)
        td_all = bounds[:, 0::2]                              # [E, NT]
        NT = td_all.shape[1]
        nodes = jnp.clip(jnp.floor(
            (td_all - t0) / dt - 1e-2 / dt).astype(jnp.int32), 0, N)
        t_st = bounds[:, 1::2] - bounds[:, 0:-1:2]
        t_stance = jnp.concatenate(
            [t_st, jnp.ones_like(t_st[:, :1])],
            axis=-1)[:, :NT]                                  # [E, NT]
        vg = jnp.broadcast_to(jnp.asarray(cfg.raibert_vel_gain), (2,))
        kappa = (vg[None, None, :] * t_stance[:, :, None]
                 / (2.0 * params.mass)).astype(dtype)        # [E, NT, 2]
        wp_r = jax.vmap(lambda b, ts_: jax.vmap(
            lambda t: spline.foothold_weights(b, t))(ts_))(bounds, td_all)
        A_r_p = jnp.zeros((E, NT, 2, E, NF, 2), dtype)
        rw = jnp.einsum('ejm,cd->ejcmd', wp_r, jnp.eye(2, dtype=dtype))
        A_r_p = A_r_p.at[idx_e, :, :, idx_e].set(rw)
        A_r_u = jnp.concatenate([
            jnp.zeros((E * NT * 2, nf), dtype),
            A_r_p.reshape(E * NT * 2, E * NF * 2)], axis=1)
        S_nodes = S_stack[nodes]                              # [E, NT, 12, n_u]
        c_nodes = c_stack[nodes]                              # [E, NT, 12]
        A_raib = A_r_u - (S_nodes[:, :, 0:2, :]
                          + kappa[:, :, :, None]
                          * S_nodes[:, :, 3:5, :]).reshape(E * NT * 2, n_u)
        hip_r = (params.hip_offset_raw
                 * jnp.asarray(cfg.raibert_hip_scale)[None, :]).astype(dtype)
        # capture stepping tracks the DESIRED momentum, not zero:
        # foot = com + hip + kappa (h - h_des) — with h_des from the target
        # state, walking commands place feet neutral at the commanded speed
        # instead of fighting it (the biped's whole locomotion authority is
        # foot placement; the reference's AddRaibertHeuristic has the same
        # vel term with its gain shipped as 0.00, :1001-1008)
        h_des = x_des_tan[3:5].astype(dtype)
        b_raib = (hip_r[:, None, :]
                  - kappa * h_des[None, None, :]
                  + c_nodes[:, :, 0:2]
                  + kappa * c_nodes[:, :, 3:5]).reshape(-1)
        prv_sw = td_all - jnp.concatenate(
            [td_all[:, :1] - 1.0,
             bounds[:, 1::2][:, :td_all.shape[1] - 1]], axis=-1)
        active = ((td_all > t0) & (td_all < t0 + N * dt)
                  & (prv_sw > 1e-4)
                  & ~(td_active[:, None]
                      & (jnp.abs(td_all - td_t[:, None]) < 1e-9)))
        mask_r = jnp.repeat(active.reshape(-1), 2)
        A_parts.append(jnp.where(mask_r[:, None], A_raib, 0.0))
        b_parts.append(jnp.where(mask_r, b_raib, 0.0))

    A_eq = jnp.concatenate(A_parts, axis=0)
    b_eq = jnp.concatenate(b_parts)

    return CondensedQP(H=H, q=q, A=A_eq, b=b_eq, G=G, h=h_vec,
                       S=S_stack, c=c_stack, cost_const=cost_const)


@_highest_matmul_precision
def recover_states(qp: CondensedQP, u: jax.Array) -> jax.Array:
    """[N+1, 12] tangent states implied by the QP solution."""
    return jnp.einsum('kiu,u->ki', qp.S, u) + qp.c


def cost_value(cfg: MPCConfig, xs_tan: jax.Array, u: jax.Array,
               x_des_tan: jax.Array) -> jax.Array:
    """Exact QP cost at arbitrary (states, inputs) — used by the merit
    function (reference GetCostValue, mpc.cpp:757-760)."""
    dtype = u.dtype
    qdiag = jnp.asarray(cfg.q_diag, dtype=dtype) + cfg.diag_reg
    w = -jnp.asarray(cfg.q_diag, dtype=dtype) * x_des_tan
    state_cost = (0.5 * jnp.sum(qdiag * xs_tan * xs_tan)
                  + jnp.sum(xs_tan @ w))
    u_diag = jnp.concatenate([
        jnp.full(cfg.num_force_vars, cfg.force_cost + cfg.diag_reg, dtype),
        jnp.full(cfg.num_pos_vars, cfg.diag_reg, dtype)])
    return state_cost + 0.5 * jnp.sum(u_diag * u * u)
