"""SQP real-time iteration: one jitted MPC solve step (the L4 layer).

Replaces the reference's MPC::GetRealTimeUpdate / MPCSingleRigidBody::Solve
(mpc/mpc.cpp:92-108, mpc/mpc_single_rigid_body.cpp:25-216): shift the
receding window, relinearize around the previous trajectory, assemble the
condensed QP, solve with the interior-point kernel, merit line search on an
L1 penalty of the nonlinear dynamics defect, convex-combination update, and
emit per-solve stats.  Everything is one pure jitted function whose carry is
the warm start — the reference's prev_traj_/prev_qp_sol_/prev_dual_sol_
(mpc/include/mpc.h:267-291) become the SolverState pytree.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bilevel_gait_gen_tpu.mpc import gait as gait_mod
from bilevel_gait_gen_tpu.mpc import qp as qp_mod
from bilevel_gait_gen_tpu.mpc.trajectory import (Trajectory, make_unravel,
                                                 ravel_u)
from bilevel_gait_gen_tpu.models import srb
from bilevel_gait_gen_tpu.models.srb import SRBParams
from bilevel_gait_gen_tpu.ops import pdip
from bilevel_gait_gen_tpu.utils.config import MPCConfig
from bilevel_gait_gen_tpu.utils.precision import highest_matmul_precision


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolverState:
    traj: Trajectory
    ee_box: jax.Array      # [2] adaptive EE box (IncreaseEEBox ladder)
    # optional interior-point warm start carried across control steps
    # (reference prev_qp_sol/prev_dual_sol_, mpc.h:267-291); None = cold
    qp_warm: "pdip.QPSolution | None" = None


def make_state(cfg: MPCConfig, traj: Trajectory, ee_box: jax.Array,
               warm_start: bool = True) -> SolverState:
    """Build a solver state; with warm_start=True the IPM warm start is
    carried across solves (fewer iterations per real-time update)."""
    if not warm_start:
        return SolverState(traj=traj, ee_box=ee_box, qp_warm=None)
    dtype = ee_box.dtype
    n_u = cfg.num_u
    FB, S, E, N = (cfg.samples_per_stance, cfg.num_stance_slots, cfg.num_ee,
                   cfg.num_nodes)
    p = 4 * E
    if cfg.raibert:
        p += E * (cfg.num_phase_slots // 2 + 1) * 2
    m = E * S * FB * 4 + 2 * E * S * FB + 2 * (N + 1 - cfg.ee_node_start) * E * 2
    # gap = inf is the "not yet a real solution" sentinel: the IPM falls
    # back to its Mehrotra cold start until the first solve completes
    neutral = pdip.QPSolution(
        x=jnp.zeros(n_u, dtype), y=jnp.zeros(p, dtype),
        lam=jnp.ones(m, dtype), s=jnp.ones(m, dtype),
        iters=jnp.zeros((), jnp.int32), gap=jnp.full((), jnp.inf, dtype),
        pri_res=jnp.ones((), dtype), dua_res=jnp.ones((), dtype))
    return SolverState(traj=traj, ee_box=ee_box, qp_warm=neutral)


class SolveExt(NamedTuple):
    """Internals of one RTI, captured for the bilevel outer loop: the
    assembled QP, its solution, and the trajectory the QP was linearized
    around (post-window-shift, pre-update).  The reference's GaitOpt phase
    (b) consumes exactly these from the just-completed production solve
    (ComputeDerivativeTerms, mpc/mpc.cpp:1047-1069)."""
    qp: "qp_mod.CondensedQP"
    sol: "pdip.QPSolution"
    traj_lin: Trajectory


class SolveStats(NamedTuple):
    """Per-solve stats table — reference RecordStats/PrintStats columns
    (mpc/mpc.cpp:804-899)."""
    cost: jax.Array
    merit: jax.Array
    defect_l1: jax.Array
    step_norm: jax.Array
    alpha: jax.Array
    qp_gap: jax.Array
    qp_pri: jax.Array
    qp_dua: jax.Array
    solved: jax.Array


def _defect_l1(cfg: MPCConfig, params: SRBParams, xs_tan: jax.Array,
               f_nodes, footholds, bounds, t0) -> jax.Array:
    """L1 norm of the nonlinear Euler-integration defects
    (GetEqualityConstraintValues, mpc/mpc.cpp:764-776)."""
    dt = cfg.dt
    times = t0 + dt * jnp.arange(cfg.num_nodes, dtype=xs_tan.dtype)

    def node_defect(k):
        x_next = srb.discrete_step(params, xs_tan[k], f_nodes, footholds,
                                   bounds, times[k], dt, cfg)
        return xs_tan[k + 1] - x_next

    d = jax.vmap(node_defect)(jnp.arange(cfg.num_nodes))
    return jnp.sum(jnp.abs(d))


def _roll_warm(cfg: MPCConfig, warm: "pdip.QPSolution",
               n_past: jax.Array) -> "pdip.QPSolution":
    """Shift the carried IPM warm start's PRIMAL in lockstep with the
    window roll.

    The warm start's primal is the flat u vector (force slots, footholds).
    When advance_window/roll_spline_vars drop a cycle, a warm start left in
    the OLD slot alignment points every force/foothold entry at the wrong
    stance: measured on a stretched trot, each window-shift tick then
    starts the IPM from a misaligned point whose 10-sweep step passes the
    quality gate but leaves a defect of ~47 (vs ~1e-3 on non-shift ticks)
    — a periodic plan transient at exactly the schedule-dependent shift
    instants (a mechanism behind phase-sensitive closed-loop behavior).
    Rolling the primal removes the transient (worst post-shift cost +5e3
    vs +2e5 unrolled on the same rollout).

    The duals/slacks are deliberately NOT rolled: they were measured to be
    harmless left stale (the IPM re-centers them within a sweep) while a
    slot-rolled (lam, s) with neutral tail fills DESTABILIZED the rollout —
    monotone cost divergence to +5e5 within 20 ticks; partially-neutral
    dual blocks are exactly the "arbitrary (x, 1, 1) interior point" the
    Mehrotra initializer exists to avoid (see ops/pdip.py warm-start
    notes).
    """
    unravel = make_unravel(cfg)
    fn, fh = unravel(warm.x)
    fn2, fh2 = gait_mod.roll_spline_vars(fn, fh, n_past)
    return warm._replace(x=ravel_u(fn2, fh2))


@highest_matmul_precision
def solve_step(cfg: MPCConfig, params: SRBParams, state: SolverState,
               x0_man: jax.Array, t0: jax.Array, ee_pos0: jax.Array,
               x_des_tan: jax.Array,
               shift_window: bool = True, return_ext: bool = False):
    """One real-time iteration.  Pure; jit/vmap over scenarios freely.

    Returns (state, stats), or (state, stats, SolveExt) when
    ``return_ext`` — the captured QP/solution feed the bilevel gradient
    without a second forward solve."""
    traj = state.traj
    unravel = make_unravel(cfg)
    dtype = x0_man.dtype

    # ------- receding-horizon shift (UpdateInitTime, mpc.cpp:1220-1230) ----
    if shift_window:
        n_past = gait_mod.past_cycles(traj.sched, t0)
        sched = gait_mod.advance_window(traj.sched, t0, cfg)
        f_nodes, footholds = gait_mod.roll_spline_vars(
            traj.f_nodes, traj.footholds, n_past)
        traj = Trajectory(x_man=traj.x_man, f_nodes=f_nodes,
                          footholds=footholds, sched=sched)
        if cfg.warm_roll and state.qp_warm is not None:
            # keep the carried warm start slot-aligned with the roll
            state = dataclasses.replace(
                state, qp_warm=_roll_warm(cfg, state.qp_warm, n_past))

    # ------- assemble + solve ---------------------------------------------
    qp = qp_mod.assemble(cfg, params, traj, x0_man, t0, ee_pos0,
                         x_des_tan, state.ee_box)
    # Newton-Schulz inverse tracking is only stable in the warm-started
    # regime (slow W drift); cold-start solves use exact factorizations.
    # The Armijo-reset SENTINEL (gap=inf, see the carry policy below) still
    # runs with the cadence: gating on the traced sentinel would turn the
    # scan's static exact/NS branch into a batched select under vmap,
    # computing the exact Cholesky every NS iteration for the whole batch
    # (ADVICE r4).  The cadenced cold restart's damage is bounded instead:
    # the first two iterations always factorize exactly, a divergent NS
    # refresh falls back to the stale finite inverse (pdip._solve_impl
    # ns_branch) until the next cadence refresh, best-iterate tracking
    # returns the best KKT-merit point, and a failed quality gate chains
    # the iterate into the next solve as a REAL warm start.
    exact_every = cfg.ipm_exact_every if state.qp_warm is not None else 1
    if cfg.qp_backend == "admm":
        # OSQP-style backend (the reference's solver switch, mpc/mpc.cpp:
        # 49,71); warm starts carry the previous QPSolution across steps
        from bilevel_gait_gen_tpu.ops import admm as admm_mod
        sol = admm_mod.solve_onesided(qp.H, qp.q, qp.A, qp.b, qp.G, qp.h,
                                      iters=cfg.admm_iters, tol=cfg.ipm_tol,
                                      warm=state.qp_warm)
    else:
        sol = pdip.solve(qp.H, qp.q, qp.A, qp.b, qp.G, qp.h,
                         iters=cfg.ipm_iters, tol=cfg.ipm_tol,
                         exact_every=exact_every,
                         use_pallas=None if cfg.qp_kernel == "pallas"
                         else False,
                         inverse=cfg.ipm_inverse,
                         warm=state.qp_warm)

    u_prev = ravel_u(traj.f_nodes, traj.footholds)
    xs_prev = jax.vmap(srb.manifold_to_tangent)(traj.x_man)
    u_star = sol.x
    xs_star = qp_mod.recover_states(qp, u_star)
    p_u = u_star - u_prev
    p_x = xs_star - xs_prev

    # ------- merit line search (LineSearch/GetMeritValue, mpc.cpp:730-762) -
    mu = jnp.asarray(cfg.merit_mu, dtype)

    def merit_at(alpha):
        u_a = u_prev + alpha * p_u
        xs_a = xs_prev + alpha * p_x
        fn_a, fh_a = unravel(u_a)
        defect = _defect_l1(cfg, params, xs_a, fn_a, fh_a,
                            traj.sched.bounds, t0)
        cost = qp_mod.cost_value(cfg, xs_a, u_a, x_des_tan)
        return mu * defect + cost, defect, cost

    alphas = 0.5 ** jnp.arange(cfg.max_ls_iters + 1, dtype=dtype)
    merits, defects, costs = jax.vmap(merit_at)(alphas)
    merit0, defect0, cost0 = merit_at(jnp.zeros((), dtype))

    # solve quality gate (reference reuses the previous solution on a
    # primal-infeasible solve, mpc_single_rigid_body.cpp:115-129).  The gap
    # tolerance scales with the OBJECTIVE magnitude, not just max|q|: the
    # force carrier shrinks the linear term to near zero (the plan is
    # almost optimal at u=0) while the f32 IPM's achievable gap floor
    # (~|H| eps |u|^2) is unchanged — a max|q|-only scale then rejects
    # perfectly good solves.
    scale = 1.0 + jnp.maximum(jnp.max(jnp.abs(qp.q)), jnp.abs(cost0))
    good = ((sol.gap < 1e-3 * scale) & (sol.pri_res < 1e-3 * scale)
            & jnp.all(jnp.isfinite(u_star)))

    # directional derivative of the merit (GetMeritGradient, mpc.cpp:790-796)
    grad_cost = qp.H @ u_prev + qp.q  # d cost/du at u_prev (condensed)
    dir_deriv = jnp.dot(grad_cost, p_u) - mu * defect0

    armijo_ok = (merit0 - merits) >= -1e-5 * alphas * dir_deriv
    # largest alpha passing Armijo; NO candidate passing means the QP
    # direction is not a merit descent direction at any tried scale (strong
    # linearization error) — reject the step entirely (alpha = 0).  Falling
    # back to the smallest candidate instead compounds into an uphill creep:
    # measured on a hard pushed/mistimed scenario, 36 consecutive 2^-10
    # fallback steps each INCREASED the merit (cost 2224 -> 6889) while the
    # defect barely moved.  The reference likewise keeps the previous
    # solution when its line search cannot improve the merit
    # (mpc/mpc.cpp:730-747, mpc_single_rigid_body.cpp:115-129).
    first_ok = jnp.argmax(armijo_ok)
    alpha = jnp.where(jnp.any(armijo_ok), alphas[first_ok],
                      jnp.zeros((), dtype))
    alpha = jnp.where(good, alpha, jnp.zeros((), dtype))

    # ------- update (ConvertQPSolToTrajectory, mpc_single_rigid_body.cpp:
    # 275-321: tangent -> manifold with first-order quat normalize) ---------
    # explicit select, not alpha * p: a rejected solve (alpha = 0) must not
    # propagate NaN directions via 0 * NaN
    u_new = jnp.where(good, u_prev + alpha * p_u, u_prev)
    xs_new = jnp.where(good, xs_prev + alpha * p_x, xs_prev)
    fn_new, fh_new = unravel(u_new)
    x_man_new = jax.vmap(srb.tangent_to_manifold)(xs_new)
    traj_new = Trajectory(x_man=x_man_new, f_nodes=fn_new, footholds=fh_new,
                          sched=traj.sched)

    # ------- EE-box relaxation ladder (IncreaseEEBox/DecreaseEEBox,
    # mpc_single_rigid_body.cpp:929-937, box +0.05 on bad, shrink on good) --
    nominal = jnp.asarray(cfg.ee_box_size, dtype)
    ee_box = jnp.where(good,
                       jnp.maximum(nominal, state.ee_box - 0.05),
                       state.ee_box + 0.05)

    # Warm-start carry policy.  Three cases:
    #  * step taken (alpha > 0): carry the solution — the normal RTI warm
    #    start (reference prev_qp_sol, mpc.h:267-291).
    #  * solve FAILED the quality gate (~good): carry it anyway.  The
    #    trajectory is unchanged, so the next solve faces the IDENTICAL
    #    QP and the carried iterate accumulates IPM progress across calls
    #    (two chained 10-sweep solves ~ one 20-sweep solve) — required on
    #    hard cold starts (measured: a perturbed stretched-trot init QP
    #    needs ~2 chained solves before pri_res passes the gate).
    #  * solve PASSED the gate but Armijo rejected every candidate
    #    (good & alpha = 0): RESET to the cold sentinel.  Carrying here
    #    recreates the identical rejection — a warm-start fixed point:
    #    measured, the loop deadlocks at cost +7333 / defect 3.2 for 50
    #    straight solves, while a cold Mehrotra restart of the SAME QP
    #    takes a full alpha = 1 step to cost -1441 and converges (the
    #    re-scaled warm interior point is the attractor, not the QP's
    #    optimum).  The reference cannot hit this: Clarabel has no
    #    cross-solve warm start — every reference solve is cold
    #    (clarabel_interface.cpp SetupQP/Solve).
    new_warm = None
    if state.qp_warm is not None:
        reset = good & (alpha == 0.0)
        new_warm = sol._replace(
            gap=jnp.where(reset, jnp.asarray(jnp.inf, dtype), sol.gap))

    sel = jnp.argmin(jnp.abs(alphas - alpha))
    at0 = alpha == 0.0
    stats = SolveStats(
        cost=jnp.where(at0, cost0, costs[sel]),
        merit=jnp.where(at0, merit0, merits[sel]),
        defect_l1=jnp.where(at0, defect0, defects[sel]),
        step_norm=jnp.linalg.norm(p_u) * alpha, alpha=alpha,
        qp_gap=sol.gap, qp_pri=sol.pri_res, qp_dua=sol.dua_res,
        solved=good)
    new_state = SolverState(traj=traj_new, ee_box=ee_box, qp_warm=new_warm)
    if return_ext:
        return new_state, stats, SolveExt(qp=qp, sol=sol, traj_lin=traj)
    return new_state, stats


@highest_matmul_precision
def create_initial_run(cfg: MPCConfig, params: SRBParams, state: SolverState,
                       x0_man: jax.Array, ee_pos0: jax.Array,
                       x_des_tan: jax.Array,
                       t0: jax.Array | float = 0.0
                       ) -> tuple[SolverState, SolveStats]:
    """Full SQP to convergence before going real-time
    (MPC::CreateInitialRun, mpc/mpc.cpp:78-90: <=10 iterations).

    Every sweep factorizes exactly (ipm_exact_every=1): the init run solves
    COLD-ish QPs where the IPM scaling matrix W swings violently between
    early iterations, and Newton-Schulz inverse tracking from a stale
    inverse diverges there — measured on a perturbed stretched-trot
    scenario, the cadence-tracked init run's first QP fails its quality
    gate outright (pri 5.8e2) while all-exact takes a clean alpha=1 step.
    (solve_step's own static warm/cold exact_every switch cannot catch
    this: the scan carry holds the not-yet-solved SENTINEL, which is
    structurally a warm start.)  The reference's equivalent is running
    Clarabel cold at 1e-15 gap for init (ConfigureForInitialRun,
    clarabel_interface.cpp:165-175)."""
    t0 = jnp.asarray(t0, x0_man.dtype)
    cfg_init = dataclasses.replace(cfg, ipm_exact_every=1)

    def body(st, _):
        st, stats = solve_step(cfg_init, params, st, x0_man, t0, ee_pos0,
                               x_des_tan, shift_window=False)
        return st, stats

    state, stats = jax.lax.scan(body, state, None, length=cfg.init_run_iters)
    return state, jax.tree.map(lambda a: a[-1], stats)
