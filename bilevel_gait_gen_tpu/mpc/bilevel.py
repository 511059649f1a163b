"""Bilevel gait optimization: gradient through the QP + projected step +
massively-batched line search (L5/L6).

Replaces the reference's entire outer-loop machinery:

* `outer_gradient` = one `jax.grad` of (QP objective o QP solve o QP
  assembly)(theta), via the IFT custom-VJP on the interior-point solver.
  This collapses the reference's ~2k-LoC hand-derived chain
  ComputeDerivativeTerms -> Computedx -> SetupDerivativeCalcs (sparse KKT
  LU) -> CalcDerivativeWrtMats/Vecs -> ComputeParamPartialsClarabel ->
  ModifyQPPartials -> ComputeCostFcnDerivWrtContactTimes
  (mpc/mpc.cpp:1047-1069, mpc/qp/clarabel_interface.cpp:182-612,
  mpc/mpc_single_rigid_body.cpp:642-792, mpc/gait_optimizer.cpp:92-179).

* `contact_time_step` = the projection QP on the contact times
  (GaitOptimizer::OptimizeContactTimes, gait_optimizer.cpp:185-360): linear
  cost = gradient, min-dwell ordering polytope (0.2 s,
  CreatePolytopeConstraint :410-464), past/first boundaries pinned
  (:491-499), infinity-norm trust region (:501-509).  Solved with the same
  dense IPM (tiny problem).

* `line_search` = the alpha-grid search over full MPC solves
  (GaitOptimizer::LineSearch, :671-753).  The reference forks 10 OpenMP
  threads, each deep-copying the whole MPC object; here it is one `vmap`
  over the alpha axis of the jitted solve step — and scales to hundreds of
  lanes x thousands of scenarios under `pjit`.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bilevel_gait_gen_tpu.mpc import qp as qp_mod
from bilevel_gait_gen_tpu.mpc import solver as solver_mod
from bilevel_gait_gen_tpu.mpc.gait import GaitSchedule
from bilevel_gait_gen_tpu.mpc.trajectory import Trajectory
from bilevel_gait_gen_tpu.models.srb import SRBParams
from bilevel_gait_gen_tpu.ops import pdip
from bilevel_gait_gen_tpu.utils.config import MPCConfig
from bilevel_gait_gen_tpu.utils.precision import highest_matmul_precision


@highest_matmul_precision
def outer_gradient(cfg: MPCConfig, params: SRBParams, traj: Trajectory,
                   x0_man: jax.Array, t0: jax.Array, ee_pos0: jax.Array,
                   x_des_tan: jax.Array, ee_box: jax.Array,
                   warm=None) -> jax.Array:
    """dH/dtheta: gradient of the optimal inner-QP objective w.r.t. the
    contact times (theta = sched.bounds, [E, P+1]).

    ``warm``: the RTI's carried QPSolution.  The bounds are unchanged here,
    so the previous production solve of the SAME QP is an excellent warm
    start — the forward solve converges tighter at the same sweep count and
    the Newton-Schulz inverse-tracking cadence (ipm_exact_every) becomes
    safe, exactly as in the warm-started RTI path (the reference likewise
    derives its QP derivatives from the warm-started production solve,
    mpc/mpc.cpp:1047-1056)."""
    opts = (("iters", cfg.ipm_iters), ("tol", cfg.ipm_tol),
            ("exact_every", cfg.ipm_exact_every if warm is not None else 1),
            ("inverse", cfg.ipm_inverse))

    def outer_cost(bounds):
        traj_b = Trajectory(x_man=traj.x_man, f_nodes=traj.f_nodes,
                            footholds=traj.footholds,
                            sched=GaitSchedule(bounds=bounds))
        qp = qp_mod.assemble(cfg, params, traj_b, x0_man, t0, ee_pos0,
                             x_des_tan, ee_box)
        u = pdip.solve_primal(qp.H, qp.q, qp.A, qp.b, qp.G, qp.h, opts,
                              warm)
        # QP objective (the reference's cost H(theta): GetCost of the inner
        # solve, gait_optimizer.cpp:92-179 builds dH/dtheta of exactly this)
        return 0.5 * u @ qp.H @ u + qp.q @ u + qp.cost_const

    return jax.grad(outer_cost)(traj.sched.bounds)


@highest_matmul_precision
def outer_gradient_at(cfg: MPCConfig, params: SRBParams, traj_lin: Trajectory,
                      x0_man: jax.Array, t0: jax.Array, ee_pos0: jax.Array,
                      x_des_tan: jax.Array, ee_box: jax.Array,
                      sol) -> jax.Array:
    """dH/dtheta evaluated AT a captured production solution — no extra
    forward solve.

    ``sol`` is the QPSolution of the RTI that just solved the QP assembled
    from ``traj_lin`` (SolveExt from solve_step).  This is exactly the
    reference's design: the bilevel derivatives are computed from the
    warm-started production solve, not a fresh one (ComputeDerivativeTerms
    consumes the solver's current factorization, mpc/mpc.cpp:1047-1069).
    ``ipm_grad_polish`` extra warm sweeps tighten the point first (the
    reference solves at 1e-15 gap before differentiating,
    a1_configuration.yaml:189-200); at 0 the forward pass is the identity
    on ``sol`` and only the IFT adjoint runs.
    """
    opts = (("iters", cfg.ipm_grad_polish), ("tol", cfg.ipm_tol),
            ("exact_every", 1), ("inverse", cfg.ipm_inverse))

    def outer_cost(bounds):
        traj_b = dataclasses.replace(traj_lin,
                                     sched=GaitSchedule(bounds=bounds))
        qp = qp_mod.assemble(cfg, params, traj_b, x0_man, t0, ee_pos0,
                             x_des_tan, ee_box)
        u = pdip.solve_primal(qp.H, qp.q, qp.A, qp.b, qp.G, qp.h, opts, sol)
        return 0.5 * u @ qp.H @ u + qp.q @ u + qp.cost_const

    return jax.grad(outer_cost)(traj_lin.sched.bounds)


@highest_matmul_precision
def contact_time_step(cfg: MPCConfig, sched: GaitSchedule, grad: jax.Array,
                      t0: jax.Array,
                      trust: jax.Array | float | None = None,
                      Bk: jax.Array | None = None) -> jax.Array:
    """Projected descent step on the contact times.

    Solves  min  g^T d + (1/2) d^T (rho I + Bk) d  s.t. ordering/dwell
    polytope, pinned past boundaries, |d|_inf <= trust — the reference's
    OSQP projection QP (GaitOptimizer::OptimizeContactTimes).  ``Bk`` is
    the damped-BFGS outer curvature (the reference ships this path
    DISABLED, Bk = 0, gait_optimizer.cpp:276,541-561; enable with
    cfg.gait_bfgs).  Returns the step d with the same shape as
    sched.bounds.
    """
    b = sched.bounds                    # [E, P+1]
    E, P1 = b.shape
    n = E * P1
    dtype = b.dtype
    g = grad.reshape(-1)
    # normalize: the step is direction-only (the alpha grid scans
    # magnitude) and unnormalized gradients (|g| ~ 1e3) start the IPM far
    # outside the trust box.  With Bk present, g and Bk are scaled by the
    # SAME factor so the argmin of the quadratic model is unchanged.
    c_scale = jnp.maximum(1.0, jnp.max(jnp.abs(g)))
    g = g / c_scale
    trust = jnp.asarray(cfg.trust_region if trust is None else trust, dtype)

    # pin boundaries at/before t0 (past must not move) AND each EE's FIRST
    # upcoming boundary — the reference's next-touchdown-frozen constraints
    # (gait_optimizer.cpp:491-534).  Without the freeze, accepted steps
    # retime transitions the robot is already executing (a mid-swing leg's
    # touchdown slides under it); measured in the 3 s closed-loop trot this
    # destabilizes at ANY trust radius (z_min 0.02-0.05 vs 0.27 stable),
    # while freezing the imminent boundary restores a stable loop with the
    # optimizer active.
    past = b <= t0
    first_future = jnp.argmin(jnp.where(past, jnp.inf, b), axis=1)
    cols = jnp.arange(P1)
    imminent = (cols[None, :] >= first_future[:, None]) & (
        cols[None, :] < first_future[:, None] + cfg.gait_freeze_boundaries)
    pinned = (past | imminent).reshape(-1)

    rho = jnp.asarray(1.0, dtype)       # small damping makes the LP a QP
    H = rho * jnp.eye(n, dtype=dtype)
    if Bk is not None:
        H = H + Bk / c_scale
    q = jnp.where(pinned, 0.0, g)

    # equalities: d_i = 0 for pinned boundaries
    A = jnp.diag(jnp.where(pinned, 1.0, 0.0).astype(dtype))
    beq = jnp.zeros(n, dtype)

    # dwell polytope per EE: d_i - d_{i+1} <= (b_{i+1} - b_i) - min_dwell
    rows = []
    rhs = []
    for ee in range(E):
        for i in range(P1 - 1):
            r = jnp.zeros(n, dtype).at[ee * P1 + i].set(1.0).at[
                ee * P1 + i + 1].set(-1.0)
            rows.append(r)
            gap = b[ee, i + 1] - b[ee, i]
            # pinned pairs keep ordering only; free pairs need min dwell
            dwell = jnp.where(pinned[ee * P1 + i + 1], 0.0, cfg.min_dwell)
            rhs.append(gap - jnp.minimum(dwell, gap))  # never infeasible
    G_ord = jnp.stack(rows)
    h_ord = jnp.stack(rhs)

    # trust region |d| <= trust
    G_tr = jnp.concatenate([jnp.eye(n, dtype=dtype), -jnp.eye(n, dtype=dtype)])
    h_tr = jnp.full(2 * n, trust, dtype)

    G = jnp.concatenate([G_ord, G_tr])
    h = jnp.concatenate([h_ord, h_tr])

    sol = pdip.solve(H, q, A, beq, G, h, iters=cfg.proj_iters, tol=1e-10)
    # safety clamps (the reference clamps ordering violations after its
    # projection QP too, ConvertQPVecToContactTimes :651-669): trust box,
    # pinned boundaries, and a failed-QP zero step
    d = jnp.clip(sol.x, -trust, trust)
    d = jnp.where(pinned, 0.0, d)
    ok = (sol.pri_res < 1e-2) & jnp.all(jnp.isfinite(d))
    d = jnp.where(ok, d, 0.0)
    # re-impose ordering: moved boundaries must stay monotone
    d2 = d.reshape(E, P1)
    b2 = b + d2
    b2 = jnp.maximum.accumulate(b2, axis=1)
    return b2 - b


class OuterCurvature(NamedTuple):
    """Damped-BFGS curvature of the outer objective H(theta), carried
    across gait ticks (the reference's disabled escalation path,
    gait_optimizer.cpp:541-561 UpdateBk).

    B:     [n, n] curvature approximation (n = E*(P+1) flattened bounds)
    theta: [n] bounds at which `g` was evaluated
    g:     [n] outer gradient at theta
    ok:    a previous (theta, g) pair exists AND the bounds array has not
           been re-indexed (window roll / flight hold) since
    """
    B: jax.Array
    theta: jax.Array
    g: jax.Array
    ok: jax.Array


def init_curvature(cfg: MPCConfig, dtype=jnp.float32) -> OuterCurvature:
    """Neutral curvature carry: B = 0 (pure gradient until pairs accrue)."""
    n = cfg.num_ee * (cfg.num_phase_slots + 1)
    return OuterCurvature(B=jnp.zeros((n, n), dtype),
                          theta=jnp.zeros(n, dtype),
                          g=jnp.zeros(n, dtype),
                          ok=jnp.asarray(False))


def _bfgs_update(B: jax.Array, s: jax.Array, y: jax.Array) -> jax.Array:
    """One Powell-damped BFGS update, B <- B - Bss^TB/s^TBs + yy^T/s^Ty.

    Damping (Powell): if s^Ty < 0.2 s^TBs, blend y toward Bs so the
    update stays positive semidefinite even on nonconvex stretches —
    exactly the reference's damped update (gait_optimizer.cpp:541-561).
    Degenerate pairs (|s| ~ 0 or s^Ty ~ 0 with no curvature yet) leave B
    unchanged.
    """
    sBs = s @ B @ s
    sy = s @ y
    tau = jnp.where(sy < 0.2 * sBs,
                    0.8 * sBs / jnp.maximum(sBs - sy, 1e-12), 1.0)
    y_d = tau * y + (1.0 - tau) * (B @ s)
    sy_d = s @ y_d
    Bs = B @ s
    upd = (B
           - jnp.where(sBs > 1e-12, 1.0, 0.0)
           * jnp.outer(Bs, Bs) / jnp.maximum(sBs, 1e-12)
           + jnp.outer(y_d, y_d) / jnp.maximum(sy_d, 1e-12))
    good = (jnp.sum(s * s) > 1e-12) & (sy_d > 1e-12) \
        & jnp.all(jnp.isfinite(upd))
    return jnp.where(good, upd, B)


class GaitOptResult(NamedTuple):
    state: solver_mod.SolverState
    alpha: jax.Array
    cost: jax.Array
    grad_norm: jax.Array
    # trust-region bookkeeping (gait_optimizer.cpp:199-211,568-579); filled
    # by gait_opt_update, neutral when line_search is called standalone
    cost0: jax.Array = 0.0       # cost of the alpha=0 lane
    trust: jax.Array = 0.0       # updated radius for the next outer step
    accepted: jax.Array = True   # step passed the ratio test
    # stats of the production RTI embedded in gait_opt_update (the update
    # REPLACES one inner solve — reference phase (b) "solve + derivatives",
    # controllers/mpc_controller.cpp:518-573); None from plain line_search
    rti_stats: "solver_mod.SolveStats | None" = None
    # damped-BFGS curvature carry (cfg.gait_bfgs); None when disabled
    curv: "OuterCurvature | None" = None


@highest_matmul_precision
def line_search(cfg: MPCConfig, params: SRBParams,
                state: solver_mod.SolverState, step: jax.Array,
                x0_man: jax.Array, t0: jax.Array, ee_pos0: jax.Array,
                x_des_tan: jax.Array) -> GaitOptResult:
    """Batched alpha-grid line search over full MPC solves.

    alpha grid i/LS for i in 0..LS-1 (reference :694: GetContactTimes(i/LS));
    winner = min cost per decision var among solved candidates (:723-737),
    installed as the new warm start (:741).
    """
    LS = cfg.ls_alphas
    alphas = jnp.arange(LS, dtype=x0_man.dtype) / LS
    # lanes rank candidates and seed the next warm start; the winner is
    # re-solved at full depth on the next RTI, so a reduced sweep count
    # (cfg.ls_ipm_iters) halves the dominant gait-opt cost without changing
    # which step is taken (the trust-region ratio test rejects mis-ranked
    # steps).  0 = full production depth.
    cfg_lane = (dataclasses.replace(cfg, ipm_iters=cfg.ls_ipm_iters)
                if cfg.ls_ipm_iters else cfg)

    def try_alpha(alpha):
        bounds_a = state.traj.sched.bounds + alpha * step
        traj_a = Trajectory(x_man=state.traj.x_man, f_nodes=state.traj.f_nodes,
                            footholds=state.traj.footholds,
                            sched=GaitSchedule(bounds=bounds_a))
        # qp_warm=None: the carried warm start belongs to the theta_0 QP and
        # poisons shifted-theta solves (see _lane_search's cold rationale)
        st_a = solver_mod.SolverState(traj=traj_a, ee_box=state.ee_box,
                                      qp_warm=None)
        st_a, stats = solver_mod.solve_step(cfg_lane, params, st_a, x0_man,
                                            t0, ee_pos0, x_des_tan,
                                            shift_window=False)
        cost = jnp.where(stats.solved, stats.cost, jnp.inf)
        return st_a, cost

    states_a, costs = jax.vmap(try_alpha)(alphas)
    best = jnp.argmin(costs)
    new_state = jax.tree.map(lambda a: a[best], states_a)
    # if nothing solved, keep the original state (reference :732-737)
    any_ok = jnp.isfinite(costs[best])
    new_state = jax.tree.map(
        lambda a, b_: jnp.where(any_ok, a, b_), new_state, state)
    return GaitOptResult(state=new_state, alpha=alphas[best] * any_ok,
                         cost=jnp.where(any_ok, costs[best], jnp.inf),
                         grad_norm=jnp.linalg.norm(step),
                         cost0=costs[0])


def _lane_search(cfg: MPCConfig, params: SRBParams,
                 st1: solver_mod.SolverState, step: jax.Array,
                 x0_man: jax.Array, t0: jax.Array, ee_pos0: jax.Array,
                 x_des_tan: jax.Array, axis_name: str | None = None):
    """Line-search lanes: alpha on the grid {i/(LS-1), i=0..LS-1} — the
    alpha=0 baseline INCLUDED as a lane.  Reference: GaitOptimizer::
    LineSearch forks one full MPC solve per candidate and ranks by its cost,
    with the unchanged contact times one of the candidates
    (gait_optimizer.cpp:671-753, GetContactTimes(0/LS)); here it is one
    vmap.  Running alpha=0 through the identical per-candidate pipeline
    (same linearization trajectory st1.traj, same ee_box, same cold solve
    depth) keeps the ratio test's baseline consistent with the lane
    objectives (ADVICE r3 medium): the embedded RTI's own full-depth
    warm-started objective is assembled around the PRE-update trajectory,
    and using it as cost0 lets the RTI's own improvement masquerade as the
    schedule step's during transients.  Returns (win_alpha, win_obj,
    win_sol, obj0).

    Lanes rank candidates by the CONVERGED inner-QP objective at the
    candidate contact times — the same smooth function H(theta) whose
    gradient drove the step (gait_optimizer.cpp:92-179 differentiates
    exactly this).  Ranking by the post-RTI *nonlinear trajectory* cost is
    structurally biased against every schedule change: the carried
    trajectory is converged for the OLD bounds, so one guarded RTI at new
    bounds sits mid-transient and its cost spikes by orders of magnitude
    regardless of schedule quality (measured: a step that lowers the QP
    objective 1991 -> -1891 shows a 2904 -> 420316 one-RTI transient).
    The winner installs its bounds and its converged solution as the next
    warm start; the trajectory itself is re-converged by the next guarded
    RTIs (merit line search), which also paces the transient.

    Each lane is assemble + a COLD ls_ipm_iters-sweep QP solve — no merit
    scan or trajectory conversion, so lanes are ~40% cheaper than full
    solve_steps.

    Cold, deliberately: the carried warm start is the solution of the
    theta_0 QP, whose slacks/duals are inconsistent with the candidate's
    shifted constraints — the classic IPM stale-warm-start pathology.
    Measured on a converged A1 trot state (f64, |d|_inf = 0.22): at 5
    sweeps the warm-started lane objective is off by 1e3-1e5 and MIS-RANKS
    the candidates (picks alpha 0.25 over the true winner 0.75), while the
    cold Mehrotra start — whose initializer solves the equality-relaxed QP
    — lands within 0.3% of the converged objective at every alpha and
    preserves the full-depth ranking (pinned by
    tests/test_bilevel.py::test_lane_depth_ranks_like_full_depth).
    ls_exact_every: the solver always factorizes exactly on the first two
    (cold) iterations; after that Newton-Schulz inverse tracking keeps the
    ranking (measured: identical alpha pick and objectives within 2% of
    all-exact at every depth 3-5) at GEMM cost instead of
    factorization-latency cost.

    ``axis_name``: when set, the alpha grid is SHARDED over that mesh axis
    (the TPU-native version of the reference's 10 OpenMP threads,
    gait_optimizer.cpp:688): each shard solves its disjoint slice of lanes
    locally and the argmin crosses shards with one tiny all_gather on ICI.
    Call under shard_map with ls_alphas divisible by the axis size; see
    parallel.mesh.alpha_sharded_gait_opt_update.
    """
    LS = cfg.ls_alphas              # total lanes INCLUDING alpha=0
    denom = float(max(LS - 1, 1))
    if axis_name is None:
        alphas = jnp.arange(LS, dtype=x0_man.dtype) / denom
    else:
        n_sh = jax.lax.axis_size(axis_name)
        per = LS // n_sh
        assert per * n_sh == LS, \
            f"ls_alphas={LS} must divide the '{axis_name}' axis ({n_sh})"
        lane0 = jax.lax.axis_index(axis_name) * per
        alphas = (lane0 + jnp.arange(per, dtype=x0_man.dtype)) / denom
    iters = cfg.ls_ipm_iters or cfg.ipm_iters

    def try_alpha(alpha):
        bounds_a = st1.traj.sched.bounds + alpha * step
        traj_a = dataclasses.replace(st1.traj,
                                     sched=GaitSchedule(bounds=bounds_a))
        qp = qp_mod.assemble(cfg, params, traj_a, x0_man, t0, ee_pos0,
                             x_des_tan, st1.ee_box)
        sol = pdip.solve(qp.H, qp.q, qp.A, qp.b, qp.G, qp.h, iters=iters,
                         tol=cfg.ipm_tol, exact_every=cfg.ls_exact_every,
                         inverse=cfg.ipm_inverse)
        obj = 0.5 * sol.x @ qp.H @ sol.x + qp.q @ sol.x + qp.cost_const
        # same solve-quality gate as the RTI (solver.solve_step)
        scale = 1.0 + jnp.maximum(jnp.max(jnp.abs(qp.q)), jnp.abs(obj))
        good = ((sol.gap < 1e-3 * scale) & (sol.pri_res < 1e-3 * scale)
                & jnp.all(jnp.isfinite(sol.x)))
        return jnp.where(good, obj, jnp.inf), sol

    objs, sols = jax.vmap(try_alpha)(alphas)
    if axis_name is not None:
        # cross-shard argmin: gather the per-shard lane results (tiny: a
        # few objectives + one QPSolution each) and reduce locally — XLA
        # lowers the all_gather onto ICI
        objs = jax.lax.all_gather(objs, axis_name).reshape(-1)
        alphas = jax.lax.all_gather(alphas, axis_name).reshape(-1)
        sols = jax.tree.map(
            lambda a: jax.lax.all_gather(a, axis_name).reshape(
                (-1,) + a.shape[1:]), sols)
    best = jnp.argmin(objs)
    best_sol = jax.tree.map(lambda a: a[best], sols)
    # objs[0] is the alpha=0 lane (lane order is preserved through the
    # all_gather: shard 0 holds the lowest lane indices)
    return alphas[best], objs[best], best_sol, objs[0]


@highest_matmul_precision
def gait_opt_update(cfg: MPCConfig, params: SRBParams,
                    state: solver_mod.SolverState, x0_man: jax.Array,
                    t0: jax.Array, ee_pos0: jax.Array,
                    x_des_tan: jax.Array,
                    trust: jax.Array | float | None = None,
                    ls_axis_name: str | None = None,
                    curv: OuterCurvature | None = None) -> GaitOptResult:
    """One full bilevel update, REPLACING one inner RTI: production solve
    (captured) -> IFT gradient at that solution -> projection QP -> paid
    line-search lanes -> trust-region acceptance.

    ``ls_axis_name``: shard the line-search lanes over that mesh axis (see
    _lane_search / parallel.mesh.alpha_sharded_gait_opt_update).

    This is the reference's exact cadence: MPCController::GaitOpt phase (b)
    is "solve + compute bilevel derivatives from THAT solve"
    (controllers/mpc_controller.cpp:518-573, mpc/mpc.cpp:1047-1056) — the
    gradient costs one adjoint KKT solve, not a second forward solve.  Call
    this INSTEAD of solve_step on gait-opt ticks; rti_stats carries the
    embedded solve's stats.

    Acceptance mirrors the reference's predicted-vs-actual cost-reduction
    ratio test with radius adaptation (gait_optimizer.cpp:199-211,355,
    568-579): with Bk = 0 the model reduction of the step alpha*d is
    -alpha*g.d; a step whose actual reduction falls below tr_eta_low of
    that is rejected (the embedded RTI's state is kept — a full-depth
    alpha=0 baseline) and the radius shrinks; strong agreement grows it.

    Pass the returned ``trust`` back in as the next call's ``trust`` to run
    the adaptive loop; omit it for a stateless fixed-radius update.
    """
    dtype = x0_man.dtype
    trust_in = jnp.asarray(cfg.trust_region if trust is None else trust,
                           dtype)

    # ---- phase (b): the production RTI, its QP + solution captured -------
    st1, stats, ext = solver_mod.solve_step(cfg, params, state, x0_man, t0,
                                            ee_pos0, x_des_tan,
                                            return_ext=True)

    # ---- IFT gradient at the captured solution ---------------------------
    g = outer_gradient_at(cfg, params, ext.traj_lin, x0_man, t0, ee_pos0,
                          x_des_tan, state.ee_box, ext.sol)
    # derivative quality gate (the reference only consumes QP derivatives
    # from a successful solve, mpc/mpc.cpp:1047-1056): an unsolved QP or
    # non-finite gradient zeroes the step, which the ratio test rejects
    g = jnp.where(stats.solved & jnp.all(jnp.isfinite(g)), g,
                  jnp.zeros_like(g))

    # ---- damped-BFGS outer curvature (cfg.gait_bfgs, reference's disabled
    # escalation path gait_optimizer.cpp:541-561) --------------------------
    Bk = None
    theta_now = st1.traj.sched.bounds.reshape(-1)
    g_flat = g.reshape(-1)
    if cfg.gait_bfgs and curv is not None:
        # a window roll or flight hold re-indexes/translates the bounds
        # array between ticks, making (theta_now - theta_prev) meaningless;
        # the past boundary theta[0] is pinned by the step QP, so any
        # change there flags a re-index -> drop the stale pair
        E_, P1_ = st1.traj.sched.bounds.shape
        aligned = curv.ok & jnp.all(
            jnp.abs(curv.theta.reshape(E_, P1_)[:, 0]
                    - st1.traj.sched.bounds[:, 0]) < 1e-6)
        s_vec = theta_now - curv.theta
        y_vec = g_flat - curv.g
        # on misalignment the whole carried matrix is in the OLD slot frame
        # (a window roll permutes/translates every boundary, not just the
        # last pair) — reset it to zero rather than keep wrong-frame
        # curvature shaping the projection QP (ADVICE r4 medium)
        B_new = jnp.where(aligned,
                          _bfgs_update(curv.B, s_vec, y_vec),
                          jnp.zeros_like(curv.B))
        Bk = B_new
    # ---- projected step + line-search lanes ------------------------------
    d = contact_time_step(cfg, st1.traj.sched, g, t0, trust=trust_in,
                          Bk=Bk)
    win_alpha, win_obj, win_sol, cost0 = _lane_search(
        cfg, params, st1, d, x0_man, t0, ee_pos0, x_des_tan,
        axis_name=ls_axis_name)
    # cost0 is the alpha=0 LANE's objective — same linearization trajectory
    # (st1.traj), same ee_box, same cold solve depth as every other lane, so
    # the ratio test compares apples to apples (ADVICE r3 medium: using the
    # embedded RTI's pre-update warm-started objective as the baseline lets
    # the RTI's own improvement inflate `actual` during transients, biasing
    # acceptance toward schedule moves that didn't help).  The reference
    # runs its alpha=0 candidate through the identical per-candidate
    # pipeline too (GaitOptimizer::LineSearch, gait_optimizer.cpp:694).

    # ---- ratio test (predicted reduction of the linear model, Bk = 0) ----
    # the projection QP normalizes g to unit inf-norm before stepping; use
    # the same scaling so predicted and actual reductions are comparable.
    # Both cost0 and the lane objectives are converged values of the same
    # smooth H(theta), so predicted-vs-actual is an apples-to-apples
    # Taylor-model test (gait_optimizer.cpp:199-211).
    g_n = g / jnp.maximum(1.0, jnp.max(jnp.abs(g)))
    pred = -win_alpha * jnp.sum(g_n * d)          # > 0 for a descent step
    if Bk is not None:
        # quadratic model: pred = -(a g_n.d + a^2/2 d^T (Bk/c) d)
        c_sc = jnp.maximum(1.0, jnp.max(jnp.abs(g)))
        df = d.reshape(-1)
        pred = pred - 0.5 * win_alpha ** 2 * (df @ Bk @ df) / c_sc
    actual = cost0 - win_obj
    tiny = jnp.asarray(100 * jnp.finfo(dtype).eps, dtype)
    ratio = actual / jnp.maximum(pred, tiny)
    # sanity floor (second baseline): the winner's cold-lane objective must
    # also beat the embedded RTI's CONVERGED objective at the unchanged
    # times.  The cold alpha=0 lane keeps the Taylor ratio test consistent
    # (ADVICE r3), but during transients its 5-sweep objective can sit far
    # above the converged value, letting `actual` overstate the schedule
    # step's worth and accept moves mid-transient (measured on the
    # stretched-trot A/B: mean accepted alpha 0.62 on the first cycle, two
    # of eight scenarios blown up by cycle 5, A/B flipped to a loss).  A
    # step that cannot beat the converged theta_0 objective even with the
    # lanes' optimistic bias is rejected.
    rti_obj = (0.5 * ext.sol.x @ ext.qp.H @ ext.sol.x
               + ext.qp.q @ ext.sol.x + ext.qp.cost_const)
    rti_obj = jnp.where(stats.solved, rti_obj, jnp.inf)
    took_step = (jnp.isfinite(win_obj) & (win_obj < cost0)
                 & (win_obj < rti_obj))
    accepted = took_step & (pred > tiny) & (ratio >= cfg.tr_eta_low)

    # install: the winner's BOUNDS and its converged solution as the next
    # warm start; trajectory variables stay and are re-converged by the
    # next guarded RTIs.  Reject: keep the embedded RTI's state unchanged
    # (the reference's "alpha = 0" outcome).
    bounds_new = jnp.where(accepted,
                           st1.traj.sched.bounds + win_alpha * d,
                           st1.traj.sched.bounds)
    traj_new = dataclasses.replace(st1.traj,
                                   sched=GaitSchedule(bounds=bounds_new))
    # Warm start for the next RTI: KEEP the embedded production solve's
    # full-depth solution even on accepted moves.  The winner's lane
    # solution is a cold reduced-depth iterate of the shifted-theta QP;
    # installing it was measured to destabilize advancing rollouts (mean
    # last-cycle cost +64k vs +29k keeping the RTI warm start on the
    # mistimed-trot rollout A/B) while ranking/acceptance are unchanged on
    # the stretch-grid A/B — the accepted bound move is within the trust
    # radius, so the old-theta solution is the better-converged nearby
    # point for the IPM to re-center from.
    warm_new = st1.qp_warm
    new_state = solver_mod.SolverState(traj=traj_new, ee_box=st1.ee_box,
                                       qp_warm=warm_new)

    grow = accepted & (ratio >= cfg.tr_eta_high)
    trust_new = jnp.where(
        grow, jnp.minimum(trust_in * cfg.tr_grow, cfg.trust_region),
        jnp.where(accepted, trust_in,
                  jnp.maximum(trust_in * cfg.tr_shrink, cfg.tr_min)))
    curv_new = None
    if cfg.gait_bfgs and curv is not None:
        # carry: curvature + THIS tick's evaluation point (theta_now, g) —
        # the next tick's s/y pair spans consecutive gradient evaluations
        curv_new = OuterCurvature(B=Bk, theta=theta_now, g=g_flat,
                                  ok=stats.solved
                                  & jnp.all(jnp.isfinite(g_flat)))
    return GaitOptResult(
        state=new_state,
        alpha=jnp.where(accepted, win_alpha, 0.0),
        cost=jnp.where(accepted, win_obj, cost0),
        grad_norm=jnp.linalg.norm(d), cost0=cost0, trust=trust_new,
        accepted=accepted, rti_stats=stats, curv=curv_new)
