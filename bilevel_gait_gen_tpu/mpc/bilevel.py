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
            ("exact_every", cfg.ipm_exact_every if warm is not None else 1))

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
def contact_time_step(cfg: MPCConfig, sched: GaitSchedule, grad: jax.Array,
                      t0: jax.Array,
                      trust: jax.Array | float | None = None) -> jax.Array:
    """Projected descent step on the contact times.

    Solves  min  g^T d + (rho/2)|d|^2   s.t. ordering/dwell polytope, pinned
    past boundaries, |d|_inf <= trust — the reference's OSQP projection QP
    with Bk = 0 (damped-BFGS path disabled there, gait_optimizer.cpp:276).
    Returns the step d with the same shape as sched.bounds.
    """
    b = sched.bounds                    # [E, P+1]
    E, P1 = b.shape
    n = E * P1
    dtype = b.dtype
    g = grad.reshape(-1)
    # normalize: with Bk = 0 (reference gait_optimizer.cpp:276) the step is
    # direction-only and the alpha grid scans magnitude; unnormalized
    # gradients (|g| ~ 1e3) also start the IPM far outside the trust box
    g = g / jnp.maximum(1.0, jnp.max(jnp.abs(g)))
    trust = jnp.asarray(cfg.trust_region if trust is None else trust, dtype)

    # pin boundaries at/before t0 (the reference pins the first node and the
    # frozen next touchdown, :491-534; past boundaries must not move)
    pinned = (b <= t0).reshape(-1)

    rho = jnp.asarray(1.0, dtype)       # small damping makes the LP a QP
    H = rho * jnp.eye(n, dtype=dtype)
    q = jnp.where(pinned, 0.0, g)

    # equalities: d_i = 0 for pinned boundaries
    A = jnp.diag(jnp.where(pinned, 1.0, 0.0).astype(dtype))
    beq = jnp.zeros(n, dtype)

    # dwell polytope per EE: d_i - d_{i+1} <= (b_{i+1} - b_i) - min_dwell
    D = jnp.zeros((E * P1, n), dtype)
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

    sol = pdip.solve(H, q, A, beq, G, h, iters=20, tol=1e-10)
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
        st_a = solver_mod.SolverState(traj=traj_a, ee_box=state.ee_box,
                                      qp_warm=state.qp_warm)
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


@highest_matmul_precision
def gait_opt_update(cfg: MPCConfig, params: SRBParams,
                    state: solver_mod.SolverState, x0_man: jax.Array,
                    t0: jax.Array, ee_pos0: jax.Array,
                    x_des_tan: jax.Array,
                    trust: jax.Array | float | None = None) -> GaitOptResult:
    """One full bilevel update: gradient -> projection QP -> line search ->
    trust-region acceptance.

    Reference cadence: MPCController::GaitOpt phases (b)+(c)
    (controllers/mpc_controller.cpp:518-573).  Acceptance mirrors the
    reference's predicted-vs-actual cost-reduction ratio test with radius
    adaptation (gait_optimizer.cpp:199-211,355,568-579): with Bk = 0 the
    model reduction of the step alpha*d is -alpha*g.d; a step whose actual
    reduction falls below tr_eta_low of that is rejected (the alpha=0 lane's
    state is kept) and the radius shrinks; strong agreement grows it.

    Pass the returned ``trust`` back in as the next call's ``trust`` to run
    the adaptive loop; omit it for a stateless fixed-radius update.
    """
    dtype = x0_man.dtype
    trust_in = jnp.asarray(cfg.trust_region if trust is None else trust,
                           dtype)
    g = outer_gradient(cfg, params, state.traj, x0_man, t0, ee_pos0,
                       x_des_tan, state.ee_box, warm=state.qp_warm)
    # derivative quality gate (the reference only consumes QP derivatives
    # from a successful solve, mpc/mpc.cpp:1047-1056): a non-finite
    # gradient zeroes the step, which the ratio test then rejects
    g = jnp.where(jnp.all(jnp.isfinite(g)), g, jnp.zeros_like(g))
    d = contact_time_step(cfg, state.traj.sched, g, t0, trust=trust_in)
    res = line_search(cfg, params, state, d, x0_man, t0, ee_pos0, x_des_tan)

    # ---- ratio test (predicted reduction of the linear model, Bk = 0) ----
    # the projection QP normalizes g to unit inf-norm before stepping; use
    # the same scaling so predicted and actual reductions are comparable
    g_n = g / jnp.maximum(1.0, jnp.max(jnp.abs(g)))
    pred = -res.alpha * jnp.sum(g_n * d)          # > 0 for a descent step
    actual = res.cost0 - res.cost                 # argmin => >= 0 if lane0 ok
    tiny = jnp.asarray(100 * jnp.finfo(dtype).eps, dtype)
    ratio = actual / jnp.maximum(pred, tiny)
    took_step = (res.alpha > 0) & jnp.isfinite(res.cost)
    accepted = took_step & (pred > tiny) & (ratio >= cfg.tr_eta_low)

    # reject: keep the gait of the alpha=0 lane (= an ordinary RTI solve at
    # the unchanged contact times) when it solved, else the prior state
    lane0_ok = jnp.isfinite(res.cost0)

    def pick(acc_leaf, rej_leaf):
        return jnp.where(accepted, acc_leaf, rej_leaf)

    # re-run of lane 0 is free: line_search keeps only the argmin state, so
    # rebuild the rejected state as "current bounds, fresh warm start kept"
    rej_state = solver_mod.SolverState(traj=state.traj, ee_box=state.ee_box,
                                       qp_warm=state.qp_warm)
    new_state = jax.tree.map(pick, res.state, rej_state)

    grow = accepted & (ratio >= cfg.tr_eta_high)
    trust_new = jnp.where(
        grow, jnp.minimum(trust_in * cfg.tr_grow, cfg.trust_region),
        jnp.where(accepted, trust_in,
                  jnp.maximum(trust_in * cfg.tr_shrink, cfg.tr_min)))
    return GaitOptResult(
        state=new_state,
        alpha=jnp.where(accepted, res.alpha, 0.0),
        cost=jnp.where(accepted, res.cost,
                       jnp.where(lane0_ok, res.cost0, jnp.inf)),
        grad_norm=res.grad_norm, cost0=res.cost0, trust=trust_new,
        accepted=accepted)
