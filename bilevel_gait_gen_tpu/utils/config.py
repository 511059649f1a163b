"""Configuration dataclasses (YAML-compatible with the reference's keys).

Replaces the reference's utils::ConfigParser + MPCInfo hand-copying
(reference: utils/include/config_parser.h:14-40, mpc/include/mpc.h:39-62,
apps/mpc_demo.cpp:26-60).  One frozen dataclass, loadable from the same YAML
vocabulary, validated, and hashable so it can be passed as a static argument
to jitted functions (all shape-determining fields are Python ints).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    """Static MPC problem configuration.

    Shape-determining fields (all Python ints — static under jit):
      num_nodes:        horizon nodes N (reference `num_nodes`)
      num_ee:           end effectors E
      num_force_polys:  cubic force polynomials per stance phase F
                        (reference Trajectory ctor hardcodes 3,
                         trajectory.cpp:34)
      num_phase_slots:  fixed phase slots P per EE covering the horizon +
                        margin; even slots are stance, odd are swing (our
                        fixed-shape replacement for AddPoly/RemovePoly)
      samples_per_stance: force-sample points per stance for the friction
                        cone / force box (reference FB_PER_FORCE=10,
                        mpc/include/mpc.h:320)
      ee_node_start:    first node with an EE-box constraint (reference
                        EE_NODE_START=4, mpc_single_rigid_body.h:71)
    """
    # Shapes
    num_nodes: int = 20
    num_ee: int = 4
    num_force_polys: int = 3
    num_phase_slots: int = 8
    samples_per_stance: int = 10
    ee_node_start: int = 4

    # Timing
    dt: float = 0.05
    # "euler" (reference production path, rk_integrator.cpp:14-30) or "rk2"
    # (the reference's commented-out second-order discretization, :32-47)
    integrator: str = "euler"

    # Physical / constraint parameters
    friction_coef: float = 0.5
    force_bound: float = 150.0
    swing_height: float = 0.075
    foot_offset: float = 0.015
    ee_box_size: Tuple[float, float] = (0.15, 0.15)

    # Costs (reference a1_configuration.yaml Q_srbd_diag + force_cost;
    # diagonal regularization mpc.cpp:1090-1095)
    q_diag: Tuple[float, ...] = (340.0, 340.0, 4000.0,
                                 0.1, 0.1, 10.0,
                                 3000.0, 3000.0, 3000.0,
                                 1.0, 1.0, 1.0)
    force_cost: float = 0.0
    diag_reg: float = 1e-3

    # Raibert-heuristic touchdown constraint (AddRaibertHeuristic,
    # mpc_single_rigid_body.cpp:939-1017): equality rows pinning each
    # in-horizon touchdown foothold to COM_xy(td node) + hip offset
    # (+ raibert_vel_gain * T_stance/2 * v_com; the reference ships the
    # velocity coefficient literally zeroed, `-0.00*contact_time/...`).
    # Disabled by default, exactly like the reference (the call site is
    # commented out in mpc_single_rigid_body.cpp::AddConstraints).  Note:
    # when enabled together with the TD-pin constraint both can claim the
    # same touchdown; the TD pin wins (the Raibert row is masked off for
    # that EE) to keep the equality block consistent.
    raibert: bool = False
    raibert_vel_gain: float | Tuple[float, float] = 0.0
    # per-axis scale on the hip-offset constant term of the Raibert rows.
    # (1, 1) = the reference's GetCOMToHip neutral point (quadruped: the
    # neutral stance IS under the hips).  A point-foot biped's fore-aft
    # neutral point is the COM itself — Adam's hip sits 8 mm behind it and
    # that constant bias integrates into a steady drift — so the biped
    # config uses (0, 1): feet under the COM in x, hip-width apart in y.
    raibert_hip_scale: Tuple[float, float] = (1.0, 1.0)

    # SQP / merit (reference mu_=5000 mpc.cpp:65; <=10 init iters mpc.cpp:85)
    merit_mu: float = 5000.0
    max_ls_iters: int = 10
    init_run_iters: int = 10
    td_fraction: float = 0.75

    # Interior-point solver
    ipm_iters: int = 25
    ipm_tol: float = 1e-9
    # exact inverse refresh cadence (Newton-Schulz GEMM tracking between);
    # >1 is safe for warm-started RTI problems and much faster on TPU
    ipm_exact_every: int = 3
    # QP inner-iteration backend: "xla" = op stream (production; measured
    # faster both per-solve and on scenario batches — XLA tiles the batched
    # GEMMs across problems on the MXU and overlaps the Cholesky custom
    # calls), "pallas" = fused single-kernel iteration
    # (ops/pallas_kernels.py::ipm_iter — RETIRED as a production path,
    # kept as a documented, tested experiment).  Measured on the driver
    # chip, BENCH_QP_KERNEL A/B: r2 xla 1303 vs pallas 851 inner RTI/s;
    # r3 (batched-grid rerun) xla 1337 vs pallas 864 at batch 128.  The
    # fused kernel re-streams the [m,n] constraint block from HBM per
    # iteration; XLA's pipelined op stream hides that latency better.
    # Non-TPU backends always use XLA.
    qp_kernel: str = "xla"
    # QP algorithm backend: "pdip" = interior point (production; tight gaps
    # for the bilevel derivatives, like the reference's Clarabel choice,
    # a1_configuration.yaml:189-200), "admm" = OSQP-style operator
    # splitting (the reference's solver switch, mpc/mpc.cpp:49,71)
    qp_backend: str = "pdip"
    admm_iters: int = 400
    # exact-refresh SPD inverse: "chol" = XLA Cholesky + two triangular
    # passes (production), "gj" = blocked-panel Gauss-Jordan Pallas kernel
    # with shift + guarded Newton-Schulz deflation (EXPERIMENTAL: measured
    # 5.6 ms vs Cholesky's 10.3 ms at [128, 232, 232] and correct on cold
    # / moderate-W matrices, but WARM-started IPM solves put the
    # Jacobi-scaled spectrum spread past 1e9, where the f32 deflation's
    # initial residual rounds to 1 and the weak subspace never converges —
    # measured: warm RTIs fail their quality gate while the cold first
    # solve passes.  A LAPACK-style right-looking blocked elimination
    # would fix it; parked — see ops/pallas_kernels.py::spd_inverse).
    # Non-TPU backends fall back to "chol" either way.
    ipm_inverse: str = "chol"

    # Gait schedule defaults (reference CreateDefaultSwitchingTimes:
    # 0.3 s phases, trot parity trajectory.cpp:24-28)
    phase_duration: float = 0.3
    # Double-support overlap (seconds): each trot stance is lengthened to
    # phase_duration + double_support and each swing shortened to
    # phase_duration - double_support, with the diagonal pairs offset so the
    # two pairs' stances OVERLAP by this much.  At 0 this reproduces the
    # reference's instantaneous-exchange trot, whose planned total support
    # force passes through zero at every shared phase boundary (spline
    # forces are pinned zero at stance boundaries, end_effector_splines.cpp
    # boundary NoDeriv nodes) — fine under MuJoCo's hard contact, but it
    # excites a hop/sag limit cycle on the on-device penalty ground
    # (docs/DESIGN.md "Penalty-engine closed-loop stability").  >0 keeps at
    # least one pair mid-stance at every boundary instant.
    double_support: float = 0.0
    # Early-touchdown snap window [s] (MPC::AdjustForCurrentContacts,
    # mpc/mpc.cpp:1195-1203: 70 ms): a foot measuring contact while still
    # scheduled for swing gets its touchdown snapped to now if the planned
    # touchdown is within this window.  Push-recovery configs widen it
    # (0.2-0.3 s): braking transients launch flight phases whose landings
    # desync far beyond 70 ms — an unsnapped landed foot is scheduled
    # swing, gets zero force target AND no stationary-contact rows (both
    # gate on scheduled AND measured), so nothing supports the body and it
    # sinks (measured collapse mechanism at 0.45 m/s, PARITY.md r4).
    contact_snap_window: float = 0.07
    # Static-support force carrier (ops/spline.py::carrier_weights): plan
    # forces = carrier(t, bounds) + spline(u).  The carrier distributes m*g
    # over the stance feet with `carrier_ramp`-long weight-transfer ramps,
    # so planned total support is m*g by construction at every instant —
    # the QP optimizes deltas around it.  Off by default (reference
    # semantics: raw zero-boundary splines); the on-device penalty-ground
    # engine enables it (docs/DESIGN.md "Penalty-engine closed-loop
    # stability": the measured root cause is the plan itself dipping below
    # weight support at stance boundaries/starts).
    force_carrier: bool = False
    carrier_ramp: float = 0.1

    # Outer (gait) optimizer
    min_dwell: float = 0.2          # gait_optimizer.cpp:412
    trust_region: float = 1.0       # initial Delta, gait_optimizer.cpp:43
    # per EE, freeze this many UPCOMING phase boundaries (after pinning all
    # past ones) in the projection QP — the reference's next-touchdown-
    # frozen constraints (gait_optimizer.cpp:491-534).  1 = the transition
    # the robot is currently executing toward; larger values give the
    # controller more settled phases before a retimed boundary arrives.
    gait_freeze_boundaries: int = 1
    # alpha-grid size INCLUDING alpha=0, all run as LANES of the same cold
    # reduced-depth pipeline (bilevel._lane_search).  The alpha=0 lane is
    # the ratio test's baseline: solving it through the identical
    # per-candidate pipeline (same linearization trajectory, same ee_box,
    # same depth) keeps predicted-vs-actual consistent — the reference runs
    # its unchanged-times candidate through LineSearch the same way
    # (gait_optimizer.cpp:694).  The reference's LS_SIZE=10
    # (gait_optimizer.h:164) is an OpenMP-thread-count artifact; 4 lanes
    # on {0, 1/3, 2/3, 1} are the PRODUCTION floor: 3 lanes {0, 1/2, 1}
    # keep the plan-level stretch-grid A/B (8/8 wins, reduction 317.6 vs
    # 320.8) and lift the headline ~12%, but in the PHYSICS-loop A/B
    # (scripts/gait_opt_experiment.py) the winning moves sit at alpha
    # 1/3-2/3 — off the coarse grid the accept count collapses 3 -> 1 and
    # the rollout flips to a loss.  Sharded multi-chip configs pin
    # ls_alphas to a multiple of the alpha-axis size (parallel/mesh.py).
    ls_alphas: int = 4
    # IPM sweeps inside the gait-opt line-search lanes (0 = ipm_iters).
    # Lanes run COLD (the carried warm start belongs to the theta_0 QP and
    # mis-ranks shifted-theta candidates — see bilevel._lane_search): the
    # Mehrotra initializer solves the equality-relaxed QP, and 5 cold
    # sweeps land within ~0.3% of the converged objective, preserving the
    # full-depth ranking (tests/test_bilevel.py::
    # test_lane_depth_ranks_like_full_depth, depths 3-5).  (Perf: the lane
    # search is the bulk of the gait-opt update's cost; 4 all-exact sweeps
    # keep the tested ranking at ~80% of the 5-sweep cost — measured
    # batch-128 lane solve 110 ms at 5 sweeps, TPU lane profile r4.)
    ls_ipm_iters: int = 4
    # Newton-Schulz cadence inside the lanes (pdip factorizes the first
    # two sweeps exactly; sweeps after that NS-track the inverse at GEMM
    # cost).  NS-tracked COLD lane solves can misestimate the lane
    # objective on transient states (measured r4: the alpha=0 lane read
    # +219 against a -1500 converged value, and without further guards
    # that bias flipped the stretched-trot A/B to a loss).  Two guards
    # make NS lanes safe again: the rti_obj sanity floor in the ratio
    # test (a winner must also beat the embedded RTI's CONVERGED
    # objective at unchanged times) and full-step Armijo rejection in the
    # following RTIs.  Re-measured with the guards (BENCH r4): identical
    # 8/8 stretch-grid A/B wins and cost reduction vs all-exact, at ~75%
    # of the lane cost.  1 = all exact (the conservative setting).
    ls_exact_every: int = 5
    # Roll the carried IPM warm start's PRIMAL in lockstep with window
    # shifts (solver._roll_warm).  Measured BOTH ways on closed loops
    # (r4): ON removes a periodic plan transient at shift instants on a
    # stretched-trot plan rollout (worst post-shift cost +5e3 vs +2e5)
    # and all MuJoCo loops pass; but the on-device penalty-engine trot
    # FALLS with it (tests/test_sim_engine.py closed loops, bisected to
    # exactly this switch), while every MuJoCo scenario also passes
    # without it.  Default OFF: the engine is the deployment path, and
    # the MuJoCo robustness wins came from the closed-loop levers
    # (contact_snap_window / flight hold / stopping-point target), not
    # the roll.
    warm_roll: bool = False
    # Damped-BFGS curvature on the outer objective H(theta) (the
    # reference's UpdateBk path, SHIPPED DISABLED there —
    # gait_optimizer.cpp:276,541-561).  When on, gait_opt_update threads an
    # OuterCurvature carry (pass res.curv back in as `curv`), the
    # projection QP minimizes the quadratic model g.d + d.Bk.d/2, and the
    # ratio test predicts with the same model.  The carry resets whenever
    # the bounds array is re-indexed (window roll / flight hold).
    gait_bfgs: bool = False
    # extra IPM polish sweeps on the captured RTI solution before the IFT
    # gradient is taken (0 = gradient exactly at the RTI solution, zero
    # forward factorizations — the iters=0 fast path in pdip).  The
    # reference derives its QP derivatives from a 1e-15-gap Clarabel solve
    # (a1_configuration.yaml:189-200), but measured from a full-depth warm
    # RTI solution the IFT gradient's FD error is IDENTICAL at 0/1/2 polish
    # sweeps (max 2.2e-3 rel, tests/test_bilevel.py::
    # test_outer_gradient_at_matches_fd_production_opts), so the polish is
    # pure overhead in the default configuration.
    ipm_grad_polish: int = 0
    # projection-QP iteration budget (contact_time_step); convergence at
    # this budget is pinned by tests/test_bilevel.py
    proj_iters: int = 15
    # trust-region acceptance/adaptation (gait_optimizer.cpp:199-211,568-579):
    # a step is accepted when actual/predicted cost reduction >= tr_eta_low;
    # the radius grows by tr_grow on strong agreement (>= tr_eta_high),
    # shrinks by tr_shrink on rejection, clamped to [tr_min, trust_region]
    tr_eta_low: float = 0.1
    tr_eta_high: float = 0.75
    tr_shrink: float = 0.5
    tr_grow: float = 2.0
    tr_min: float = 0.01

    @property
    def horizon(self) -> float:
        return self.num_nodes * self.dt

    @property
    def num_stance_slots(self) -> int:
        # even slots 0, 2, ... are stance; odd are swing
        return (self.num_phase_slots + 1) // 2

    @property
    def num_footholds(self) -> int:
        # foothold s covers stance slot 2s; the final swing slot needs one
        # more target foothold past the last stance slot
        return self.num_stance_slots + 1

    @property
    def num_force_vars(self) -> int:
        # interior FullDeriv nodes only: (F-1) nodes x 3 coords x (val, dval)
        return self.num_ee * self.num_stance_slots * (self.num_force_polys - 1) * 3 * 2

    @property
    def num_pos_vars(self) -> int:
        return self.num_ee * self.num_footholds * 2

    @property
    def num_u(self) -> int:
        return self.num_force_vars + self.num_pos_vars

    def validate(self) -> "MPCConfig":
        assert self.num_force_polys >= 2
        assert self.num_phase_slots >= 2
        assert self.num_nodes >= 1
        assert len(self.q_diag) == 12
        # the phase slots must cover the horizon with margin for window shifts
        cover = (self.num_phase_slots - 2) * self.phase_duration
        assert cover >= self.horizon, (
            f"num_phase_slots={self.num_phase_slots} x {self.phase_duration}s "
            f"cannot cover horizon {self.horizon}s + shift margin")
        assert 0.0 <= self.double_support < self.phase_duration, (
            "double_support must be in [0, phase_duration)")
        if self.double_support > 0.0:
            assert self.num_phase_slots % 2 == 0, (
                "overlapped trot window extension assumes an even slot count")
        # outer-loop fields: alpha=0 rides the embedded RTI, so at least one
        # PAID lane is required for the grid to scan any magnitude at all
        assert self.ls_alphas >= 2, "ls_alphas counts alpha=0; need >= 2"
        assert self.gait_freeze_boundaries >= 0
        assert self.proj_iters >= 1
        return self


def load_yaml(path: str) -> MPCConfig:
    """Build an MPCConfig from a reference-style YAML file."""
    import yaml
    with open(path) as f:
        raw = yaml.safe_load(f)

    def get(key, default):
        return raw.get(key, default)

    q = raw.get("Q_srbd_diag")
    horizon = get("num_nodes", 20) * get("integrator_dt", 0.05)
    phase = get("phase_duration", 0.3)
    slots = 2 * (int(np.ceil(horizon / (2 * phase))) + 2)
    cfg = MPCConfig(
        num_nodes=get("num_nodes", 20),
        num_ee=get("num_ee", 4),
        dt=get("integrator_dt", 0.05),
        num_force_polys=get("num_polys", 3),
        num_phase_slots=slots,
        friction_coef=get("friction_coef", 0.5),
        force_bound=get("force_bound", 150.0),
        swing_height=get("swing_height", 0.075),
        foot_offset=get("foot_offset", 0.015),
        ee_box_size=tuple(get("ee_box_size", (0.15, 0.15))),
        q_diag=tuple(q) if q is not None else MPCConfig.q_diag,
        force_cost=get("force_cost", 0.0),
        phase_duration=phase,
        double_support=get("double_support", 0.0),
        force_carrier=bool(get("force_carrier", False)),
        carrier_ramp=get("carrier_ramp", 0.1),
        raibert=bool(get("raibert", False)),
        raibert_vel_gain=(tuple(raw["raibert_vel_gain"])
                          if isinstance(raw.get("raibert_vel_gain"),
                                        (list, tuple))
                          else get("raibert_vel_gain", 0.0)),
        raibert_hip_scale=tuple(get("raibert_hip_scale", (1.0, 1.0))),
    )
    return cfg.validate()
