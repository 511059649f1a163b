"""Reusable closed-loop MuJoCo harness: MPC RTIs + whole-body QP torques.

One function, :func:`run_closed_loop`, packages the full control stack
around :class:`~bilevel_gait_gen_tpu.sim.mujoco_bridge.MujocoLoop` so
scripts and tests share one code path (the reference's equivalent loop
lives in apps/mpc_sim_demo.cpp:25-106 + simulation/mujoco_sim/simulator
.cpp:95-190).  It covers the reference demos' whole feature envelope:

* one MPC real-time iteration per ``cfg.dt`` with early-touchdown schedule
  sync (MPC::AdjustForCurrentContacts, mpc/mpc.cpp:1195-1203);
* optional bilevel gait-optimization ticks every ``gait_opt_freq`` RTIs
  (MPCController::MPCUpdate's 3-phase cadence, controllers/
  mpc_controller.cpp:286-399), trust radius carried across ticks;
* walk-to-position goal carrots (the reference's walk-to-position weight
  set, apps/a1_configuration.yaml comments 180-204) with an arrival state
  machine that switches to a standing MPC (the reference's Stand state,
  hardware/include/hardware_robot.h:46-51);
* mid-run velocity pushes (apps/a1_config_distr_rejection.yaml scenario);
* live viewer + real-time pacing passthrough (test/simulation_mpc.cpp).

Reference push-recovery scenario semantics (apps/a1_config_distr_rejection
.yaml): the MuJoCo robot starts with `init_vel` = 0.375 m/s forward base
velocity (line 37) while the MPC's SRB warm start `srb_init` carries an
exaggerated 2.5 kg m/s linear momentum (line 68 — momentum, not velocity:
the SRB state layout is [p, h, quat, w]).  Here the MPC is seeded with the
TRUE measured state — strictly harder than the reference's inflated guess —
and the scenario is parameterized by the actual initial velocity.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bilevel_gait_gen_tpu.control import mpc_controller, wbqp
from bilevel_gait_gen_tpu.models import rbd, srb
from bilevel_gait_gen_tpu.models.rbd import RobotModel
from bilevel_gait_gen_tpu.mpc import bilevel, gait, solver
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.sim.mujoco_bridge import MujocoLoop
from bilevel_gait_gen_tpu.utils.config import MPCConfig


class ClosedLoopResult(NamedTuple):
    qs: np.ndarray          # [T, nq] MuJoCo-logged configurations (our conv)
    vs: np.ndarray          # [T, nv]
    taus: np.ndarray        # [T, nj]
    n_mpc: int
    n_fails: int
    n_gait_accepts: int
    costs: np.ndarray = np.zeros(0)        # per-MPC-tick planning cost
    final_bounds: np.ndarray = np.zeros(0)  # final schedule bounds [E, P+1]
    arrived_t: float = -1.0   # goal-arrival time (standing switch), -1 never
    mpc_ms: float = 0.0       # mean wall ms per MPC tick
    ctrl_ms: float = 0.0      # mean wall ms per control tick
    flight_s: float = 0.0     # total airborne (no-contact) time [s]
    final_state: "solver.SolverState | None" = None  # last MPC state (plan)

    @property
    def z(self) -> np.ndarray:
        return self.qs[:, 2]

    def recovered(self, z_min: float = 0.15,
                  v_end_max: float = 0.25) -> bool:
        """Upright throughout AND the push arrested by the end."""
        v_end = float(np.abs(self.vs[-500:, 0:2]).mean(axis=0).max())
        return bool(self.z.min() > z_min and v_end < v_end_max)


@dataclasses.dataclass(frozen=True)
class GoalCarrot:
    """Walk-to-position carrot (reference a1_configuration.yaml:180-204).

    The commanded target is at most ``radius`` of the remaining goal per
    plan, tapered near arrival so the stop is gentle instead of a
    push-recovery event.  ``vel_carrot`` adds a momentum command for robots
    that walk by foot placement (the Raibert-row biped: a pure position
    carrot leaves capture stepping regulating v -> 0 against the MPC's
    forces and the walk never terminates).
    """
    goal: tuple[float, float]          # (x, y) offset from the start pos
    radius: float = 0.25               # max commanded position step [m]
    lat_cap: float = 0.08              # lateral position-step cap [m]
    vel_carrot: bool = False
    v_walk: float = 0.10               # walking-speed command [m/s]
    v_lat_cap: float = 0.05
    v_deadband: float = 0.10           # march-in-place inside this range
    # integral velocity trim (1/s): closes the systematic foot-placement
    # bias of velocity-carrot walkers — the swing tracking lands feet
    # slightly short, leaving a residual drift that a pure proportional
    # command cannot null (measured on Adam: a -0.10 m/s command still
    # nets +0.03 m/s forward; the trim is what makes station-keeping and
    # net BACKWARD stepping possible).  0 = off.
    ki: float = 0.0
    # per-axis integral cap [m/s]: lateral defaults to ZERO — trimming y
    # destabilizes the roll-coupled lateral stepping cycle (measured on
    # Adam: a y-integral wound the march into a 1.9 m lateral runaway
    # after goal arrival); fore-aft is where the placement bias lives
    # 0.06 chosen over 0.10 + an approach-speed floor: the stronger trim
    # arrives more accurately on one numerics variant but tips the
    # marginal post-arrival march into a runaway on another (measured
    # 16 s A/B with/without the 8-virtual-device flag); 0.06 stays
    # upright under both, at the cost of arrival accuracy varying
    # 0.005-0.143 m
    int_cap: tuple = (0.06, 0.0)
    v_floor: float = 0.0               # optional approach-speed floor
    stand_on_arrival: bool = True
    arrive_err: float = 0.07
    arrive_speed: float = 0.06


def settled_start(model: RobotModel, q_stand: np.ndarray,
                  foot_radius: float = 0.02,
                  penetration: float = 0.0015) -> np.ndarray:
    """Drop the stand config so every foot rests `penetration` into the
    ground plane (a hovering pair destroys standing)."""
    q = np.asarray(q_stand, np.float64).copy()
    feet_z = rbd.ee_positions(model, jnp.asarray(q))[:, 2]
    q[2] -= float(jnp.max(feet_z)) - foot_radius + penetration
    return q


def run_closed_loop(model: RobotModel, cfg: MPCConfig,
                    wb_cfg: "wbqp.WBQPConfig", q0: np.ndarray,
                    v0: np.ndarray, seconds: float,
                    sched: gait.GaitSchedule | None = None,
                    x_des_man: jax.Array | None = None,
                    gait_opt_freq: int = 0,
                    carrot: GoalCarrot | None = None,
                    stand_cfg: MPCConfig | None = None,
                    push: tuple[float, float] | None = None,
                    viewer: bool = False, realtime: bool = False,
                    debug: bool = False, flight_resync: bool = True,
                    flight_dwell: float = 0.0,
                    recede_target: float = 0.0,
                    lowlevel_log: str | None = None,
                    log_decimation: int = 10,
                    dtype=jnp.float32) -> ClosedLoopResult:
    """Run `seconds` of host-MuJoCo physics under the device controller.

    The MPC runs one real-time iteration per `cfg.dt` (reference cadence,
    controllers/mpc_controller.cpp:286-399) with early-touchdown schedule
    sync; optional bilevel gait-opt updates every `gait_opt_freq` RTIs
    (reference gait_opt_freq, e.g. a1_config_distr_rejection.yaml).

    ``carrot``: walk to ``q0 + carrot.goal`` with a tapered receding
    target; on arrival (err/speed gates + all feet planted, sampled at
    control rate — all-support instants are brief in a trot) switch to a
    standing MPC built from ``stand_cfg`` (default: cfg + force carrier).
    ``push``: ``(t_push, dvx)`` adds a forward base-velocity impulse at
    ``t_push`` seconds (reference distr-rejection demo shape).
    ``lowlevel_log``: path for the decimated per-tick q/v/tau/GRF/contact
    stream (QPControl::LogInfo + the hardware layer's decimated files,
    qp_control.h:160-170, hardware_robot.cpp:183-186); every
    ``log_decimation``-th control tick is recorded.
    """
    q0j = jnp.asarray(q0, dtype)
    v0j = jnp.asarray(v0, dtype)
    params = srb.make_srb_params(model, q0j)
    x0 = srb.reconstruct_state(params, q0j, v0j)
    feet0 = rbd.ee_positions(model, q0j).astype(dtype)
    if sched is None:
        sched = gait.make_trot(cfg)
    traj = default_trajectory(cfg, sched, x0, feet0[:, :2])
    state = solver.SolverState(traj=traj,
                               ee_box=jnp.asarray(cfg.ee_box_size, dtype))
    if x_des_man is None:
        # reject the push: nominal pose, ZERO momentum
        x_des_man = x0.at[3:6].set(0.0).at[10:13].set(0.0)
    x_des = srb.manifold_to_tangent(x_des_man)

    init_run = jax.jit(lambda st, x, ee, xd: solver.create_initial_run(
        cfg, params, st, x, ee, xd))
    state, stats = init_run(state, x0, feet0, x_des)
    jax.block_until_ready(stats.cost)

    mpc_step = jax.jit(lambda st, x, t, ee, xd: solver.solve_step(
        cfg, params, st, x, t, ee, xd))
    # cfg.gait_bfgs: thread the damped-BFGS curvature carry through gait
    # ticks (the reference's disabled escalation path, see mpc/bilevel.py)
    gopt = jax.jit(lambda st, x, t, ee, xd, tr, cv: bilevel.gait_opt_update(
        cfg, params, st, x, t, ee, xd, trust=tr, curv=cv))
    ctrl = jax.jit(lambda tr, q, v, t, t0, mc: mpc_controller.control_action(
        model, params, cfg, wb_cfg, tr, q, v, t, t0, mc))

    # --- goal carrot + arrival standing MPC (built lazily on first use) ----
    tgt_xy = None
    # constant COM-to-base xy offset at the start pose: the goal/arrival
    # bookkeeping targets the SRB COM (x0), while MuJoCo logs the BASE
    # LINK q[0:2] — comparing them raw biases the arrival gate by the
    # standing COM offset (ADVICE r4; the old run_mujoco_walk loop carried
    # a com_off_w slot for exactly this).  Yaw stays near zero in these
    # walks, so the body-frame offset is constant in world frame.
    com_off = np.asarray([float(x0[0]) - float(q0[0]),
                          float(x0[1]) - float(q0[1])])
    if carrot is not None:
        tgt_xy = np.asarray([float(x0[0]) + carrot.goal[0],
                             float(x0[1]) + carrot.goal[1]])
        if stand_cfg is None:
            stand_cfg = dataclasses.replace(
                cfg, force_carrier=True, carrier_ramp=0.1).validate()
        init_stand = jax.jit(
            lambda st, x, ee, xd: solver.create_initial_run(
                stand_cfg, params, st, x, ee, xd))
        mpc_step_stand = jax.jit(
            lambda st, x, t, ee, xd: solver.solve_step(
                stand_cfg, params, st, x, t, ee, xd))
        ctrl_stand = jax.jit(
            lambda tr, q, v, t, t0, mc: mpc_controller.control_action(
                model, params, stand_cfg, wb_cfg, tr, q, v, t, t0, mc))

    def clamp_goal(x_srb):
        """Tapered receding carrot toward the goal (see GoalCarrot)."""
        if carrot is None:
            if recede_target > 0.0:
                # stopping-point target for push recovery: command the spot
                # the COM will reach after T more seconds of current drift,
                # x + T v.  With the position weight dominating (q_diag xy
                # 340 vs momentum 0.1) the position row then acts as pure
                # DAMPING (error ∝ -T v): it arrests the push wherever
                # physics allows instead of demanding a backward walk to
                # the original x — measured at 0.45 m/s, the fixed-origin
                # target pulled the half-crouched robot backward through
                # the start at -0.5 m/s (PARITY.md r4).
                v_xy = x_srb[3:5] / float(params.mass)
                step = recede_target * v_xy
                # cap the commanded position error: the braking force scales
                # with it (q_p * err), and an uncapped T*v at higher push
                # speeds saturates the friction cone / launches the hop
                nrm = jnp.linalg.norm(step)
                step = step * (jnp.minimum(nrm, 0.15) / (nrm + 1e-9))
                x_t = x0.at[3:6].set(0.0).at[10:13].set(0.0)
                x_t = x_t.at[0:2].set(x_srb[0:2] + step)
                return srb.manifold_to_tangent(x_t)
            return x_des
        c = carrot
        tgt = jnp.asarray(tgt_xy, dtype)
        d = tgt - x_srb[0:2]
        n = jnp.linalg.norm(d)
        # taper near the goal: approach speed shrinks with remaining
        # distance so the arrival is a gentle stop, not a push-recovery
        # event (the collapse mode is braking from walk speed)
        r_eff = jnp.minimum(c.radius, 0.6 * n)
        step_xy = jnp.where(n > r_eff, d * (r_eff / (n + 1e-9)), d)
        # lateral cap: trot lateral stepping is structurally narrower than
        # fore-aft; uncapped diagonal carrots overshoot in y
        step_xy = step_xy.at[1].set(jnp.clip(step_xy[1], -c.lat_cap,
                                             c.lat_cap))
        x_t = x0.at[3:6].set(0.0).at[10:13].set(0.0)
        x_t = x_t.at[0:2].set(x_srb[0:2] + step_xy)
        if c.vel_carrot:
            # momentum carrot for foot-placement walkers (Raibert rows
            # track target momentum); deadband near the goal: inside it the
            # proportional command is march-in-place and the integral trim
            # holds station (incl. stepping BACKWARD against the placement
            # bias — see GoalCarrot.ki)
            spd = jnp.clip(0.5 * n, c.v_floor, c.v_walk)
            v_des = d * (spd / (n + 1e-9))
            v_des = v_des * (n > c.v_deadband)
            v_des = v_des.at[1].set(jnp.clip(v_des[1], -c.v_lat_cap,
                                             c.v_lat_cap))
            if c.ki > 0.0:
                v_act = x_srb[3:5] / float(params.mass)
                vi = holder["v_int"] + c.ki * cfg.dt * np.asarray(
                    v_des - v_act)
                cap = np.asarray(c.int_cap)
                holder["v_int"] = np.clip(vi, -cap, cap)
                v_des = v_des + jnp.asarray(holder["v_int"], dtype)
            x_t = x_t.at[3:5].set(float(params.mass) * v_des)
        return srb.manifold_to_tangent(x_t)

    loop = MujocoLoop(model, timestep=0.001)
    loop.set_state(np.asarray(q0, np.float64), np.asarray(v0, np.float64))
    import time as _time
    llog = None
    if lowlevel_log is not None:
        from bilevel_gait_gen_tpu.utils import lowlevel_log as llog_mod
        E = model.num_ee
        llog = llog_mod.LowLevelLog(
            lowlevel_log,
            fields=[("t", 1), ("q", model.nq), ("v", model.nv),
                    ("tau", model.num_joints), ("grf", 3 * E),
                    ("contact", E)],
            decimation=log_decimation)
    holder = {"state": state, "t0": 0.0, "n": 0, "fails": 0, "accepts": 0,
              "trust": jnp.asarray(cfg.trust_region, dtype),
              "standing": False, "arrived_t": -1.0, "costs": [],
              "mpc_ms": 0.0, "ctrl_ms": 0.0, "n_ctrl": 0,
              "slip": 0.0, "flight_s": 0.0, "flight_run": 0.0,
              "v_int": np.zeros(2),
              "curv": (bilevel.init_curvature(cfg, dtype)
                       if cfg.gait_bfgs else None)}

    def control_fn(q, v, t):
        qj = jnp.asarray(q, dtype)
        vj = jnp.asarray(v, dtype)
        if t >= holder["t0"] + cfg.dt or t == 0.0:
            tm = _time.perf_counter()
            x_srb = srb.reconstruct_state(params, qj, vj)
            feet = rbd.ee_positions(model, qj)
            mc_now = jnp.asarray(loop.contacts())
            st_in = holder["state"]
            if holder["slip"] > 0.0:
                # flight-phase schedule hold (gait.hold_for_flight): apply
                # the airborne time accrued at control rate since the last
                # MPC tick — the gait clock pauses while no foot can land
                st_in = dataclasses.replace(
                    st_in, traj=dataclasses.replace(
                        st_in.traj, sched=gait.GaitSchedule(
                            bounds=st_in.traj.sched.bounds
                            + dtype(holder["slip"]))))
                holder["slip"] = 0.0
            sched2 = gait.adjust_for_current_contacts(
                st_in.traj.sched, mc_now, jnp.asarray(t, dtype),
                window=cfg.contact_snap_window)
            st_in = dataclasses.replace(
                st_in, traj=dataclasses.replace(st_in.traj, sched=sched2))
            xd = clamp_goal(x_srb)
            if holder["standing"]:
                st, stats = mpc_step_stand(st_in, x_srb,
                                           jnp.asarray(t, dtype), feet, xd)
            elif gait_opt_freq and holder["n"] % gait_opt_freq \
                    == gait_opt_freq - 1:
                # gait_opt_update embeds the production RTI, replacing
                # solve_step on gait ticks (reference phase (b))
                res = gopt(st_in, x_srb, jnp.asarray(t, dtype), feet, xd,
                           holder["trust"], holder["curv"])
                st, stats = res.state, res.rti_stats
                holder["trust"] = res.trust
                holder["curv"] = res.curv
                holder["accepts"] += int(bool(res.accepted))
            else:
                st, stats = mpc_step(st_in, x_srb, jnp.asarray(t, dtype),
                                     feet, xd)
            jax.block_until_ready(st.traj.x_man)
            holder["state"] = st
            if viewer:
                # live plan overlay (Simulator::UpdateVizGeoms): planned
                # COM trajectory, in-window footholds, COM-relative EE
                # boxes (qp.py: foothold in COM_xy + hip +- box/2)
                com0 = np.asarray(st.traj.x_man[0, 0:2])
                hip = np.asarray(params.hip_offset)
                loop.overlay = {
                    "com_traj": np.asarray(st.traj.x_man[:, 0:3]),
                    "footholds": np.asarray(st.traj.footholds).reshape(
                        -1, 2),
                    "ee_box": (com0[None, :] + hip,
                               tuple(np.asarray(st.ee_box).reshape(-1)[:2]
                                     if np.asarray(st.ee_box).size >= 2
                                     else (float(st.ee_box),) * 2)),
                }
            holder["t0"] = t
            holder["n"] += 1
            holder["mpc_ms"] += (_time.perf_counter() - tm) * 1e3
            holder["costs"].append(float(stats.cost))
            if not bool(stats.solved):
                holder["fails"] += 1
            if debug:
                b = np.asarray(st.traj.sched.bounds)
                lens = (b[:, 1:] - b[:, :-1])[
                    (b[:, 1:] > t) & (b[:, :-1] < t + cfg.horizon)]
                mcs = "".join("#" if c else "." for c in np.asarray(mc_now))
                print(f"  t={t:.2f} cost={float(stats.cost):+.0f} "
                      f"defect={float(stats.defect_l1):.2e} "
                      f"alpha={float(stats.alpha):.2f} "
                      f"x={q[0]:+.3f} z={q[2]:.3f} vx={v[0]:+.3f} "
                      f"mc={mcs} fl={holder['flight_s']:.3f} "
                      f"ph=[{lens.min():.3f},{lens.max():.3f}]")
        tm = _time.perf_counter()
        mc = jnp.asarray(loop.contacts())
        if (flight_resync and not holder["standing"]
                and not bool(np.any(np.asarray(mc)))):
            # accrue airborne time at control rate (flight phases last tens
            # of ms — MPC-tick sampling would quantize them to 0 or cfg.dt);
            # applied as a schedule hold at the next MPC tick.
            # `flight_dwell` skips the first N ms of each contiguous
            # flight — needed for BIPEDS, whose support exchanges pass
            # through brief all-airborne instants by construction
            # (measured: accruing them desynced the Adam march into a
            # fall).  Quadruped trots with double-support overlap have no
            # legitimate full-flight instants, and there the dwell filter
            # WEAKENS the hold (measured: the 0.55 m/s push recovery flips
            # to a fall with a 25 ms dwell) — keep it 0.
            holder["flight_run"] += 0.001
            holder["flight_s"] += 0.001
            if holder["flight_run"] > flight_dwell:
                holder["slip"] += 0.001
        else:
            holder["flight_run"] = 0.0
        # arrival state machine at CONTROL rate: once the goal is reached
        # at low speed with all feet planted, switch to a standing MPC
        # (carrier-standing schedule regulates position; joint PD alone has
        # no position feedback and residual momentum rolls before decaying).
        # All-support instants are brief in a trot, so the gate samples at
        # 1 kHz, not at MPC ticks.
        if (carrot is not None and carrot.stand_on_arrival
                and not holder["standing"]):
            err = float(np.hypot(q[0] + com_off[0] - tgt_xy[0],
                                 q[1] + com_off[1] - tgt_xy[1]))
            spd = float(np.linalg.norm(np.asarray(v[0:2])))
            if (err < carrot.arrive_err and spd < carrot.arrive_speed
                    and bool(np.all(np.asarray(mc)))):
                x_srb_a = srb.reconstruct_state(params, qj, vj)
                feet_a = rbd.ee_positions(model, qj)
                sched_s = gait.make_standing(stand_cfg, t0=float(t))
                traj_s = default_trajectory(stand_cfg, sched_s, x_srb_a,
                                            feet_a[:, :2])
                st_s = solver.SolverState(
                    traj=traj_s,
                    ee_box=jnp.asarray(stand_cfg.ee_box_size, dtype))
                st_s, _ = init_stand(st_s, x_srb_a, feet_a,
                                     clamp_goal(x_srb_a))
                holder["state"] = st_s
                holder["t0"] = t
                holder["standing"] = True
                holder["arrived_t"] = t
                # drop flight slip accrued while walking: applying it to
                # the freshly built standing schedule would shift it
                # (slip accrual is gated off while standing, and the
                # application must be too — ADVICE r4)
                holder["slip"] = 0.0
                holder["flight_run"] = 0.0
                if debug:
                    print(f"  arrived (err {err:.3f} m) -> MPC stand "
                          f"at t={t:.2f}")
        ctrl_fn = ctrl_stand if holder["standing"] else ctrl
        tau = ctrl_fn(holder["state"].traj, qj, vj, jnp.asarray(t, dtype),
                      jnp.asarray(holder["t0"], dtype), mc)
        holder["ctrl_ms"] += (_time.perf_counter() - tm) * 1e3
        holder["n_ctrl"] += 1
        tau_np = np.asarray(tau)
        if llog is not None:
            llog.record(t=np.asarray([t]), q=np.asarray(q),
                        v=np.asarray(v), tau=tau_np,
                        grf=loop.contact_forces().reshape(-1),
                        contact=np.asarray(mc, np.float32))
        return tau_np

    n_steps = int(seconds * 1000)
    if push is not None and 0 < push[0] < seconds:
        n1 = int(push[0] * 1000)
        qs1, vs1, taus1 = loop.run(control_fn, n1, control_decimation=1,
                                   viewer=viewer, realtime=realtime)
        loop.mj_data.qvel[0] += push[1]
        qs2, vs2, taus2 = loop.run(
            lambda q, v, t: control_fn(q, v, t + push[0]),
            n_steps - n1, control_decimation=1, viewer=viewer,
            realtime=realtime)
        qs = np.concatenate([qs1, qs2])
        vs = np.concatenate([vs1, vs2])
        taus = np.concatenate([taus1, taus2])
    else:
        qs, vs, taus = loop.run(control_fn, n_steps, control_decimation=1,
                                viewer=viewer, realtime=realtime)
    if llog is not None:
        llog.close()
    return ClosedLoopResult(
        qs=qs, vs=vs, taus=taus, n_mpc=holder["n"],
        n_fails=holder["fails"], n_gait_accepts=holder["accepts"],
        costs=np.asarray(holder["costs"]),
        final_bounds=np.asarray(holder["state"].traj.sched.bounds),
        arrived_t=holder["arrived_t"],
        mpc_ms=holder["mpc_ms"] / max(holder["n"], 1),
        ctrl_ms=holder["ctrl_ms"] / max(holder["n_ctrl"], 1),
        flight_s=holder["flight_s"],
        final_state=holder["state"])


def run_push_recovery(init_vx: float = 0.375, seconds: float = 2.5,
                      cfg: MPCConfig | None = None,
                      gait_opt_freq: int = 0, debug: bool = False,
                      flight_resync: bool = True,
                      recede_target: float = 0.4,
                      snap_window: float = 0.25,
                      dtype=jnp.float32) -> ClosedLoopResult:
    """The reference's push-recovery scenario, closed loop on A1.

    init_vx = 0.375 matches the reference's MuJoCo `init_vel`
    (a1_config_distr_rejection.yaml:37).  The default config is the full
    stability toolkit — double-support overlap + static-support carrier +
    Raibert capture stepping — which under the reference-parity contact
    model (condim 6, stiff solver) recovers 0.375 with z never below 0.26
    (vs 0.17 for the plain trot config); 0.6 m/s is the current edge
    (brakes fully but ends crouched).
    """
    from bilevel_gait_gen_tpu.models import a1
    if cfg is None:
        cfg = MPCConfig(ipm_iters=18, double_support=0.1,
                        force_carrier=True, carrier_ramp=0.1,
                        raibert=True,
                        raibert_vel_gain=(1.8, 1.2),
                        contact_snap_window=snap_window).validate()
    model = a1.make_a1()
    q0 = settled_start(model, np.asarray(a1.stand_config(), np.float64))
    v0 = np.zeros(model.nv)
    v0[0] = init_vx
    return run_closed_loop(model, cfg, wbqp.WBQPConfig(), q0, v0, seconds,
                           gait_opt_freq=gait_opt_freq, debug=debug,
                           flight_resync=flight_resync,
                           recede_target=recede_target, dtype=dtype)
