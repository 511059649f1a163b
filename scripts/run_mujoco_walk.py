"""Closed-loop trot in host MuJoCo with the full device controller.

Equivalent of the reference's mpc_sim demo (apps/mpc_sim_demo.cpp): MPC
real-time iterations at the MPC rate + whole-body QP torques at the control
rate, MuJoCo physics on the host.

Usage: python scripts/run_mujoco_walk.py [seconds] [--cpu] [--viewer]
       [--realtime] [--robot=adam|mini_cheetah] [--goal=X,Y] [--push[=v]]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from bilevel_gait_gen_tpu.control import mpc_controller, wbqp
from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import gait, solver
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.sim.mujoco_bridge import MujocoLoop
from bilevel_gait_gen_tpu.utils.config import MPCConfig


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else 2.0
    dtype = jnp.float32
    if "--config=push" in sys.argv:
        # reference push-recovery config (a1_config_distr_rejection.yaml):
        # N=50 @ 0.02, force bound 200, mu 0.6, z-heavy weights
        cfg = MPCConfig(num_nodes=50, dt=0.02, ipm_iters=18,
                        force_bound=200.0, friction_coef=0.6,
                        force_cost=0.001,
                        q_diag=(140.0, 140.0, 12000.0, 0.015, 0.015, 10.0,
                                3000.0, 3000.0, 3000.0, 1.0, 1.0, 1.0)
                        ).validate()
    else:
        cfg = MPCConfig(ipm_iters=18).validate()
    if "--raibert" in sys.argv:
        # capture-point touchdown placement (reference AddRaibertHeuristic,
        # mpc_single_rigid_body.cpp:939-1017): foothold = hip + T_st/2 v_com
        vg = os.environ.get("RAIBERT_VGAIN", "1.0")
        vgt = (tuple(float(v) for v in vg.split(","))
               if "," in vg else float(vg))
        cfg = dataclasses.replace(cfg, raibert=True,
                                  raibert_vel_gain=vgt).validate()
    wb_cfg = wbqp.WBQPConfig()

    if "--robot=mini_cheetah" in sys.argv:
        from bilevel_gait_gen_tpu.models import mini_cheetah as robot_mod
        model = robot_mod.make_mini_cheetah()
        q0_np = np.asarray(robot_mod.stand_config(), np.float64)
        # stiff reference-parity contact: soften the joint gains (kp 900
        # chattered on the condim-6 stiff-solver ground) and enable the
        # stability toolkit
        cfg = dataclasses.replace(
            cfg, double_support=0.1, force_carrier=True,
            carrier_ramp=0.1).validate()
        wb_cfg = wbqp.WBQPConfig(torque_bound=float(model.effort_limit[0]),
                                 kp_joint=300.0, kd_joint=20.0)
    elif "--robot=adam" in sys.argv:
        # Adam biped (reference apps/adam_configuration.yaml: POINT_FEET,
        # mu=0.3, torque bound 33.5; the reference ships controller_type
        # PD_GRAV_COMP for it — the full-MPC biped loop is new here).  The
        # static-support carrier + double-support overlap carry the weight
        # transfer between single-stance phases.
        from bilevel_gait_gen_tpu.models import adam as robot_mod
        model = robot_mod.make_adam()
        q0_np = np.asarray(robot_mod.stand_config(), np.float64)
        cfg = MPCConfig(num_ee=2, ipm_iters=18, friction_coef=0.3,
                        phase_duration=float(os.environ.get(
                            "ADAM_PHASE", "0.3")),
                        force_bound=250.0, swing_height=0.08,
                        force_carrier=True,
                        double_support=float(os.environ.get(
                            "ADAM_DSUP", "0.1")),
                        carrier_ramp=0.1, ee_box_size=(0.3, 0.3),
                        # Raibert capture-point touchdowns: biped point
                        # feet cannot balance without stepping feedback;
                        # foothold = COM(td) + hip + (T_st/2) v_com
                        raibert=True,
                        # fore-aft needs super-neutral capture gain
                        # (>1 damps; 1.0 is velocity-neutral); lateral
                        # stepping is softer or it excites the roll cycle
                        raibert_vel_gain=tuple(
                            float(v) for v in os.environ.get(
                                "ADAM_VGAIN", "2.5,1.2").split(",")),
                        # fore-aft neutral point = the COM (hip sits 8 mm
                        # behind it; that bias integrates into drift)
                        raibert_hip_scale=tuple(
                            float(v) for v in os.environ.get(
                                "ADAM_HSCALE", "0.0,1.0").split(",")),
                        # heavy linear-momentum weight: the COM is
                        # directly force-actuated; braking the drift is the
                        # biped's whole balance authority
                        q_diag=tuple(float(v) for v in os.environ.get(
                            "ADAM_QDIAG",
                            "600,600,8000,8,8,10,6000,6000,6000,5,5,5"
                            ).split(",")),
                        ).validate()
        # kp 400 / kd 30: the swing foot must LAND at the Raibert target
        # — softer gains land short, shrinking the effective stepping gain
        # below velocity-neutral and the drift never damps (measured)
        wb_cfg = wbqp.WBQPConfig(torque_bound=33.5, kp_joint=400.0,
                                 kd_joint=30.0, friction_coef=0.3,
                                 force_weight=5.0)
    else:
        model = a1.make_a1()
        q0_np = np.asarray(a1.stand_config(), np.float64)
    if "--robot=adam" in sys.argv:
        # point feet: the support LINE must pass through the whole-body COM
        # or the robot topples in pitch from t=0 (measured: x doubling
        # every 0.1 s).  Fixed-point IK: feet x -> COM x.
        from bilevel_gait_gen_tpu.control import ik as ik_mod
        qj = jnp.asarray(q0_np, dtype)
        for _ in range(3):
            com = rbd.com_position(model, qj)
            feet = rbd.ee_positions(model, qj)
            qj = ik_mod.solve_ik(model, qj[0:3], qj[3:7],
                                 feet.at[:, 0].set(com[0]), qj, iters=20)
        q0_np = np.asarray(qj, np.float64)
    # settle ALL feet into ground contact: the highest foot center ends at
    # foot_radius - 1.5 mm (a hovering rear pair destroys standing)
    foot_radius = 0.02
    feet_z0 = np.asarray(rbd.ee_positions(
        model, jnp.asarray(q0_np, dtype)))[:, 2]
    q0_np[2] -= float(feet_z0.max()) - foot_radius + 0.0015
    q0 = jnp.asarray(q0_np, dtype)
    params = srb.make_srb_params(model, q0)

    # --initpush[=vx]: the reference's push-recovery scenario — the robot
    # STARTS with a COM velocity and the MPC plans from that state
    # (srb_init in a1_config_distr_rejection.yaml)
    init_vx = 0.0
    for a in sys.argv[1:]:
        if a.startswith("--initpush"):
            init_vx = float(a.split("=", 1)[1]) if "=" in a else 1.0
    v0_init = jnp.zeros(model.nv, dtype).at[0].set(init_vx)
    x0 = mpc_controller.reconstruct_srb_state(model, params, q0, v0_init)
    feet0 = rbd.ee_positions(model, q0).astype(dtype)
    sched = (gait.make_standing(cfg) if "--gait=standing" in sys.argv
             else gait.make_trot(cfg))
    traj = default_trajectory(cfg, sched, x0, feet0[:, :2])
    state = solver.SolverState(traj=traj,
                               ee_box=jnp.asarray(cfg.ee_box_size, dtype))
    # target: trot in place at nominal height with ZERO momentum (the push
    # must be rejected, not maintained); --goal=X,Y walks to a position
    # (the reference's walk-to-position weight set, a1_configuration.yaml
    # comments 180-204)
    goal = None
    for a in sys.argv[1:]:
        if a.startswith("--goal="):
            gx, gy = (float(v) for v in a.split("=", 1)[1].split(","))
            goal = (gx, gy)
    x_tgt = x0.at[3:6].set(0.0)
    if goal is not None:
        x_tgt = x_tgt.at[0].add(goal[0]).at[1].add(goal[1])
    x_des = srb.manifold_to_tangent(x_tgt)

    print("initial MPC run ...")
    t_start = time.time()
    init_run = jax.jit(lambda st, x, ee: solver.create_initial_run(
        cfg, params, st, x, ee, x_des))
    state, stats = init_run(state, x0, feet0)
    jax.block_until_ready(stats.cost)
    print(f"  done in {time.time()-t_start:.1f}s; defect={float(stats.defect_l1):.2e} solved={bool(stats.solved)}")

    # bounded carrot: command at most carrot_r of the remaining goal per
    # plan so far goals don't blow up the momentum (walk-to-position
    # stays a sequence of small position errors).  The biped gets a
    # shorter carrot: its inverted-pendulum time constant (~0.27 s) brakes
    # far slower than the quadruped's diagonal support, so an A1-sized
    # carrot arrives with momentum and overshoots the goal (measured:
    # 0.415 m final for a 0.3 m goal).
    carrot_r = 0.12 if "--robot=adam" in sys.argv else 0.25

    # the biped walks by FOOT PLACEMENT: its Raibert rows track the target
    # momentum, so the carrot must command a (tapered) walking velocity —
    # a pure position carrot leaves capture stepping regulating v -> 0
    # against the MPC's forces and the walk never terminates at the goal
    # (measured: 0.3 m goal, final 0.89 m and still drifting)
    vel_carrot = "--robot=adam" in sys.argv
    v_walk = 0.10

    def clamp_goal(x_srb):
        if goal is None:
            return x_des
        tgt = jnp.asarray([x0[0] + goal[0], x0[1] + goal[1]])
        d = tgt - x_srb[0:2]
        n = jnp.linalg.norm(d)
        # taper near the goal: approach speed shrinks with remaining
        # distance so the arrival is a gentle stop, not a push-recovery
        # event (the collapse mode is braking from walk speed)
        r_eff = jnp.minimum(carrot_r, 0.6 * n)
        step_xy = jnp.where(n > r_eff, d * (r_eff / (n + 1e-9)), d)
        # lateral speed limit: trot lateral stepping is structurally
        # narrower than fore-aft; uncapped diagonal carrots overshoot in y
        step_xy = step_xy.at[1].set(jnp.clip(step_xy[1], -0.08, 0.08))
        x_t = x0.at[3:6].set(0.0).at[0:2].set(x_srb[0:2] + step_xy)
        if vel_carrot:
            # gentle position feedback (0.8/s — 1.5/s measured unstable:
            # the overdamped capture stepping turns it into a growing
            # fore-aft oscillation) + integral velocity trim: the swing
            # tracking lands feet systematically short (see the kp note
            # above), leaving a ~0.05 m/s placement bias that pure
            # proportional velocity commands cannot null
            v_des = d * (jnp.minimum(v_walk, 0.5 * n) / (n + 1e-9))
            # near-goal deadband: Adam cannot step backward (measured:
            # a full -0.10 m/s command still creeps +0.03 forward), so
            # inside 0.1 m the command is march-in-place and the position
            # carrot alone holds station
            v_des = v_des * (n > 0.10)
            v_des = v_des.at[1].set(jnp.clip(v_des[1], -0.05, 0.05))
            x_t = x_t.at[3:5].set(float(params.mass) * v_des)
        return srb.manifold_to_tangent(x_t)

    mpc_step = jax.jit(lambda st, x, t, ee, xd: solver.solve_step(
        cfg, params, st, x, t, ee, xd))
    # post-arrival standing uses the static-support carrier so the fresh
    # stance does not start at boundary-pinned zero force (the engine's
    # round-1 standing fix, docs/DESIGN.md)
    # post-arrival standing MPC: carrier-standing schedule (merged
    # stance) regulates position — joint-PD alone has no position
    # feedback and residual momentum rolls ~0.2 m before decaying
    cfg_stand = dataclasses.replace(cfg, force_carrier=True,
                                    carrier_ramp=0.1).validate()
    init_stand = jax.jit(lambda st, x, ee, xd: solver.create_initial_run(
        cfg_stand, params, st, x, ee, xd))
    mpc_step_stand = jax.jit(lambda st, x, t, ee, xd: solver.solve_step(
        cfg_stand, params, st, x, t, ee, xd))
    ctrl_stand = jax.jit(
        lambda traj, q, v, t, t0, mc: mpc_controller.control_action(
            model, params, cfg_stand, wb_cfg, traj, q, v, t, t0, mc))
    ctrl = jax.jit(lambda traj, q, v, t, t0, mc: mpc_controller.control_action(
        model, params, cfg, wb_cfg, traj, q, v, t, t0, mc))

    loop = MujocoLoop(model, timestep=0.001)
    v0_np = np.zeros(model.nv)
    v0_np[0] = init_vx
    loop.set_state(np.asarray(q0), v0_np)

    mpc_period = cfg.dt     # one RTI per MPC node period (reference cadence)
    holder = {"state": state, "t0": 0.0, "n_mpc": 0, "mpc_ms": 0.0,
              "ctrl_ms": 0.0, "n_ctrl": 0, "fails": 0}

    def control_fn(q, v, t):
        qj = jnp.asarray(q, dtype)
        vj = jnp.asarray(v, dtype)
        if t >= holder["t0"] + mpc_period or t == 0.0:
            tm = time.perf_counter()
            x_srb = mpc_controller.reconstruct_srb_state(model, params, qj, vj)
            feet = rbd.ee_positions(model, qj)

            # early-touchdown schedule sync (AdjustForCurrentContacts)
            mc_now = jnp.asarray(loop.contacts())
            st_in = holder["state"]
            sched2 = gait.adjust_for_current_contacts(
                st_in.traj.sched, mc_now, jnp.asarray(t, dtype))
            st_in = dataclasses.replace(
                st_in, traj=dataclasses.replace(st_in.traj, sched=sched2))
            step_fn = (mpc_step_stand if holder.get("standing", False)
                       else mpc_step)
            st, stats = step_fn(st_in, x_srb,
                                jnp.asarray(t, dtype), feet,
                                clamp_goal(x_srb))
            jax.block_until_ready(stats.cost)
            holder["state"] = st
            holder["t0"] = t
            holder["n_mpc"] += 1
            holder["mpc_ms"] += (time.perf_counter() - tm) * 1e3
            if os.environ.get("WALK_DEBUG") and holder["n_mpc"] % 5 == 0:
                b = np.asarray(st.traj.sched.bounds)
                fut = b[:, 1:] - b[:, :-1]
                # lengths of phases that overlap the horizon
                msk = (b[:, 1:] > t) & (b[:, :-1] < t + cfg.horizon)
                lens = fut[msk]
                print(f"  t={t:.2f} cost={float(stats.cost):+.0f} "
                      f"defect={float(stats.defect_l1):.2e} "
                      f"alpha={float(stats.alpha):.2f} "
                      f"phase_len=[{lens.min():.3f},{lens.max():.3f}]")
            if not bool(stats.solved):
                holder["fails"] += 1
        tm = time.perf_counter()
        mc = jnp.asarray(loop.contacts())
        # arrival state machine at CONTROL rate: once the goal is reached
        # at low speed with all four feet planted, hold the configuration
        # with joint PD + gravity comp (the reference's Stand state,
        # pd_grav_comp.cpp, hardware_robot.h:46-51) — statically stable,
        # no schedule to resync.  All-4-contact instants are brief in the
        # trot, so the gate must sample at 1 kHz, not at MPC ticks.
        if goal is not None and not holder.get("standing", False):
            tgt = np.asarray([x0[0] + goal[0], x0[1] + goal[1]])
            com_now = np.asarray(q[0:3]) + np.asarray(
                holder.get("com_off_w", np.zeros(3)))
            err = float(np.hypot(com_now[0] - tgt[0], com_now[1] - tgt[1]))
            spd = float(np.linalg.norm(np.asarray(v[0:2])))
            if err < 0.07 and spd < 0.06 and bool(np.all(np.asarray(mc))):
                x_srb_a = mpc_controller.reconstruct_srb_state(
                    model, params, qj, vj)
                feet_a = rbd.ee_positions(model, qj)
                sched_s = gait.make_standing(cfg_stand, t0=float(t))
                traj_s = default_trajectory(cfg_stand, sched_s, x_srb_a,
                                            feet_a[:, :2])
                st_s = solver.SolverState(
                    traj=traj_s,
                    ee_box=jnp.asarray(cfg.ee_box_size, dtype))
                st_s, _ = init_stand(st_s, x_srb_a, feet_a,
                                     clamp_goal(x_srb_a))
                holder["state"] = st_s
                holder["t0"] = t
                holder["standing"] = True
                print(f"  arrived (err {err:.3f} m) -> MPC stand at t={t:.2f}")
        if holder.get("standing", False):
            tau = ctrl_stand(holder["state"].traj, qj, vj,
                             jnp.asarray(t, dtype),
                             jnp.asarray(holder["t0"], dtype), mc)
        else:
            tau = ctrl(holder["state"].traj, qj, vj, jnp.asarray(t, dtype),
                       jnp.asarray(holder["t0"], dtype), mc)
        tau = np.asarray(tau)
        holder["ctrl_ms"] += (time.perf_counter() - tm) * 1e3
        holder["n_ctrl"] += 1
        return tau

    # optional push-recovery test (reference a1_config_distr_rejection):
    # --push[=vx] injects a base velocity impulse at t = 1 s
    push_v = 0.0
    for a in sys.argv[1:]:
        if a.startswith("--push"):
            push_v = float(a.split("=", 1)[1]) if "=" in a else 1.0

    n_steps = int(seconds * 1000)
    print(f"running {n_steps} MuJoCo steps ..."
          + (f" (push {push_v} m/s at t=1s)" if push_v else ""))
    t_start = time.time()
    if push_v and n_steps > 1000:
        qs1, vs1, taus1 = loop.run(control_fn, 1000, control_decimation=1)
        loop.mj_data.qvel[0] += push_v
        qs2, vs2, taus2 = loop.run(
            lambda q, v, t: control_fn(q, v, t + 1.0), n_steps - 1000,
            control_decimation=1)
        qs = np.concatenate([qs1, qs2])
        vs = np.concatenate([vs1, vs2])
        taus = np.concatenate([taus1, taus2])
    else:
        qs, vs, taus = loop.run(control_fn, n_steps, control_decimation=1,
                                viewer="--viewer" in sys.argv,
                                realtime="--realtime" in sys.argv)
    wall = time.time() - t_start

    z = qs[:, 2]
    xy = qs[:, 0:2]
    print(f"wall {wall:.1f}s for {seconds}s sim")
    print(f"MPC solves: {holder['n_mpc']} (avg {holder['mpc_ms']/max(holder['n_mpc'],1):.1f} ms) fails: {holder['fails']}")
    print(f"ctrl ticks: {holder['n_ctrl']} (avg {holder['ctrl_ms']/max(holder['n_ctrl'],1):.2f} ms)")
    print(f"z: start {z[0]:.3f} min {z.min():.3f} max {z.max():.3f} end {z[-1]:.3f}")
    print(f"xy drift: {np.abs(xy).max(axis=0)}")
    upright = z.min() > 0.55 * z[0]
    if goal is not None:
        err_t = np.hypot(qs[:, 0] - goal[0], qs[:, 1] - goal[1])
        err = float(err_t[-1])
        err_min = float(err_t.min())
        print(f"goal {goal}: final ({qs[-1,0]:+.3f},{qs[-1,1]:+.3f}) "
              f"err {err:.3f} m (min over run {err_min:.3f} at "
              f"t={err_t.argmin()/1000:.1f}s)")
        if "--robot=adam" in sys.argv:
            # biped criterion: REACH the goal and stay upright.  Terminal
            # station-keeping drifts forward ~0.03 m/s because Adam cannot
            # step backward (measured: a -0.10 m/s command still nets
            # +0.03 forward); parking a point-foot biped needs backward
            # stepping the current swing IK doesn't produce.
            upright = upright and err_min < 0.12 and err < 0.35
        else:
            upright = upright and err < 0.15
    print("WALKED" if upright else "FELL")
    np.save("/tmp/walk_qs.npy", qs)
    from bilevel_gait_gen_tpu.sim import viz
    # convert logged mujoco qpos (wxyz) rows to our convention for the plot
    qs_c = qs.copy()
    qs_c[:, 3:7] = qs[:, [4, 5, 6, 3]]
    p = viz.plot_plan_overlay(holder["state"].traj, cfg, params, qs_c,
                              t0=holder["t0"], path="/tmp/walk_overlay.png")
    print(f"plan/EE-box overlay: {p}")
    return 0 if upright else 1


if __name__ == "__main__":
    raise SystemExit(main())
