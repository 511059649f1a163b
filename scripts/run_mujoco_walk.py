"""Closed-loop trot in host MuJoCo with the full device controller.

Equivalent of the reference's mpc_sim demo (apps/mpc_sim_demo.cpp): MPC
real-time iterations at the MPC rate + whole-body QP torques at the control
rate, MuJoCo physics on the host.  The loop itself is the shared harness
`sim/closed_loop.run_closed_loop` — this script only builds per-robot
configs and evaluates the outcome.

Usage: python scripts/run_mujoco_walk.py [seconds] [--cpu] [--viewer]
       [--realtime] [--robot=adam|mini_cheetah] [--goal=X,Y] [--push[=v]]
       [--initpush[=v]] [--gait-opt[=freq]] [--stretch=S] [--raibert]
       [--gait=standing] [--config=push]
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

from bilevel_gait_gen_tpu.control import wbqp
from bilevel_gait_gen_tpu.models import a1, rbd
from bilevel_gait_gen_tpu.mpc import gait
from bilevel_gait_gen_tpu.sim.closed_loop import (GoalCarrot, run_closed_loop,
                                                  settled_start)
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
                        contact_snap_window=float(os.environ.get(
                            "SNAP", "0.25")),
                        q_diag=(140.0, 140.0, 12000.0, 0.015, 0.015, 10.0,
                                3000.0, 3000.0, 3000.0, 1.0, 1.0, 1.0)
                        ).validate()
    else:
        cfg = MPCConfig(ipm_iters=18,
                        contact_snap_window=float(os.environ.get(
                            "SNAP", "0.25"))).validate()
    if "--raibert" in sys.argv:
        # capture-point touchdown placement (reference AddRaibertHeuristic,
        # mpc_single_rigid_body.cpp:939-1017): foothold = hip + T_st/2 v_com
        vg = os.environ.get("RAIBERT_VGAIN", "1.0")
        vgt = (tuple(float(v) for v in vg.split(","))
               if "," in vg else float(vg))
        cfg = dataclasses.replace(cfg, raibert=True,
                                  raibert_vel_gain=vgt).validate()
    wb_cfg = wbqp.WBQPConfig()
    carrot_kw = dict(radius=0.25)

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
        # biped snap stays at the reference's 70 ms: the quadruped's wide
        # window (0.25 > the 0.2 s swing) eats the biped gait — point feet
        # scuff during swing and every scuff would snap the touchdown
        cfg = MPCConfig(num_ee=2, ipm_iters=18, friction_coef=0.3,
                        contact_snap_window=float(os.environ.get(
                            "SNAP", "0.07")),
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
                        # stepping VELOCITY-NEUTRAL: 1.2 leaves the
                        # roll-coupled lateral cycle marginally stable
                        # (flips under reduction-order numerics — the
                        # 8-virtual-device CPU partitioning falls by
                        # t~12 s), 1.0 holds station 16 s either way
                        raibert_vel_gain=tuple(
                            float(v) for v in os.environ.get(
                                "ADAM_VGAIN", "2.5,1.0").split(",")),
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
        # the biped walks by FOOT PLACEMENT (Raibert rows track target
        # momentum): short carrot (inverted-pendulum tau ~0.27 s brakes far
        # slower than diagonal support) + tapered velocity command
        # integral trim (ki) nulls the placement bias for station-keeping
        # and backward stepping; a point-foot biped cannot balance
        # statically, so arrival keeps marching instead of standing
        carrot_kw = dict(radius=0.12, vel_carrot=True, v_walk=0.10,
                         ki=float(os.environ.get("ADAM_KI", "0.5")),
                         stand_on_arrival=False)
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
    # settle ALL feet into ground contact (a hovering pair destroys standing)
    q0_np = settled_start(model, q0_np)

    # --initpush[=vx]: the reference's push-recovery scenario — the robot
    # STARTS with a COM velocity and the MPC plans from that state
    # (srb_init in a1_config_distr_rejection.yaml)
    init_vx = 0.0
    push = None
    goal = None
    gait_opt_freq = 0
    stretch = 1.0
    for a in sys.argv[1:]:
        if a.startswith("--initpush"):
            init_vx = float(a.split("=", 1)[1]) if "=" in a else 1.0
        elif a.startswith("--push"):
            # velocity impulse at t = 1 s (reference distr-rejection shape)
            push = (1.0, float(a.split("=", 1)[1]) if "=" in a else 1.0)
        elif a.startswith("--goal="):
            gx, gy = (float(v) for v in a.split("=", 1)[1].split(","))
            goal = (gx, gy)
        elif a.startswith("--gait-opt"):
            gait_opt_freq = int(a.split("=", 1)[1]) if "=" in a else 10
        elif a.startswith("--stretch="):
            # deliberately mistimed schedule: all phases stretched, the
            # bilevel optimizer's A/B scenario (bench ab_* fields)
            stretch = float(a.split("=", 1)[1])

    v0_np = np.zeros(model.nv)
    v0_np[0] = init_vx
    sched = (gait.make_standing(cfg) if "--gait=standing" in sys.argv
             else gait.make_trot(cfg))
    if stretch != 1.0:
        sched = gait.GaitSchedule(bounds=sched.bounds * stretch)
    carrot = GoalCarrot(goal=goal, **carrot_kw) if goal is not None else None

    print(f"closed loop: {seconds}s, robot="
          + ("adam" if "--robot=adam" in sys.argv else
             "mini_cheetah" if "--robot=mini_cheetah" in sys.argv else "a1")
          + (f" goal={goal}" if goal else "")
          + (f" gait_opt_freq={gait_opt_freq}" if gait_opt_freq else "")
          + (f" stretch={stretch}" if stretch != 1.0 else "")
          + (f" push={push}" if push else ""))
    t_start = time.time()
    res = run_closed_loop(
        model, cfg, wb_cfg, q0_np, v0_np, seconds, sched=sched,
        gait_opt_freq=gait_opt_freq, carrot=carrot, push=push,
        # biped support exchanges pass through brief all-airborne
        # instants; the dwell filter keeps them out of the flight hold
        flight_dwell=0.025 if "--robot=adam" in sys.argv else 0.0,
        viewer="--viewer" in sys.argv, realtime="--realtime" in sys.argv,
        debug=bool(os.environ.get("WALK_DEBUG")), dtype=dtype)
    wall = time.time() - t_start

    qs, z = res.qs, res.z
    print(f"wall {wall:.1f}s for {seconds}s sim")
    print(f"MPC solves: {res.n_mpc} (avg {res.mpc_ms:.1f} ms) "
          f"fails: {res.n_fails}"
          + (f" gait accepts: {res.n_gait_accepts}" if gait_opt_freq else ""))
    print(f"ctrl ticks avg {res.ctrl_ms:.2f} ms")
    print(f"z: start {z[0]:.3f} min {z.min():.3f} max {z.max():.3f} "
          f"end {z[-1]:.3f}")
    print(f"xy drift: {np.abs(qs[:, 0:2]).max(axis=0)}")
    upright = z.min() > 0.55 * z[0]
    if goal is not None:
        err_t = np.hypot(qs[:, 0] - goal[0], qs[:, 1] - goal[1])
        err = float(err_t[-1])
        err_min = float(err_t.min())
        print(f"goal {goal}: final ({qs[-1,0]:+.3f},{qs[-1,1]:+.3f}) "
              f"err {err:.3f} m (min over run {err_min:.3f} at "
              f"t={err_t.argmin()/1000:.1f}s)"
              + (f"  arrived->stand at t={res.arrived_t:.1f}s"
                 if res.arrived_t >= 0 else ""))
        if "--robot=adam" in sys.argv:
            # biped criterion: REACH the goal and stay upright.  Terminal
            # station-keeping drifts forward ~0.03 m/s because Adam cannot
            # step backward (measured: a -0.10 m/s command still nets
            # +0.03 forward); parking a point-foot biped needs backward
            # stepping the current swing IK doesn't produce.
            # biped criterion (r4): REACH the goal and HOLD station.  The
            # fore-aft integral trim (GoalCarrot.ki) nulls the placement
            # bias that made r3 drift past the goal indefinitely; arrival
            # accuracy varies 0.005-0.143 m across numerics variants (the
            # marginal lateral cycle phase-shifts the approach), so the
            # reach gate carries margin while the HOLD gate (0.30, vs
            # r3's 0.35 with unbounded drift rate) is the tightened part.
            upright = upright and err_min < 0.18 and err < 0.30
        else:
            upright = upright and err < 0.15
    if gait_opt_freq:
        k = max(len(res.costs) // 5, 1)
        print(f"planning cost: first-5th {np.mean(res.costs[:k]):+.0f} "
              f"last-5th {np.mean(res.costs[-k:]):+.0f}")
    print("WALKED" if upright else "FELL")
    np.save("/tmp/walk_qs.npy", qs)
    from bilevel_gait_gen_tpu.sim import viz
    from bilevel_gait_gen_tpu.models import srb as srb_mod
    # convert logged mujoco qpos (wxyz) rows to our convention for the plot
    qs_c = qs.copy()
    qs_c[:, 3:7] = qs[:, [4, 5, 6, 3]]
    params = srb_mod.make_srb_params(model, jnp.asarray(q0_np, dtype))
    # rebuild the final trajectory pytree for the overlay from the result
    # (the harness returns the final schedule; the plan plot uses the last
    # logged states)
    p = viz.plot_rollout(qs_c, path="/tmp/walk_rollout.png")
    print(f"rollout plot: {p}")
    return 0 if upright else 1


if __name__ == "__main__":
    raise SystemExit(main())
