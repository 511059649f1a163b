"""Batched on-device closed-loop simulation: N robots walking in parallel.

The capability the TPU design buys that the reference cannot express: the
ENTIRE closed loop — penalty-contact physics, 250 Hz whole-body QP, MPC
real-time iterations — vmapped over a scenario batch and compiled as one
XLA program.  Useful for controller robustness sweeps, domain-randomized
evaluation, and (with jax.grad through it) controller tuning.

STATUS: experimental harness.  Default gait is standing with the config
validated by tests/test_sim_engine.py; --trot switches to the on-device
walking gait.  Sustained (>0.5 s) closed-loop locomotion on the penalty
ground is NOT yet stable — the transition dips where the planned support
force passes through zero excite hop/sag cycles that MuJoCo's hard
contact absorbs (full forensics: docs/DESIGN.md, "Penalty-engine
closed-loop stability").  The MuJoCo bridge (scripts/run_mujoco_walk.py)
is the physics-parity walking path; this script is the scale/robustness
harness and the probe that produced those findings.

Usage: python scripts/batch_sim_demo.py [batch] [ticks] [--cpu] [--pert=0.01]
       [--trot] [--big]
"""
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

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from bilevel_gait_gen_tpu.control import wbqp
from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import gait, solver
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.sim import engine
from bilevel_gait_gen_tpu.utils.config import MPCConfig


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 16
    n_ticks = int(args[1]) if len(args) > 1 else 100

    dtype = jnp.float32
    if "--big" in sys.argv:
        # the regime validated to walk in MuJoCo (run_mujoco_walk.py):
        # full N=20 horizon, 1 kHz low level, 20 Hz MPC
        control_dt = 0.001
        mpc_every = 50
        cfg = MPCConfig(ipm_iters=18).validate()
        wb_cfg = wbqp.WBQPConfig()
        sim = engine.SimConfig(substeps=1)
    else:
        control_dt = 0.004      # 250 Hz low level
        mpc_every = 12          # ~20 Hz MPC
        if "--trot" in sys.argv:
            cfg = MPCConfig(num_nodes=12, num_phase_slots=8,
                            samples_per_stance=6,
                            ipm_iters=12, max_ls_iters=6).validate()
        else:
            # the closed-loop-standing regime validated in
            # tests/test_sim_engine.py::test_closed_loop_standing_small;
            # note spline forces are structurally zero at every phase
            # boundary (first at 2*phase_duration = 1 s), so keep standing
            # runs inside one stance phase
            cfg = MPCConfig(num_nodes=6, num_phase_slots=4,
                            phase_duration=0.5, samples_per_stance=4,
                            ee_node_start=1, ipm_iters=15, init_run_iters=3,
                            max_ls_iters=4).validate()
        wb_cfg = wbqp.WBQPConfig(ipm_iters=12)
        sim = engine.SimConfig(substeps=2)

    model = a1.make_a1()
    q0_np = np.asarray(a1.stand_config(), np.float64)
    feet_z0 = rbd.ee_positions(model, jnp.asarray(q0_np, dtype))[:, 2]
    # settle at penalty-spring force equilibrium (pen = mg / (4 kp)): the
    # springs must carry the robot at t=0 or the kd_base term turns the
    # settle transient into railed torques and a hop-sag limit cycle
    pen_eq = float(model.total_mass) * 9.81 / (4 * sim.contact_kp)
    q0_np[2] -= float(jnp.max(feet_z0)) - sim.foot_radius + pen_eq
    q0 = jnp.asarray(q0_np, dtype)
    params = srb.make_srb_params(model, q0)
    from bilevel_gait_gen_tpu.control import mpc_controller as _mc
    x0 = _mc.reconstruct_srb_state(model, params, q0, jnp.zeros(model.nv, dtype))
    feet0 = rbd.ee_positions(model, q0).astype(dtype)
    sched = (gait.make_trot(cfg) if "--trot" in sys.argv
             else gait.make_standing(cfg))
    traj = default_trajectory(cfg, sched, x0, feet0[:, :2])
    st = solver.SolverState(traj=traj,
                            ee_box=jnp.asarray(cfg.ee_box_size, dtype))
    x_des = srb.manifold_to_tangent(x0)

    st, stats = jax.jit(lambda s, x, e: solver.create_initial_run(
        cfg, params, s, x, e, x_des))(st, x0, feet0)
    print(f"initial run: solved={bool(stats.solved)} "
          f"defect={float(stats.defect_l1):.2e}")

    # batch: randomized initial joint perturbations (domain-randomization
    # style robustness sweep)
    pert = 0.01
    for a in sys.argv[1:]:
        if a.startswith("--pert="):
            pert = float(a.split("=")[1])
    key = jax.random.PRNGKey(0)
    dq = pert * jax.random.normal(key, (B, model.num_joints), dtype)
    q0s = jnp.tile(q0[None], (B, 1)).at[:, 7:].add(dq)
    v0s = jnp.zeros((B, model.nv), dtype)
    states = jax.tree.map(lambda a: jnp.stack([a] * B), st)

    run = jax.jit(jax.vmap(
        lambda s, q, v: engine.closed_loop(
            model, params, cfg, wb_cfg, sim, s, q, v, x_des,
            n_ticks=n_ticks, control_dt=control_dt, mpc_every=mpc_every)))

    t0 = time.time()
    st_out, log = run(states, q0s, v0s)
    jax.block_until_ready(log.q)
    t_compile = time.time() - t0
    t0 = time.perf_counter()
    st_out, log = run(states, q0s, v0s)
    jax.block_until_ready(log.q)
    t_run = time.perf_counter() - t0

    z = np.asarray(log.q[:, :, 2])                      # [B, T]
    upright = (z.min(axis=1) > 0.15)
    sim_s = n_ticks * control_dt
    print(f"{B} robots x {sim_s:.2f} s sim: compile+run {t_compile:.1f} s, "
          f"steady {t_run:.2f} s "
          f"({B * sim_s / t_run:.1f}x realtime aggregate)")
    print(f"upright: {upright.sum()}/{B}  z final mean "
          f"{z[:, -1].mean():.3f}  min {z.min():.3f}")


if __name__ == "__main__":
    main()
