"""On-device closed-loop telemetry probe: big-cfg trot with per-tick
z / xy / torque / MPC-status traces.

This is the instrument that produced the penalty-engine stability
forensics in docs/DESIGN.md ("Penalty-engine closed-loop stability").
Knobs via env vars: CONTACT_DAMP (WBQP foot-velocity damping), GAIN_SCALE
(torso PD scale), TORQUE_BOUND, CONTACT_KP/CONTACT_KD/TVREG/SUBSTEPS
(ground model).

Usage: [ENV=...] python scripts/diag_engine.py [n_ticks]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

if os.environ.get("DIAG_CPU"):
    jax.config.update("jax_platforms", "cpu")

n_ticks = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
control_dt = float(os.environ.get("CONTROL_DT", "0.001"))
mpc_every = int(os.environ.get("MPC_EVERY", "50"))
contact_sync = bool(int(os.environ.get("CONTACT_SYNC", "1")))
dtype = jnp.float32
cfg = MPCConfig(ipm_iters=18,
                double_support=float(os.environ.get("DOUBLE_SUPPORT", "0.15")),
                force_carrier=bool(int(os.environ.get("FORCE_CARRIER", "1"))),
                carrier_ramp=float(os.environ.get("CARRIER_RAMP", "0.15")),
                swing_height=float(os.environ.get("SWING_HEIGHT", "0.05")),
                raibert=bool(int(os.environ.get("RAIBERT", "0"))),
                ).validate()
damp = float(os.environ.get("CONTACT_DAMP", "0"))
gs = float(os.environ.get("GAIN_SCALE", "1"))       # torso PD gain scale
tb = float(os.environ.get("TORQUE_BOUND", "30"))
wb_cfg = wbqp.WBQPConfig(contact_damp=damp, torque_bound=tb,
                         kp_base_pos=9000.0 * gs, kd_base_pos=3000.0 * gs,
                         kp_base_ang=1000.0 * gs, kd_base_ang=100.0 * gs)
sim = engine.SimConfig(substeps=int(os.environ.get("SUBSTEPS", "4")),
                       contact_kp=float(os.environ.get("CONTACT_KP", "12000")),
                       contact_kd=float(os.environ.get("CONTACT_KD", "120")),
                       tangent_vel_reg=float(os.environ.get("TVREG", "0.05")))
print(f"damp={damp} sim={sim}")

model = a1.make_a1()
# static-equilibrium settle: every foot at penetration mg/(E kp)
q0 = engine.settled_stand(model, sim, jnp.asarray(a1.stand_config(), dtype))
params = srb.make_srb_params(model, q0)
from bilevel_gait_gen_tpu.control import mpc_controller as _mc
x0 = _mc.reconstruct_srb_state(model, params, q0, jnp.zeros(model.nv, dtype))
feet0 = rbd.ee_positions(model, q0).astype(dtype)
traj = default_trajectory(cfg, gait.make_trot(cfg), x0, feet0[:, :2])
# warm-started solver state: carries the IPM solution across ticks
# (measured: 100% solved vs ~95% cold)
st = solver.make_state(cfg, traj, jnp.asarray(cfg.ee_box_size, dtype))
x_des = srb.manifold_to_tangent(x0)

st, stats = jax.jit(lambda s, x, e: solver.create_initial_run(
    cfg, params, s, x, e, x_des))(st, x0, feet0)
print(f"initial: solved={bool(stats.solved)} defect={float(stats.defect_l1):.2e}")

run = jax.jit(lambda s, q, v: engine.closed_loop(
    model, params, cfg, wb_cfg, sim, s, q, v, x_des,
    n_ticks=n_ticks, control_dt=control_dt, mpc_every=mpc_every,
    contact_sync=contact_sync))
st_out, log = run(st, q0, jnp.zeros(model.nv, dtype))
jax.block_until_ready(log.q)

q = np.asarray(log.q)
tau = np.asarray(log.tau)
solved = np.asarray(log.solved)
cost = np.asarray(log.cost)
mpc_ticks = np.arange(0, n_ticks, mpc_every)
print("MPC ticks: solved =", solved[mpc_ticks].astype(int).tolist())
print("cost      =", [f"{c:.0f}" for c in cost[mpc_ticks]])
for k in range(0, n_ticks, 100):
    print(f"t={k*control_dt:.2f} z={q[k,2]:.3f} xy=({q[k,0]:+.3f},{q[k,1]:+.3f})"
          f" |tau|max={np.abs(tau[k]).max():.1f}")
print(f"final z={q[-1,2]:.3f}")
