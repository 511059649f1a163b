"""Debug: does the tiny-config engine closed loop sag in BOTH the plain
vmapped and the sharded variant (i.e. a physics/config property), or only
under sharding?  Mirrors tests/test_parallel.py's sharded closed-loop test."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from bilevel_gait_gen_tpu.control import wbqp as wbqp_mod
from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import gait, solver
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.parallel import mesh as mesh_mod
from bilevel_gait_gen_tpu.sim import engine as engine_mod
from bilevel_gait_gen_tpu.utils.config import MPCConfig

cfg = MPCConfig(num_nodes=6, num_phase_slots=4, phase_duration=0.5,
                samples_per_stance=4, ee_node_start=1, ipm_iters=8,
                init_run_iters=2, max_ls_iters=4, dt=0.05).validate()
model = a1.make_a1()
q0j = jnp.asarray(a1.stand_config(), jnp.float32)
params = srb.make_srb_params(model, q0j)
x0 = srb.reconstruct_state(params, q0j, jnp.zeros(model.nv, jnp.float32))
feet0 = rbd.ee_positions(model, q0j).astype(jnp.float32)
traj = default_trajectory(cfg, gait.make_trot(cfg), x0, feet0[:, :2])
st = solver.SolverState(traj=traj,
                        ee_box=jnp.asarray(cfg.ee_box_size, jnp.float32))
x_des = srb.manifold_to_tangent(x0)

wb_cfg = wbqp_mod.WBQPConfig()
sim = engine_mod.SimConfig()
B = 8
q0 = engine_mod.settled_stand(model, sim, q0j)
v0s = jnp.zeros((B, model.nv), jnp.float32).at[:, 0].set(
    jnp.linspace(-0.1, 0.1, B, dtype=jnp.float32))
q0s = jnp.stack([q0] * B)
sts = jax.tree.map(lambda a: jnp.stack([a] * B), st)
xds = jnp.stack([x_des] * B)

n_ticks, control_dt, mpc_every = 40, 0.005, 20

vloop = jax.jit(jax.vmap(
    lambda s, q, v, xd: engine_mod.closed_loop(
        model, params, cfg, wb_cfg, sim, s, q, v, xd,
        n_ticks=n_ticks, control_dt=control_dt, mpc_every=mpc_every),
    in_axes=(0, 0, 0, 0)))
st_p, log_p = vloop(sts, q0s, v0s, xds)

mesh = mesh_mod.make_mesh()
sharded = mesh_mod.scenario_sharded_closed_loop(
    model, params, cfg, wb_cfg, sim, mesh, n_ticks=n_ticks,
    control_dt=control_dt, mpc_every=mpc_every)
st_s, log_s = sharded(sts, q0s, v0s, xds)

zp = np.asarray(log_p.q)[:, :, 2]
zs = np.asarray(log_s.q)[:, :, 2]
print("z0:", float(q0s[0, 2]))
print("plain   z min per scenario:", zp.min(axis=1))
print("sharded z min per scenario:", zs.min(axis=1))
print("plain   z final:", zp[:, -1])
print("sharded z final:", zs[:, -1])
print("solved plain:", np.asarray(log_p.solved).all(),
      "sharded:", np.asarray(log_s.solved).all())
print("cost plain (mpc ticks):",
      np.asarray(log_p.cost)[0][np.isfinite(np.asarray(log_p.cost)[0])])
print("max |q diff| first 10 ticks:",
      np.abs(np.asarray(log_s.q)[:, :10] - np.asarray(log_p.q)[:, :10]).max())
