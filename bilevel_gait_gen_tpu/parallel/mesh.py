"""Device-mesh scaling: scenario-batched MPC over jax.sharding (L9).

The reference has no distributed runtime — its only parallelism is a
10-thread OpenMP fork-join over line-search candidates
(mpc/gait_optimizer.cpp:688-721) and a producer/consumer thread pair
(controllers/mpc_controller.cpp).  The TPU-native scaling axes are:

* ``scenario``: independent MPC problems (disturbance-rejection batches,
  parallel robots, Monte-Carlo rollouts) — pure data parallelism, DCN-capable;
* ``alpha``: the gait-opt line-search lanes — vmapped locally and sharded
  across chips when wide.

Shardings are expressed with `jax.sharding.NamedSharding`; XLA inserts the
collectives (the argmin over the alpha axis becomes an all-reduce on ICI).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bilevel_gait_gen_tpu.mpc import solver as solver_mod
from bilevel_gait_gen_tpu.models.srb import SRBParams
from bilevel_gait_gen_tpu.utils.config import MPCConfig


def make_mesh(axis_sizes: Sequence[int] = None,
              axis_names: Sequence[str] = ("scenario",)) -> Mesh:
    """Build a mesh over all available devices (default: 1-D scenario axis)."""
    devs = np.array(jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devs),)
    return Mesh(devs.reshape(tuple(axis_sizes)), tuple(axis_names))


def shard_batch(tree, mesh: Mesh, axis: str = "scenario"):
    """Place a batched pytree with its leading axis sharded over `axis`."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def batched_solve_step(cfg: MPCConfig, params: SRBParams):
    """vmap of the real-time iteration over a scenario batch.

    Returns a jitted fn(states, x0s, t0, ee0s, x_des) -> (states, stats);
    under a sharded input batch this runs data-parallel across the mesh.
    """
    def step(state, x0, t0, ee0, x_des):
        return solver_mod.solve_step(cfg, params, state, x0, t0, ee0, x_des)

    return jax.jit(jax.vmap(step, in_axes=(0, 0, None, 0, None)))


def batched_gait_opt_update(cfg: MPCConfig, params: SRBParams):
    """vmap of the full bilevel update (QP gradient -> projection QP ->
    alpha line search) over a scenario batch.

    Reference cadence: MPCController::MPCUpdate runs this every
    gait_opt_freq MPC iterations (controllers/mpc_controller.cpp:286-399);
    here every scenario in the batch runs its own outer update in lockstep,
    each internally vmapping the ls_alphas line-search lanes.
    """
    from bilevel_gait_gen_tpu.mpc import bilevel as bilevel_mod

    def upd(state, x0, t0, ee0, x_des):
        return bilevel_mod.gait_opt_update(cfg, params, state, x0, t0, ee0,
                                           x_des)

    return jax.jit(jax.vmap(upd, in_axes=(0, 0, None, 0, None)))


def batched_initial_run(cfg: MPCConfig, params: SRBParams):
    def run(state, x0, ee0, x_des, t0):
        return solver_mod.create_initial_run(cfg, params, state, x0, ee0,
                                             x_des, t0)

    vrun = jax.vmap(run, in_axes=(0, 0, 0, None, None))

    @jax.jit
    def batched(states, x0s, ee0s, x_des, t0=0.0):
        return vrun(states, x0s, ee0s, x_des, jnp.asarray(t0))

    return batched
