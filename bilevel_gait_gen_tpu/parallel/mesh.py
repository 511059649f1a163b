"""Device-mesh scaling: scenario-batched MPC over jax.sharding (L9).

The reference has no distributed runtime — its only parallelism is a
10-thread OpenMP fork-join over line-search candidates
(mpc/gait_optimizer.cpp:688-721) and a producer/consumer thread pair
(controllers/mpc_controller.cpp).  The TPU-native scaling axes are:

* ``scenario``: independent MPC problems (disturbance-rejection batches,
  parallel robots, Monte-Carlo rollouts) — pure data parallelism, DCN-capable;
* ``alpha``: the gait-opt line-search lanes — vmapped locally, and sharded
  across chips via `alpha_sharded_gait_opt_update` (shard_map over a 2-axis
  {scenario, alpha} mesh; the cross-shard argmin is one tiny all_gather on
  ICI).

Shardings are expressed with `jax.sharding.NamedSharding` / `shard_map`;
XLA inserts the collectives.
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


def batched_solve_chain(cfg: MPCConfig, params: SRBParams, n_steps: int):
    """`n_steps` chained batched RTIs inside ONE jitted scan.

    The multi-process scaling measurement needs this: on the CPU
    jax.distributed backend every dispatch of a computation over a
    multi-process mesh pays a cross-process coordination cost measured at
    ~0.4 s (2 procs) — 30x the tiny-config step compute — so timing
    per-dispatch steps measures the rendezvous, not the scaling.  Chaining
    the steps in-graph amortizes one dispatch over the whole chain, which
    is also how a real TPU-pod control loop runs (the scan stays
    on-device).  Returns a jitted fn(states, x0s, t0, ee0s, x_des) ->
    (states, last_stats).
    """
    def step(state, x0, t0, ee0, x_des):
        return solver_mod.solve_step(cfg, params, state, x0, t0, ee0, x_des)

    vstep = jax.vmap(step, in_axes=(0, 0, None, 0, None))

    @jax.jit
    def chain(states, x0s, t0, ee0s, x_des):
        def body(s, k):
            s2, stats = vstep(s, x0s, t0 + k * cfg.dt, ee0s, x_des)
            return s2, None

        states, _ = jax.lax.scan(body, states, jnp.arange(n_steps))
        s2, stats = vstep(states, x0s, t0 + n_steps * cfg.dt, ee0s, x_des)
        return s2, stats

    return chain


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


def alpha_sharded_gait_opt_update(cfg: MPCConfig, params: SRBParams,
                                  mesh: Mesh,
                                  scenario_axis: str = "scenario",
                                  alpha_axis: str = "alpha"):
    """Bilevel update with the line-search lanes sharded over the mesh's
    ``alpha`` axis and scenarios data-parallel over ``scenario``.

    This is the TPU-native replacement for the reference's 10-OpenMP-thread
    line search (gait_optimizer.cpp:688-721) at multi-chip scale: each
    alpha-shard assembles + solves its disjoint slice of candidate QPs
    locally; the winner crosses shards in one small all_gather (a few
    objectives + one QPSolution per shard) over ICI.  Requires
    cfg.ls_alphas (total lanes, alpha=0 included) divisible by the
    alpha-axis size.

    Returns a jitted fn(states, x0s, t0, ee0s, x_des) -> GaitOptResult with
    batched leaves; inputs carry a leading scenario-batch axis (sharded or
    not — shard_map fixes the layout).
    """
    import functools

    from bilevel_gait_gen_tpu.mpc import bilevel as bilevel_mod

    # the replication check must be off: the argmin result IS replicated
    # over the alpha axis (identical on every shard after the all_gather),
    # but jax's varying-axis tracking cannot prove it.  kwarg name differs
    # across jax versions (check_vma >= 0.8, check_rep before).
    try:
        shard_map = functools.partial(jax.shard_map, check_vma=False)
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
        shard_map = functools.partial(shard_map, check_rep=False)

    def upd_one(state, x0, t0, ee0, x_des):
        return bilevel_mod.gait_opt_update(cfg, params, state, x0, t0, ee0,
                                           x_des, ls_axis_name=alpha_axis)

    vupd = jax.vmap(upd_one, in_axes=(0, 0, None, 0, None))

    # state/x0/ee0 batches are sharded over scenario and REPLICATED over
    # alpha (every alpha-shard sees the same scenarios; lanes differ via
    # axis_index inside _lane_search).  The result is identical on every
    # alpha shard after the all_gather argmin, so the out_spec drops the
    # alpha axis by keeping one copy.
    in_spec = (P(scenario_axis), P(scenario_axis), P(), P(scenario_axis),
               P())
    out_spec = P(scenario_axis)

    sharded = shard_map(vupd, mesh=mesh, in_specs=in_spec,
                        out_specs=out_spec)
    return jax.jit(sharded)


def batched_initial_run(cfg: MPCConfig, params: SRBParams):
    def run(state, x0, ee0, x_des, t0):
        return solver_mod.create_initial_run(cfg, params, state, x0, ee0,
                                             x_des, t0)

    vrun = jax.vmap(run, in_axes=(0, 0, 0, None, None))

    @jax.jit
    def batched(states, x0s, ee0s, x_des, t0=0.0):
        return vrun(states, x0s, ee0s, x_des, jnp.asarray(t0))

    return batched


def scenario_sharded_closed_loop(model, params, cfg: MPCConfig, wb_cfg,
                                 sim, mesh: Mesh, *, n_ticks: int,
                                 control_dt: float, mpc_every: int,
                                 scenario_axis: str = "scenario"):
    """The WHOLE closed loop — penalty physics + whole-body QP + MPC RTIs
    (sim/engine.py::closed_loop) — sharded over scenarios on a device
    mesh: a fleet of robots, one full control stack per scenario, zero
    cross-scenario communication (pure data parallelism riding ICI
    placement; the reference runs exactly ONE robot per process).

    Returns a jitted f(states, q0s, v0s, x_des_tans) -> (states, SimLog)
    with every argument/result batched on the leading scenario axis and
    sharded over ``scenario_axis``.
    """
    import functools

    from bilevel_gait_gen_tpu.sim import engine as engine_mod

    try:
        shard_map = functools.partial(jax.shard_map, check_vma=False)
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
        shard_map = functools.partial(shard_map, check_rep=False)

    def one(state, q0, v0, x_des_tan):
        return engine_mod.closed_loop(
            model, params, cfg, wb_cfg, sim, state, q0, v0, x_des_tan,
            n_ticks=n_ticks, control_dt=control_dt, mpc_every=mpc_every)

    vloop = jax.vmap(one, in_axes=(0, 0, 0, 0))
    sharded = shard_map(vloop, mesh=mesh,
                        in_specs=(P(scenario_axis),) * 4,
                        out_specs=P(scenario_axis))
    return jax.jit(sharded)
