"""Trajectory: the MPC solution container (pure pytree).

Replaces the reference's ``mpc::Trajectory`` (mpc/trajectory.cpp): N+1
manifold states + per-EE spline decision variables + the contact schedule.
Where the reference maps mutable spline objects to/from a flat QP vector
(SplinesAsVec / GetForceSplineIndex), here the flat layout is a fixed
ravel of two dense arrays and the mapping is `ravel_u` / `unravel_u`.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from bilevel_gait_gen_tpu.mpc.gait import GaitSchedule
from bilevel_gait_gen_tpu.utils.config import MPCConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Trajectory:
    """x_man: [N+1, 13] manifold states; f_nodes: [E, S, F-1, 3, 2];
    footholds: [E, S+1, 2]; sched: contact schedule."""
    x_man: jax.Array
    f_nodes: jax.Array
    footholds: jax.Array
    sched: GaitSchedule


def ravel_u(f_nodes: jax.Array, footholds: jax.Array) -> jax.Array:
    """Flat input vector [forces | positions] (reference variable layout:
    force spline vars then xy-position spline vars,
    mpc_single_rigid_body.cpp:267-273)."""
    return jnp.concatenate([f_nodes.reshape(-1), footholds.reshape(-1)])


def make_unravel(cfg: MPCConfig):
    E, S, F = cfg.num_ee, cfg.num_stance_slots, cfg.num_force_polys
    nf = cfg.num_force_vars

    def unravel(u: jax.Array):
        f_nodes = u[:nf].reshape(E, S, F - 1, 3, 2)
        footholds = u[nf:].reshape(E, cfg.num_footholds, 2)
        return f_nodes, footholds

    return unravel


def default_trajectory(cfg: MPCConfig, sched: GaitSchedule,
                       x0_man: jax.Array,
                       ee_xy: jax.Array) -> Trajectory:
    """Initial warm start: constant state, footholds at the current feet,
    force nodes zero (the reference warm start sets states constant and
    leaves splines zero too, mpc/mpc.cpp:700-728; `create_initial_run`'s
    SQP iterations then fill in gravity-supporting forces)."""
    E, S, F = cfg.num_ee, cfg.num_stance_slots, cfg.num_force_polys
    dtype = x0_man.dtype
    x_man = jnp.tile(x0_man[None, :], (cfg.num_nodes + 1, 1))
    f_nodes = jnp.zeros((E, S, F - 1, 3, 2), dtype=dtype)
    footholds = jnp.tile(ee_xy.astype(dtype)[:, None, :],
                         (1, cfg.num_footholds, 1))
    # schedule bounds follow the state dtype (x64 test runs would otherwise
    # leak float64 into the f32 pipeline)
    sched = GaitSchedule(bounds=sched.bounds.astype(dtype))
    return Trajectory(x_man=x_man, f_nodes=f_nodes, footholds=footholds,
                      sched=sched)
