"""Generate the pinned golden trajectory for the parity contract.

The reference's integration tests pin recorded rollouts and check later runs
against them at tight tolerance (test/mpc_test.cpp:41-270 semantics, with
the A1 walk config apps/a1_configuration.yaml: N=20, dt=0.05, trot).  The
C++ binary cannot be built here (no catkin/pinocchio toolchain in the
image), so the golden is generated ONCE from this repo's own f64 CPU path —
the most accurate configuration of the solver — and committed.
tests/test_parity.py then holds every future change (and the f32 production
path) to it.

Run:  python scripts/gen_golden.py        # rewrites tests/golden/a1_trot.npz
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def rollout(dtype):
    """Deterministic open-loop MPC rollout: initial SQP + 10 receding-horizon
    RTI steps, each advancing t0 by dt and taking x0 from the plan's next
    node (the reference's simulation-free MPC test loop semantics)."""
    from bilevel_gait_gen_tpu.models import a1, rbd, srb
    from bilevel_gait_gen_tpu.mpc import bilevel, gait, solver
    from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
    from bilevel_gait_gen_tpu.utils.config import MPCConfig

    cfg = MPCConfig().validate()        # N=20, dt=0.05 A1 walk config
    model = a1.make_a1()
    q0 = jnp.asarray(a1.stand_config(), dtype)
    params = srb.make_srb_params(model, q0)
    x0 = srb.reconstruct_state(params, q0, jnp.zeros(model.nv, dtype))
    feet0 = rbd.ee_positions(model, q0).astype(dtype)
    traj = default_trajectory(cfg, gait.make_trot(cfg), x0, feet0[:, :2])
    st = solver.SolverState(traj=traj,
                            ee_box=jnp.asarray(cfg.ee_box_size, dtype))
    x_des = srb.manifold_to_tangent(x0)
    st, stats0 = solver.create_initial_run(cfg, params, st, x0, feet0, x_des)

    xs, costs = [], []
    x_cur = x0
    for k in range(10):
        t0 = jnp.asarray(k * cfg.dt, dtype)
        st, stats = solver.solve_step(cfg, params, st, x_cur, t0, feet0,
                                      x_des)
        # next measured state = the plan's node-1 prediction (open loop)
        x_cur = st.traj.x_man[1]
        xs.append(np.asarray(x_cur, np.float64))
        costs.append(float(stats.cost))

    g = bilevel.outer_gradient(cfg, params, st.traj, x_cur,
                               jnp.asarray(10 * cfg.dt, dtype), feet0,
                               x_des, st.ee_box)
    return (np.stack(xs), np.asarray(costs, np.float64),
            np.asarray(g, np.float64), float(stats0.cost))


def main():
    xs, costs, grad, cost0 = rollout(jnp.float64)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden", "a1_trot.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, xs=xs, costs=costs, grad=grad, cost0=cost0)
    print(f"wrote {out}")
    print("final state:", xs[-1])
    print("costs:", costs)


if __name__ == "__main__":
    main()
