"""Multi-robot model family tests: Mini-Cheetah quadruped + Adam biped.

Reference parity: models/ carries A1, Adam, and mini-cheetah descriptions
(SURVEY component #36); the MPC stack must build and solve for each.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bilevel_gait_gen_tpu.models import adam, mini_cheetah, rbd, srb
from bilevel_gait_gen_tpu.mpc import gait, solver
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.utils.config import MPCConfig


def test_mini_cheetah_model():
    m = mini_cheetah.make_mini_cheetah()
    q0 = jnp.asarray(mini_cheetah.stand_config(), jnp.float64)
    np.testing.assert_allclose(float(m.total_mass), 3.3 + 4 * (0.54 + 0.634 + 0.064),
                               atol=1e-4)
    feet = np.asarray(rbd.ee_positions(m, q0))
    assert feet.shape == (4, 3)
    assert np.all(feet[:, 2] < 0.05), feet[:, 2]
    M = np.asarray(rbd.mass_matrix(m, q0))
    assert np.all(np.linalg.eigvalsh(M) > 0)


def test_adam_model():
    m = adam.make_adam()
    q0 = jnp.asarray(adam.stand_config(), jnp.float64)
    assert m.num_ee == 2
    assert m.num_joints == 14
    feet = np.asarray(rbd.ee_positions(m, q0))
    assert np.all(feet[:, 2] < 0.12), feet[:, 2]
    # left/right symmetry
    np.testing.assert_allclose(feet[0, 0], feet[1, 0], atol=1e-5)
    np.testing.assert_allclose(feet[0, 1], -feet[1, 1], atol=1e-5)
    Ir = np.asarray(rbd.composite_inertia_about_com(m, q0))
    assert np.all(np.linalg.eigvalsh(Ir) > 0)


@pytest.mark.parametrize("family", ["mini_cheetah", "adam"])
def test_mpc_solves_for_family(family):
    """The full inner MPC runs on each robot family (reference: adam and
    mini-cheetah configs drive the same MPC classes)."""
    if family == "mini_cheetah":
        model = mini_cheetah.make_mini_cheetah()
        q0 = jnp.asarray(mini_cheetah.stand_config(), jnp.float64)
        num_ee = 4
        z0 = mini_cheetah.STAND_HEIGHT
    else:
        model = adam.make_adam()
        q0 = jnp.asarray(adam.stand_config(), jnp.float64)
        num_ee = 2
        z0 = adam.STAND_HEIGHT

    # biped single support needs peak forces > 2x mg (force ramps are pinned
    # to zero at contact boundaries), so the quadruped force bound of 150 N
    # would be structurally infeasible for Adam
    cfg = MPCConfig(num_nodes=10, num_ee=num_ee, ipm_iters=20,
                    force_bound=500.0).validate()
    params = srb.make_srb_params(model, q0)
    x0 = srb.reconstruct_state(params, q0, jnp.zeros(model.nv, jnp.float64))
    feet0 = rbd.ee_positions(model, q0)
    traj = default_trajectory(cfg, gait.make_trot(cfg), x0, feet0[:, :2])
    st = solver.SolverState(traj=traj,
                            ee_box=jnp.asarray(cfg.ee_box_size, jnp.float64))
    x_des = srb.manifold_to_tangent(x0)
    st, stats = solver.create_initial_run(cfg, params, st, x0, feet0, x_des)
    assert bool(stats.solved)
    assert float(stats.defect_l1) < 0.1
    z = np.asarray(st.traj.x_man[:, 2])
    assert np.all(np.abs(z - z0) < 0.15)
