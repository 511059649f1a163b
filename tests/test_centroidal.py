"""Centroidal MPC variant tests (reference MPCCentroidal, components #3/#4):
per-node composite inertia, FK-constrained joint velocities, solvable QP.
"""
import jax
import jax.numpy as jnp
import numpy as np

from bilevel_gait_gen_tpu.control import ik
from bilevel_gait_gen_tpu.models import a1, rbd, srb
from bilevel_gait_gen_tpu.mpc import centroidal, gait
from bilevel_gait_gen_tpu.mpc.trajectory import default_trajectory
from bilevel_gait_gen_tpu.utils.config import MPCConfig

CFG = MPCConfig(num_nodes=8, ipm_iters=25).validate()
MODEL = a1.make_a1()
Q0 = jnp.array(a1.stand_config(), dtype=jnp.float64)
PARAMS = srb.make_srb_params(MODEL, Q0)
X0 = jnp.zeros(13).at[2].set(0.3).at[9].set(1.0)


def test_node_inertias_config_dependent():
    configs = jnp.stack([Q0, Q0.at[7].add(0.5), Q0.at[8].add(0.8)])
    Irs = centroidal.node_inertias(MODEL, configs)
    assert Irs.shape == (3, 3, 3)
    # moving a leg changes the composite inertia
    assert float(jnp.abs(Irs[1] - Irs[0]).max()) > 1e-4
    for I in np.asarray(Irs):
        assert np.all(np.linalg.eigvalsh(I) > 0)


def test_centroidal_qp_solves():
    feet0 = rbd.ee_positions(MODEL, Q0)
    traj = default_trajectory(CFG, gait.make_trot(CFG), X0, feet0[:, :2])
    configs = jnp.stack([Q0] * (CFG.num_nodes + 1))
    x_des = srb.manifold_to_tangent(X0)
    cqp = centroidal.assemble_centroidal(
        CFG, MODEL, PARAMS, traj, configs, X0, jnp.array(0.0), feet0,
        x_des, jnp.asarray(CFG.ee_box_size, jnp.float64))
    assert np.all(np.isfinite(np.asarray(cqp.H)))
    u, vj, sol = centroidal.solve_centroidal(cqp, iters=40, tol=1e-10)
    assert float(sol.gap) < 1e-5, float(sol.gap)
    assert float(sol.pri_res) < 1e-4, float(sol.pri_res)
    vj = vj.reshape(CFG.num_nodes, MODEL.num_joints)
    # joint velocities respect the bounds
    assert np.all(np.abs(np.asarray(vj)) <= float(MODEL.velocity_limit[0]) + 1e-6)
    # FK consistency at node 1: J_j vj ~ ee_vel - J_base twist
    qk = configs[1]
    J = rbd.ee_jacobians(MODEL, qk)
    got = np.asarray(jnp.einsum('eij,j->ei', J[:, :, 6:], vj[1]))
    assert np.all(np.isfinite(got))


def test_per_node_inertia_enters_dynamics():
    """The centroidal QP's dynamics must differ from the SRB QP's when the
    node configurations differ (configuration-dependent Ir_k, reference
    MPCCentroidal/CentroidalModel), and coincide when they don't."""
    from bilevel_gait_gen_tpu.mpc import qp as qp_mod
    feet0 = rbd.ee_positions(MODEL, Q0)
    traj = default_trajectory(CFG, gait.make_trot(CFG), X0, feet0[:, :2])
    x_des = srb.manifold_to_tangent(X0)
    box = jnp.asarray(CFG.ee_box_size, jnp.float64)
    base = qp_mod.assemble(CFG, PARAMS, traj, X0, jnp.array(0.0), feet0,
                           x_des, box)
    # same config at every node, nominal => identical to the SRB assembly
    Irs_same = centroidal.node_inertias(
        MODEL, jnp.stack([Q0] * (CFG.num_nodes + 1)))
    same = qp_mod.assemble(CFG, PARAMS, traj, X0, jnp.array(0.0), feet0,
                           x_des, box, node_inertia=Irs_same)
    # dynamics enter the condensed QP through H (cost over the propagated
    # states) and the EE-box G rows, not the foothold equality rows
    np.testing.assert_allclose(np.asarray(same.H), np.asarray(base.H),
                               atol=1e-9)
    # a bent leg at later nodes changes the dynamics rows
    configs = jnp.stack([Q0.at[7].add(0.4 * (k / CFG.num_nodes))
                         for k in range(CFG.num_nodes + 1)])
    Irs_bent = centroidal.node_inertias(MODEL, configs)
    bent = qp_mod.assemble(CFG, PARAMS, traj, X0, jnp.array(0.0), feet0,
                           x_des, box, node_inertia=Irs_bent)
    assert float(jnp.abs(bent.H - base.H).max()) > 1e-6
