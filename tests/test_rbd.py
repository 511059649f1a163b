"""Rigid-body dynamics engine tests (FK, jacobians, mass matrix, bias).

The reference leans on Pinocchio for all of this; here the contract is
checked first-principles: jacobians vs finite differences, energy
conservation of the Lagrangian bias, composite inertia sanity.
"""
import jax
import jax.numpy as jnp
import numpy as np

from bilevel_gait_gen_tpu.models import a1, rbd

MODEL = a1.make_a1()
Q0 = jnp.array(a1.stand_config(), dtype=jnp.float64)


def test_total_mass():
    # trunk 6.0 + imu 0.001 + 4 * (0.696 + 1.013 + 0.166 + 0.06)
    np.testing.assert_allclose(float(MODEL.total_mass), 13.741, atol=1e-3)


def test_fk_feet_below_trunk():
    feet = rbd.ee_positions(MODEL, Q0)
    assert feet.shape == (4, 3)
    # standing: feet near the ground, symmetric
    assert np.all(np.asarray(feet[:, 2]) < 0.05)
    np.testing.assert_allclose(feet[0, 0], feet[1, 0], atol=1e-6)  # FL/FR x
    np.testing.assert_allclose(feet[0, 1], -feet[1, 1], atol=1e-6)  # mirror y


def test_hip_positions():
    hips = rbd.hip_positions(MODEL, Q0)
    np.testing.assert_allclose(np.asarray(hips[:, 0]),
                               [0.1805, 0.1805, -0.1805, -0.1805], atol=1e-6)
    np.testing.assert_allclose(np.asarray(hips[:, 1]),
                               [0.047, -0.047, 0.047, -0.047], atol=1e-6)


def test_ee_jacobian_matches_fd():
    rng = np.random.default_rng(0)
    q = Q0 + 0.0
    J = np.asarray(rbd.ee_jacobians(MODEL, q))
    eps = 1e-6
    for k in range(MODEL.nv):
        dq = np.zeros(MODEL.nv)
        dq[k] = eps
        qp = rbd.integrate_config(q, jnp.array(dq))
        qm = rbd.integrate_config(q, jnp.array(-dq))
        fd = (np.asarray(rbd.ee_positions(MODEL, qp))
              - np.asarray(rbd.ee_positions(MODEL, qm))) / (2 * eps)
        np.testing.assert_allclose(J[:, :, k], fd, atol=1e-5)


def test_mass_matrix_spd():
    M = np.asarray(rbd.mass_matrix(MODEL, Q0))
    np.testing.assert_allclose(M, M.T, atol=1e-8)
    w = np.linalg.eigvalsh(M)
    assert np.all(w > 1e-8)
    # top-left 3x3 block is total mass * I (world-frame base translation)
    np.testing.assert_allclose(M[:3, :3], float(MODEL.total_mass) * np.eye(3),
                               atol=1e-5)


def test_bias_is_gravity_at_rest():
    h = np.asarray(rbd.bias_forces(MODEL, Q0, jnp.zeros(MODEL.nv)))
    # at rest, bias = gravity generalized force; base z component = m*g
    np.testing.assert_allclose(h[2], 13.741 * 9.81, rtol=1e-3)
    np.testing.assert_allclose(h[0], 0.0, atol=1e-5)


def test_energy_consistency():
    """d/dt (T + U) == v . (M qdd) with qdd from zero applied force.

    Simulates the unforced system for one tiny step and checks energy drift
    is second order — validating mass matrix and bias jointly.
    """
    rng = np.random.default_rng(1)
    v = jnp.array(rng.standard_normal(MODEL.nv) * 0.3)
    q = Q0

    M = rbd.mass_matrix(MODEL, q)
    h = rbd.bias_forces(MODEL, q, v)
    qdd = jnp.linalg.solve(M, -h)

    dt = 1e-5
    q2 = rbd.integrate_config(q, dt * v)
    v2 = v + dt * qdd
    E1 = rbd.kinetic_energy(MODEL, q, v) + rbd.potential_energy(MODEL, q)
    E2 = rbd.kinetic_energy(MODEL, q2, v2) + rbd.potential_energy(MODEL, q2)
    assert abs(float(E2 - E1)) < 1e-6


def test_composite_inertia_about_com():
    Ir = np.asarray(rbd.composite_inertia_about_com(MODEL, Q0))
    np.testing.assert_allclose(Ir, Ir.T, atol=1e-9)
    w = np.linalg.eigvalsh(Ir)
    assert np.all(w > 0)
    # quadruped: Izz largest (mass spread in xy-plane)
    assert Ir[2, 2] > Ir[0, 0]


def test_urdf_parser_matches_programmatic_a1(tmp_path):
    """Parse the A1 URDF (if present) and compare against the built-in model."""
    import os
    path = "/root/reference/models/a1_description/urdf/a1.urdf"
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference URDF not available")
    from bilevel_gait_gen_tpu.models.urdf import load_urdf
    parsed = load_urdf(
        path,
        ee_frames=["FL_foot", "FR_foot", "RL_foot", "RR_foot"],
        hip_joints=["FL_hip_joint", "FR_hip_joint",
                    "RL_hip_joint", "RR_hip_joint"],
    )
    np.testing.assert_allclose(float(parsed.total_mass),
                               float(MODEL.total_mass), atol=1e-5)
    # remap the joint configuration: URDF document order differs from the
    # canonical FL, FR, RL, RR order of the programmatic model
    perm = [MODEL.joint_names.index(n) for n in parsed.joint_names]
    q_parsed = jnp.concatenate([Q0[:7], Q0[7:][jnp.array(perm)]])
    feet_a = rbd.ee_positions(parsed, q_parsed)
    feet_b = rbd.ee_positions(MODEL, Q0)
    # same EE order (FL, FR, RL, RR) and same kinematics
    np.testing.assert_allclose(feet_a, feet_b, atol=1e-5)
    Ir_a = rbd.composite_inertia_about_com(parsed, q_parsed)
    Ir_b = rbd.composite_inertia_about_com(MODEL, Q0)
    np.testing.assert_allclose(Ir_a, Ir_b, atol=1e-5)
