"""Control-stack tests: IK, whole-body QP, PD+grav, targets glue.

Reference analogs: IK is exercised through GetTargetsFromTraj
(controllers/mpc_controller.cpp:414-511); QPControl is validated by the
closed-loop demos.  Here: IK reaches commanded foot targets; the WBQP
produces torques that realize gravity support with feasible friction
forces; PD+grav holds the standing pose.
"""
import jax
import jax.numpy as jnp
import numpy as np

from bilevel_gait_gen_tpu.control import ik, wbqp
from bilevel_gait_gen_tpu.models import a1, rbd

MODEL = a1.make_a1()
Q0 = jnp.array(a1.stand_config(), dtype=jnp.float64)


def test_ik_reaches_targets():
    feet0 = rbd.ee_positions(MODEL, Q0)
    target = feet0 + jnp.array([0.03, 0.02, 0.02])
    q = ik.solve_ik(MODEL, Q0[0:3], Q0[3:7], target, Q0, iters=30)
    feet = rbd.ee_positions(MODEL, q)
    np.testing.assert_allclose(np.asarray(feet), np.asarray(target),
                               atol=2e-3)
    # joint limits respected
    assert np.all(np.asarray(q[7:]) >= np.asarray(MODEL.joint_lower) - 1e-9)
    assert np.all(np.asarray(q[7:]) <= np.asarray(MODEL.joint_upper) + 1e-9)


def test_ik_velocities_consistent():
    feet_vel = jnp.zeros((4, 3)).at[0, 2].set(0.1)
    v = ik.ik_velocities(MODEL, Q0, jnp.zeros(3), jnp.zeros(3), feet_vel)
    J = rbd.ee_jacobians(MODEL, Q0)
    got = jnp.einsum('eiv,v->ei', J, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(feet_vel),
                               atol=1e-4)


def test_wbqp_supports_weight():
    cfg = wbqp.WBQPConfig()
    contact = jnp.array([True, True, True, True])
    mg = float(MODEL.total_mass) * 9.81
    f_des = jnp.zeros((4, 3)).at[:, 2].set(mg / 4)
    tau = wbqp.compute_torques(MODEL, cfg, Q0, jnp.zeros(MODEL.nv), contact,
                               Q0, jnp.zeros(MODEL.nv), f_des)
    tau = np.asarray(tau)
    assert np.all(np.isfinite(tau))
    assert np.all(np.abs(tau) <= cfg.torque_bound + 1e-6)
    # standing still with perfect tracking: torques hold gravity; knee
    # torques should be substantial and symmetric-ish
    assert np.abs(tau).max() > 1.0
    # diagonal symmetry FL vs RR hip abduction
    np.testing.assert_allclose(abs(tau[0]), abs(tau[9]), rtol=0.5)


def test_pd_grav_holds_standing():
    tau = wbqp.pd_grav_comp(MODEL, Q0, jnp.zeros(MODEL.nv), Q0,
                            jnp.zeros(MODEL.nv))
    # gravity-compensation torques are nonzero (legs support the trunk)
    assert np.abs(np.asarray(tau)).max() > 0.5
    # with exact tracking the PD adds nothing: pure gravity term
    g = rbd.bias_forces(MODEL, Q0, jnp.zeros(MODEL.nv))
    np.testing.assert_allclose(np.asarray(tau), np.asarray(g[6:]), atol=1e-9)
