"""Quaternion / manifold map tests.

Mirrors the reference's manifold round-trip tests (test/mpc_test.cpp:273-326).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bilevel_gait_gen_tpu.ops import quat


def rand_quat(rng):
    q = rng.standard_normal(4)
    return jnp.array(q / np.linalg.norm(q))


@pytest.mark.parametrize("seed", range(5))
def test_log_exp_roundtrip(seed):
    rng = np.random.default_rng(seed)
    q = rand_quat(rng)
    w = quat.log3(q)
    q2 = quat.exp3(w)
    # same rotation up to sign
    assert min(np.linalg.norm(q - q2), np.linalg.norm(q + q2)) < 1e-9


def test_exp_log_roundtrip_small_and_large():
    for scale in [1e-8, 1e-4, 0.1, 1.0, 3.0]:
        w = jnp.array([0.3, -0.4, 0.5]) * scale
        w2 = quat.log3(quat.exp3(w))
        np.testing.assert_allclose(w2, w, atol=1e-8)


def test_rotate_matches_matrix():
    rng = np.random.default_rng(0)
    q = rand_quat(rng)
    v = jnp.array(rng.standard_normal(3))
    np.testing.assert_allclose(quat.rotate(q, v), quat.to_matrix(q) @ v,
                               atol=1e-10)


def test_multiply_matches_matrix_product():
    rng = np.random.default_rng(1)
    q1, q2 = rand_quat(rng), rand_quat(rng)
    R = quat.to_matrix(quat.multiply(q1, q2))
    np.testing.assert_allclose(R, quat.to_matrix(q1) @ quat.to_matrix(q2),
                               atol=1e-10)


def test_log3_grad_finite_at_identity():
    g = jax.jacobian(quat.log3)(jnp.array([0.0, 0.0, 0.0, 1.0]))
    assert np.all(np.isfinite(g))
    # d log3 / d qv = 2 I at identity
    np.testing.assert_allclose(g[:, :3], 2 * np.eye(3), atol=1e-6)


def test_exp3_grad_finite_at_zero():
    g = jax.jacobian(quat.exp3)(jnp.zeros(3))
    assert np.all(np.isfinite(g))
    np.testing.assert_allclose(g[:3, :], 0.5 * np.eye(3), atol=1e-6)


def test_yaw():
    q = quat.from_euler_zyx(jnp.array([0.0, 0.0, 0.7]))
    np.testing.assert_allclose(quat.yaw(q), 0.7, atol=1e-10)
