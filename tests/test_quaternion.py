"""Unit tests for the quaternion core (xyzw layout, PyBullet conventions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvc_ai_tpu.physics import quaternion as quat


def random_unit_quat(rng, n=None):
    shape = (4,) if n is None else (n, 4)
    q = rng.standard_normal(shape).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_normalize_unit():
    q = jnp.array([1.0, 2.0, 3.0, 4.0])
    n = quat.normalize(q)
    assert np.isclose(float(jnp.linalg.norm(n)), 1.0, atol=1e-6)


def test_multiply_identity():
    rng = np.random.default_rng(0)
    q = jnp.asarray(random_unit_quat(rng))
    assert np.allclose(quat.multiply(quat.IDENTITY, q), q, atol=1e-6)
    assert np.allclose(quat.multiply(q, quat.IDENTITY), q, atol=1e-6)


def test_multiply_inverse_is_identity():
    rng = np.random.default_rng(1)
    q = jnp.asarray(random_unit_quat(rng))
    qq = quat.multiply(q, quat.conjugate(q))
    assert np.allclose(qq, quat.IDENTITY, atol=1e-6)


def test_rotate_matches_matrix():
    rng = np.random.default_rng(2)
    q = jnp.asarray(random_unit_quat(rng, 8))
    v = jnp.asarray(rng.standard_normal((8, 3)).astype(np.float32))
    r1 = quat.rotate(q, v)
    r2 = jnp.einsum("bij,bj->bi", quat.to_matrix(q), v)
    assert np.allclose(r1, r2, atol=1e-5)


def test_rotate_inverse_roundtrip():
    rng = np.random.default_rng(3)
    q = jnp.asarray(random_unit_quat(rng, 8))
    v = jnp.asarray(rng.standard_normal((8, 3)).astype(np.float32))
    assert np.allclose(quat.rotate_inverse(q, quat.rotate(q, v)), v, atol=1e-5)


def test_exp_map_zero_is_identity():
    dq = quat.exp_map(jnp.zeros(3))
    assert np.allclose(dq, quat.IDENTITY, atol=1e-7)


def test_exp_map_known_rotation():
    # 90° about z
    dq = quat.exp_map(jnp.array([0.0, 0.0, np.pi / 2]))
    expected = np.array([0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)])
    assert np.allclose(dq, expected, atol=1e-6)


def test_integrate_constant_omega():
    """Integrating ω=2π/T for T seconds returns to start."""
    q = quat.IDENTITY
    omega = jnp.array([0.0, 0.0, 2.0 * np.pi])  # one rev/s
    dt = 0.001
    for _ in range(1000):
        q = quat.integrate(q, omega, dt)
    # up to sign, back to identity
    assert min(
        float(jnp.linalg.norm(q - quat.IDENTITY)),
        float(jnp.linalg.norm(q + quat.IDENTITY)),
    ) < 1e-3


def test_euler_zyx_parity_with_scipy_convention():
    """Check roll/pitch/yaw extraction against a direct matrix construction."""
    roll, pitch, yaw = 0.3, -0.2, 0.7
    # build quaternion as Rz(yaw)Ry(pitch)Rx(roll)
    qx = quat.from_axis_angle(jnp.array([1.0, 0, 0]), jnp.asarray(roll))
    qy = quat.from_axis_angle(jnp.array([0.0, 1, 0]), jnp.asarray(pitch))
    qz = quat.from_axis_angle(jnp.array([0.0, 0, 1]), jnp.asarray(yaw))
    q = quat.multiply(qz, quat.multiply(qy, qx))
    e = quat.to_euler_zyx(q)
    assert np.allclose(e, [roll, pitch, yaw], atol=1e-5)


def test_tilt_zero_upright():
    assert float(quat.tilt_angle(quat.IDENTITY)) == pytest.approx(0.0, abs=1e-7)
    assert float(quat.tilt_from_up(quat.IDENTITY)) == pytest.approx(0.0, abs=1e-3)


def test_tilt_from_up_pure_pitch():
    q = quat.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.asarray(0.25))
    assert float(quat.tilt_from_up(q)) == pytest.approx(0.25, abs=1e-5)
    assert float(quat.tilt_angle(q)) == pytest.approx(0.25, abs=1e-5)


def test_random_tilt_quaternion_bounded():
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    qs = jax.vmap(lambda k: quat.random_tilt_quaternion(k, jnp.float32(0.3)))(keys)
    tilts = quat.tilt_from_up(qs)
    assert float(jnp.max(tilts)) <= 0.3 + 1e-5
