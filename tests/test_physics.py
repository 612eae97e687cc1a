"""Unit tests for the 6-DOF integrator (the PyBullet replacement)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from tvc_ai_tpu.physics import ThrustControl, RigidBodyState, RocketParams, step
from tvc_ai_tpu.physics import quaternion as quat
from tvc_ai_tpu.physics.integrator import thrust_body_vector


def no_thrust():
    return ThrustControl(gimbal=jnp.zeros(2), thrust_active=jnp.bool_(False))


def full_thrust(pitch=0.0, yaw=0.0):
    return ThrustControl(
        gimbal=jnp.array([pitch, yaw], jnp.float32), thrust_active=jnp.bool_(True)
    )


def test_inertia_cylinder():
    p = RocketParams()
    inertia = p.inertia_body()
    m, r, l = 2.0, 0.05, 1.0
    assert np.isclose(float(inertia[0]), (1 / 12) * m * (3 * r**2 + l**2), rtol=1e-6)
    assert np.isclose(float(inertia[2]), 0.5 * m * r**2, rtol=1e-6)


def test_free_fall_double_gravity():
    """With the reference's double-gravity quirk, acceleration is ~2 g (minus drag/damping)."""
    params = RocketParams(double_gravity=True)
    state = RigidBodyState.create(pos=(0.0, 0.0, 100.0))
    for _ in range(25):  # 0.5 s
        state = step(state, no_thrust(), params)
    # analytic 2g drop: ½·19.62·0.25 ≈ 2.45 m (drag/damping shave a little)
    drop = 100.0 - float(state.pos[2])
    assert 2.2 < drop < 2.5
    assert float(state.vel[2]) < -9.0


def test_free_fall_single_gravity():
    params = RocketParams(double_gravity=False)
    state = RigidBodyState.create(pos=(0.0, 0.0, 100.0))
    for _ in range(25):
        state = step(state, no_thrust(), params)
    drop = 100.0 - float(state.pos[2])
    assert 1.1 < drop < 1.3  # ½·9.81·0.25 ≈ 1.23


def test_thrust_accelerates_upward_single_gravity():
    """35 N on 2 kg at 1 g (19.6 N weight) should climb."""
    params = RocketParams(double_gravity=False)
    state = RigidBodyState.create(pos=(0.0, 0.0, 10.0))
    for _ in range(25):
        state = step(state, full_thrust(), params)
    assert float(state.vel[2]) > 1.0
    assert float(state.pos[2]) > 10.0


def test_thrust_insufficient_under_double_gravity():
    """Reference quirk: 35 N < 39.2 N effective weight → the rocket sinks."""
    params = RocketParams(double_gravity=True)
    state = RigidBodyState.create(pos=(0.0, 0.0, 10.0))
    for _ in range(25):
        state = step(state, full_thrust(), params)
    assert float(state.vel[2]) < 0.0


def test_gimbal_produces_torque():
    """Off-axis thrust at the base must induce rotation."""
    params = RocketParams(double_gravity=False)
    state = RigidBodyState.create(pos=(0.0, 0.0, 50.0))
    for _ in range(10):
        state = step(state, full_thrust(pitch=0.2), params)
    assert float(jnp.linalg.norm(state.omega)) > 0.1
    assert float(quat.tilt_from_up(state.quat)) > 0.001


def test_thrust_vector_mapping():
    """Body thrust vector matches the reference formula (ref :539-543)."""
    t = 35.0
    v = thrust_body_vector(jnp.array([0.1, -0.2]), jnp.float32(t))
    expected = np.array(
        [t * np.sin(-0.2), t * np.sin(0.1), t * np.cos(0.1) * np.cos(-0.2)],
        dtype=np.float32,
    )
    assert np.allclose(v, expected, atol=1e-5)


def test_quaternion_stays_unit():
    params = RocketParams()
    state = RigidBodyState.create(pos=(0.0, 0.0, 50.0))
    for _ in range(50):
        state = step(state, full_thrust(pitch=0.3, yaw=-0.2), params)
    assert np.isclose(float(jnp.linalg.norm(state.quat)), 1.0, atol=1e-5)


def test_ground_contact_supports_rocket():
    """A rocket dropped from rest just above ground must settle near z≈0.5
    (half-length) rather than falling through the floor."""
    params = RocketParams(double_gravity=True)
    state = RigidBodyState.create(pos=(0.0, 0.0, 0.6))
    for _ in range(150):  # 3 s
        state = step(state, no_thrust(), params)
    assert float(state.pos[2]) > 0.40
    assert abs(float(state.vel[2])) < 0.5


def test_drag_opposes_motion():
    params = RocketParams(double_gravity=False, gravity=jnp.float32(0.0))
    state = RigidBodyState(
        pos=jnp.array([0.0, 0.0, 50.0]),
        quat=quat.IDENTITY,
        vel=jnp.array([10.0, 0.0, 0.0]),
        omega=jnp.zeros(3),
    )
    s1 = step(state, no_thrust(), params)
    assert float(s1.vel[0]) < 10.0
    assert float(s1.vel[0]) > 9.0


def test_wind_pushes():
    params = RocketParams(double_gravity=False, gravity=jnp.float32(0.0))
    state = RigidBodyState.create(pos=(0.0, 0.0, 50.0))
    s1 = step(
        state, no_thrust(), params,
        wind=jnp.array([3.0, 0.0, 0.0], jnp.float32),
    )
    assert float(s1.vel[0]) > 0.0


def test_batched_step_matches_single():
    import jax

    params = RocketParams()
    state = RigidBodyState.create(pos=(0.0, 0.0, 10.0))
    batched = jax.tree.map(lambda x: jnp.stack([x, x]), state)
    ctrl = full_thrust(0.1, 0.05)
    bctrl = ThrustControl(
        gimbal=jnp.stack([ctrl.gimbal, ctrl.gimbal]),
        thrust_active=jnp.stack([ctrl.thrust_active, ctrl.thrust_active]),
    )
    single = step(state, ctrl, params)
    double = jax.vmap(lambda s, c: step(s, c, params))(batched, bctrl)
    for leaf_s, leaf_b in zip(
        jax.tree.leaves(single), jax.tree.leaves(double)
    ):
        assert np.allclose(leaf_s, leaf_b[0], atol=1e-6)
        assert np.allclose(leaf_s, leaf_b[1], atol=1e-6)


def test_magnus_force_direction():
    """Opt-in Magnus lift: spin about +z with velocity +x gives a +y force
    (F ~ omega x v), absent when the flag is off (reference parity: the ref
    declares magnus_effect in config.yaml:356 but never implements it)."""
    from tvc_ai_tpu.physics.integrator import aero_wrench
    from tvc_ai_tpu.physics.types import RigidBodyState, RocketParams

    state = RigidBodyState(
        pos=jnp.array([0.0, 0.0, 5.0]),
        quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
        vel=jnp.array([3.0, 0.0, 0.0]),
        omega=jnp.array([0.0, 0.0, 10.0]),
    )
    off = aero_wrench(state, RocketParams())
    on = aero_wrench(state, RocketParams(magnus_effect=True))
    dy = float(on.force[1] - off.force[1])
    assert dy > 0.0  # omega(+z) x v(+x) = +y
    # magnitude matches C_m * rho * pi r^2 l * |omega x v|
    rho = 1.225 * math.exp(-5.0 / 8400.0)
    expected = rho * math.pi * 0.05**2 * 1.0 * 10.0 * 3.0
    assert dy == pytest.approx(expected, rel=1e-4)
    assert float(jnp.linalg.norm(on.force[0] - off.force[0])) == pytest.approx(
        0.0, abs=1e-6
    )


def test_ground_effect_boosts_thrust_near_pad():
    """Opt-in ground effect: effective thrust is higher near the ground and
    decays away from it; off = no change (ref config.yaml:357 parity)."""
    from tvc_ai_tpu.physics.integrator import ThrustControl, thrust_wrench
    from tvc_ai_tpu.physics.types import RigidBodyState, RocketParams

    def upright(alt):
        return RigidBodyState(
            pos=jnp.array([0.0, 0.0, alt]),
            quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
            vel=jnp.zeros(3),
            omega=jnp.zeros(3),
        )

    ctrl = ThrustControl(gimbal=jnp.zeros(2), thrust_active=jnp.bool_(True))
    one = jnp.float32(1.0)
    zero3 = jnp.zeros(3)
    p_on = RocketParams(ground_effect=True)
    p_off = RocketParams()
    low = thrust_wrench(upright(0.1), ctrl, p_on, one, zero3)
    high = thrust_wrench(upright(10.0), ctrl, p_on, one, zero3)
    base = thrust_wrench(upright(0.1), ctrl, p_off, one, zero3)
    assert float(low.force[2]) > float(high.force[2])
    assert float(low.force[2]) > float(base.force[2])
    # far from the pad the boost vanishes
    assert float(high.force[2]) == pytest.approx(35.0, rel=1e-3)
