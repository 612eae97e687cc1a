"""Physics-fidelity evidence without PyBullet (round-1 VERDICT #5).

PyBullet cannot be installed in this offline image, so the trajectory-parity
suite (tests/test_pybullet_parity.py) is skip-gated. This file provides the
executable substitute: analytic and numerical-analysis properties every
correct implementation of THIS model must satisfy —

- dt-refinement convergence at the integrator's order (semi-implicit Euler
  is globally first-order: halving dt halves the error);
- exactness cases (constant-rate quaternion exponential integration,
  force-free linear motion);
- conservation laws in force-free flight;
- torque-free symmetric-top precession against the closed-form solution
  (gyroscopic term ON — the opt-in physically-correct mode; the default
  model matches Bullet's default of OMITTING the gyroscopic term, which is
  what the reference ran with, env/enhanced_rocket_tvc_env.py:324-352).

What this does and does not verify is documented in PARITY.md.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvc_ai_tpu.physics import quaternion as quat
from tvc_ai_tpu.physics.integrator import ThrustControl, step as physics_step
from tvc_ai_tpu.physics.types import RigidBodyState, RocketParams

COAST = ThrustControl(
    gimbal=jnp.zeros(2, jnp.float32), thrust_active=jnp.asarray(False)
)


def clean_params(**overrides) -> RocketParams:
    """Rocket params with every dissipative/external effect disabled so the
    analytic comparisons are exact: no gravity, no drag, no atmosphere
    damping, no Bullet body damping, one substep per step."""
    base = dict(
        gravity=jnp.float32(0.0),
        double_gravity=False,
        rho0=jnp.float32(0.0),
        linear_damping=jnp.float32(0.0),
        angular_damping=jnp.float32(0.0),
        substeps=1,
    )
    base.update(overrides)
    return RocketParams(**base)


def rollout(state: RigidBodyState, params: RocketParams, n: int) -> RigidBodyState:
    def body(s, _):
        return physics_step(s, COAST, params), None

    return jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=n)[0]
    )(state)


def high_state(omega=(0.0, 0.0, 0.0), vel=(0.0, 0.0, 0.0)) -> RigidBodyState:
    """Start far above the ground so contact never engages."""
    return RigidBodyState(
        pos=jnp.array([0.0, 0.0, 100.0], jnp.float32),
        quat=jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        vel=jnp.asarray(vel, jnp.float32),
        omega=jnp.asarray(omega, jnp.float32),
    )


# ------------------------------------------------------------- convergence


def test_ballistic_dt_convergence_first_order():
    """Free fall under (single) gravity: semi-implicit Euler's position error
    vs the analytic parabola is a·T·dt/2 — exactly first order, so halving
    dt halves the error."""
    T = 1.0
    g = 9.81
    v0 = 3.0
    z_exact = 100.0 + v0 * T - 0.5 * g * T * T

    errors = []
    for dt in (0.02, 0.01, 0.005):
        params = clean_params(gravity=jnp.float32(g), dt=dt)
        final = rollout(high_state(vel=(0, 0, v0)), params, int(round(T / dt)))
        errors.append(abs(float(final.pos[2]) - z_exact))

    r1 = errors[0] / errors[1]
    r2 = errors[1] / errors[2]
    assert 1.8 < r1 < 2.2, (errors, r1)
    assert 1.8 < r2 < 2.2, (errors, r2)
    # and the predicted leading error term a·T·dt/2 matches
    assert errors[0] == pytest.approx(g * T * 0.02 / 2, rel=0.05)


def test_constant_spin_orientation_exact():
    """Constant ω integrates orientation via the exponential map — exact for
    constant rates (error is pure float32 roundoff, not truncation)."""
    w = 1.3
    T = 2.0
    dt = 0.02
    params = clean_params(dt=dt)
    final = rollout(high_state(omega=(0, 0, w)), params, int(round(T / dt)))
    expected = quat.exp_map(jnp.array([0.0, 0.0, w * T]))
    # q and -q are the same rotation
    dot = abs(float(jnp.dot(final.quat, expected)))
    assert dot > 1.0 - 1e-5
    np.testing.assert_allclose(np.asarray(final.omega), [0, 0, w], atol=1e-6)


# ------------------------------------------------------------- conservation


def test_force_free_linear_momentum_exact():
    v0 = (0.7, -0.4, 0.2)
    params = clean_params(dt=0.02)
    final = rollout(high_state(vel=v0), params, 100)
    np.testing.assert_allclose(np.asarray(final.vel), v0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(final.pos), np.array([0, 0, 100.0]) + np.array(v0) * 2.0,
        atol=1e-3,  # float32 accumulation over 100 steps at |pos| ~ 100
    )


def test_principal_axis_spin_conserves_angular_momentum():
    """Spin about the symmetry axis: L = I_a·ω ẑ is constant in BOTH the
    default (no-gyro, Bullet-parity) and gyroscopic modes."""
    for gyro in (False, True):
        params = clean_params(dt=0.02, gyroscopic=gyro)
        final = rollout(high_state(omega=(0, 0, 2.0)), params, 200)
        np.testing.assert_allclose(
            np.asarray(final.omega), [0, 0, 2.0], atol=1e-5, err_msg=str(gyro)
        )


def test_rotational_energy_conserved_torque_free():
    """Torque-free tumble with the gyroscopic term: rotational kinetic energy
    ½ ω_b·(I ω_b) is an exact invariant of the continuous dynamics; the
    discrete drift must be small and shrink ~2x when dt halves."""
    params0 = clean_params(dt=0.0, gyroscopic=True)  # template
    inertia = np.asarray(params0.inertia_body(params0.mass))

    def energy(state):
        wb = np.asarray(quat.rotate_inverse(state.quat, state.omega))
        return 0.5 * float(wb @ (inertia * wb))

    w0 = (1.2, 0.0, 2.0)
    T = 1.0
    drifts = []
    for dt in (2e-3, 1e-3):
        params = clean_params(dt=dt, gyroscopic=True)
        final = rollout(high_state(omega=w0), params, int(round(T / dt)))
        e0 = energy(high_state(omega=w0))
        drifts.append(abs(energy(final) - e0) / e0)
    assert drifts[0] < 0.02, drifts
    ratio = drifts[0] / max(drifts[1], 1e-12)
    assert ratio > 1.5, (drifts, ratio)


def test_angular_momentum_conserved_torque_free_gyro():
    """World-frame L = R·(I ω_b) is conserved by the true dynamics; the
    integrator's drift is small and first-order in dt."""
    params0 = clean_params(dt=0.0)
    inertia = np.asarray(params0.inertia_body(params0.mass))

    def L_world(state):
        wb = np.asarray(quat.rotate_inverse(state.quat, state.omega))
        return np.asarray(quat.rotate(state.quat, jnp.asarray(inertia * wb)))

    w0 = (1.0, 0.3, 2.0)
    T = 1.0
    drifts = []
    for dt in (2e-3, 1e-3):
        params = clean_params(dt=dt, gyroscopic=True)
        final = rollout(high_state(omega=w0), params, int(round(T / dt)))
        L0 = L_world(high_state(omega=w0))
        drifts.append(
            float(np.linalg.norm(L_world(final) - L0) / np.linalg.norm(L0))
        )
    assert drifts[0] < 0.05, drifts
    assert drifts[0] / max(drifts[1], 1e-12) > 1.5, drifts


# ------------------------------------------------- analytic precession case


def test_symmetric_top_precession_matches_closed_form():
    """Torque-free symmetric top (I_xx = I_yy = I_t, I_zz = I_a): the
    body-frame transverse rate rotates at Ω_b = ω_z·(I_a − I_t)/I_t while
    |ω_⊥| and ω_z stay constant — the canonical gyroscopic-precession
    analytic case, integrated with the gyroscopic term enabled."""
    params = clean_params(dt=5e-4, gyroscopic=True)
    inertia = np.asarray(params.inertia_body(params.mass))
    I_t, I_a = inertia[0], inertia[2]
    wz = 2.0
    wx = 0.5
    omega_b_rate = wz * (I_a - I_t) / I_t  # rad/s, body frame

    T = 1.0
    final = rollout(
        high_state(omega=(wx, 0.0, wz)), params, int(round(T / params.dt))
    )
    wb = np.asarray(quat.rotate_inverse(final.quat, final.omega))

    # invariants
    assert wb[2] == pytest.approx(wz, rel=1e-3)
    assert np.hypot(wb[0], wb[1]) == pytest.approx(wx, rel=5e-3)
    # transverse phase advanced by Ω_b·T
    phase = np.arctan2(wb[1], wb[0])
    expected = omega_b_rate * T
    # compare on the circle
    diff = np.angle(np.exp(1j * (phase - expected)))
    assert abs(diff) < 0.02, (phase, expected)

    # and the DEFAULT (Bullet-parity) mode deliberately shows no precession
    params_ref = clean_params(dt=5e-4, gyroscopic=False)
    final_ref = rollout(
        high_state(omega=(wx, 0.0, wz)), params_ref, int(round(T / params_ref.dt))
    )
    np.testing.assert_allclose(
        np.asarray(final_ref.omega), [wx, 0.0, wz], atol=1e-5
    )


def test_gimbal_torque_angular_rate_exact():
    """Constant thrust torque about a principal axis: ω̇ = τ/I ⇒ ω(T) = τT/I.
    For a (nearly) attitude-independent torque the semi-implicit update is
    EXACT — the measured error must sit at float32 roundoff, independent of
    dt (T kept short so the attitude change stays negligible)."""
    thrust = 35.0
    gimbal_angle = 0.05  # rad, pitch
    T = 0.1
    params0 = clean_params(dt=0.0)
    inertia = np.asarray(params0.inertia_body(params0.mass))
    # pitch gimbal -> body-y thrust component, lever (0,0,-0.5):
    # τ = r x F = (-0.5 ẑ) x (F_y ŷ) = +0.5·F_y x̂
    f_y = thrust * np.sin(gimbal_angle)
    tau_x = 0.5 * f_y
    w_exact = tau_x * T / inertia[0]

    control = ThrustControl(
        gimbal=jnp.array([gimbal_angle, 0.0], jnp.float32),
        thrust_active=jnp.asarray(True),
    )

    def run(dt):
        params = clean_params(dt=dt)

        def body(s, _):
            return physics_step(s, control, params), None

        final = jax.jit(
            lambda s: jax.lax.scan(body, s, None, length=int(round(T / dt)))[0]
        )(high_state())
        return float(final.omega[0])

    errs = [abs(run(dt) - w_exact) for dt in (0.02, 0.01, 0.005)]
    for e in errs:
        assert e < 1e-5 * max(abs(w_exact), 1.0) + 1e-6, (errs, w_exact)
