"""Exact-value tests for the multi-objective reward (ref weights §2.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tvc_ai_tpu.env.reward import compute_reward
from tvc_ai_tpu.env.types import PHASE_BOOST, PHASE_LANDING, RewardConfig


def call(cfg=None, **overrides):
    defaults = dict(
        altitude=jnp.float32(3.0),
        tilt=jnp.float32(0.0),
        angular_velocity_mag=jnp.float32(0.0),
        fuel=jnp.float32(1.0),
        crashed=jnp.bool_(False),
        mission_successful=jnp.bool_(False),
        phase=jnp.int32(PHASE_BOOST),
        action=jnp.zeros(2),
        prev_action=jnp.zeros(2),
        has_prev_action=jnp.bool_(False),
        reward_window=jnp.zeros(10),
        reward_window_len=jnp.int32(0),
    )
    defaults.update(overrides)
    return compute_reward(cfg or RewardConfig(), **defaults)


def test_ideal_hover_components():
    total, _, _, comps = call()
    # perfectly stable at target altitude, zero action, full fuel:
    assert float(comps["safety_compliance"]) == pytest.approx(50.0, abs=1e-4)
    assert float(comps["fuel_efficiency"]) == pytest.approx(20.0, abs=1e-4)
    assert float(comps["stability_bonus"]) == pytest.approx(10.0, abs=1e-4)
    assert float(comps["control_smoothness"]) == pytest.approx(5.0, abs=1e-4)
    assert float(comps["altitude_maintenance"]) == pytest.approx(5.0, abs=1e-4)
    assert float(comps["mission_completion"]) == 0.0
    assert float(total) == pytest.approx(90.0, abs=1e-3)


def test_crash_penalty():
    total, _, _, comps = call(crashed=jnp.bool_(True), altitude=jnp.float32(0.05))
    assert float(comps["crash_penalty"]) == -1000.0
    # other (positive) components still sum in before the clip, like the reference
    expected = sum(float(v) for v in comps.values())
    assert float(total) == pytest.approx(max(min(expected, 200.0), -1000.0), abs=1e-3)
    assert float(total) < -900.0


def test_landing_phase_progress_reward():
    _, _, _, comps = call(phase=jnp.int32(PHASE_LANDING))
    assert float(comps["mission_completion"]) == pytest.approx(10.0, abs=1e-5)


def test_mission_success_reward():
    _, _, _, comps = call(mission_successful=jnp.bool_(True))
    assert float(comps["mission_completion"]) == pytest.approx(100.0, abs=1e-5)


def test_excessive_tilt_penalty():
    _, _, _, comps = call(tilt=jnp.float32(0.62))
    assert float(comps["excessive_tilt"]) == pytest.approx(-500.0 * 0.1, rel=1e-3)


def test_control_saturation_penalty():
    a = jnp.array([0.9, 0.5])  # |a| ≈ 1.03
    _, _, _, comps = call(action=a)
    mag = float(jnp.linalg.norm(a))
    assert float(comps["control_saturation"]) == pytest.approx(
        -50.0 * (mag - 0.9), rel=1e-4
    )


def test_smoothness_first_step_is_one():
    _, _, _, comps = call(
        action=jnp.array([1.0, -1.0]), has_prev_action=jnp.bool_(False)
    )
    assert float(comps["control_smoothness"]) == pytest.approx(5.0, abs=1e-5)


def test_smoothness_penalizes_jerk():
    _, _, _, comps = call(
        action=jnp.array([1.0, 1.0]),
        prev_action=jnp.array([-1.0, -1.0]),
        has_prev_action=jnp.bool_(True),
    )
    diff = float(jnp.linalg.norm(jnp.array([2.0, 2.0])))
    assert float(comps["control_smoothness"]) == pytest.approx(
        5.0 * np.exp(-5 * diff), rel=1e-4
    )


def test_reward_clip_ceiling():
    total, _, _, _ = call(mission_successful=jnp.bool_(True))
    assert float(total) <= 200.0


def test_window_rolls():
    _, window, wlen, _ = call()
    assert window.shape == (10,)
    assert int(wlen) == 1
    assert float(window[-1]) != 0.0


def test_variance_penalty_triggers():
    # alternate huge rewards to blow the 10-step variance past 1e4
    window = jnp.array([200.0, -1000.0] * 5)
    total_hi, _, _, comps = call(
        reward_window=window, reward_window_len=jnp.int32(50)
    )
    assert float(comps["anti_hacking"]) < -100.0
