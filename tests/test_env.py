"""Environment contract tests — functional core.

Mirrors the behavioral contract of the reference suite
(tests/test_environment.py: spaces, reset invariants, step 5-tuple,
randomization variance, reward finiteness, termination bounds).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvc_ai_tpu.env import (
    ACTION_DIM,
    OBS_DIM,
    EnvParams,
    RandomizationConfig,
)
from tvc_ai_tpu.env import rocket_env


@pytest.fixture(scope="module")
def params():
    return EnvParams()


@pytest.fixture(scope="module")
def jit_step():
    return jax.jit(rocket_env.step)


def test_reset_observation(params):
    state, obs = rocket_env.reset(jax.random.PRNGKey(0), params)
    assert obs.shape == (OBS_DIM,)
    # unit quaternion
    assert np.isclose(float(jnp.linalg.norm(obs[:4])), 1.0, atol=1e-5)
    # fuel full, phase boost (0), progress 0
    assert float(obs[7]) == 1.0
    assert float(obs[8]) == 0.0
    assert float(obs[9]) == 0.0
    assert int(state.step_count) == 0


def test_step_returns_finite(params, jit_step):
    state, _ = rocket_env.reset(jax.random.PRNGKey(1), params)
    action = jnp.array([0.3, -0.5])
    state, out = jit_step(state, action, params)
    assert out.obs.shape == (OBS_DIM,)
    assert np.all(np.isfinite(out.obs))
    assert np.isfinite(float(out.reward))
    assert out.terminated.dtype == jnp.bool_
    assert out.truncated.dtype == jnp.bool_


def test_action_clipping(params, jit_step):
    state, _ = rocket_env.reset(jax.random.PRNGKey(2), params)
    s1, o1 = jit_step(state, jnp.array([5.0, -5.0]), params)
    s2, o2 = jit_step(state, jnp.array([1.0, -1.0]), params)
    assert np.allclose(o1.obs, o2.obs, atol=1e-6)


def test_fuel_decreases(params, jit_step):
    state, _ = rocket_env.reset(jax.random.PRNGKey(3), params)
    for i in range(5):
        state, out = jit_step(state, jnp.zeros(ACTION_DIM), params)
    assert float(state.fuel) == pytest.approx(1.0 - 5 * 0.001, abs=1e-6)


def test_reward_in_clip_range(params, jit_step):
    state, _ = rocket_env.reset(jax.random.PRNGKey(4), params)
    key = jax.random.PRNGKey(5)
    for i in range(50):
        key, k = jax.random.split(key)
        action = jax.random.uniform(k, (2,), minval=-1.0, maxval=1.0)
        state, out = jit_step(state, action, params)
        r = float(out.reward)
        assert -1000.0 <= r <= 200.0
        if bool(out.terminated):
            break


def test_tilt_termination(params, jit_step):
    """Hard gimbal should tip the rocket past 30° and terminate."""
    state, _ = rocket_env.reset(jax.random.PRNGKey(6), params)
    terminated = False
    for i in range(300):
        state, out = jit_step(state, jnp.array([1.0, 1.0]), params)
        if bool(out.terminated):
            terminated = True
            break
    assert terminated
    assert float(out.tilt) > 0.5 or bool(out.crashed)


def test_truncation_at_max_steps():
    params = EnvParams(max_episode_steps=10)
    state, _ = rocket_env.reset(jax.random.PRNGKey(7), params)
    step_fn = jax.jit(rocket_env.step)
    for i in range(10):
        state, out = step_fn(state, jnp.zeros(2), params)
    assert bool(out.truncated)


def test_progress_observation_increases(params, jit_step):
    state, _ = rocket_env.reset(jax.random.PRNGKey(8), params)
    state, o1 = jit_step(state, jnp.zeros(2), params)
    state, o2 = jit_step(state, jnp.zeros(2), params)
    assert float(o2.obs[9]) > float(o1.obs[9])


def test_domain_randomization_varies_mass():
    """Legacy contract: randomized resets draw different masses
    (ref tests/test_environment.py:103-122)."""
    params = EnvParams(randomization=RandomizationConfig(enabled=True))
    keys = jax.random.split(jax.random.PRNGKey(9), 16)
    states, _ = jax.vmap(rocket_env.reset, in_axes=(0, None))(keys, params)
    masses = np.asarray(states.dr.mass)
    assert masses.std() > 0.01
    assert np.all(masses > 2.0 * 0.65) and np.all(masses < 2.0 * 1.35)


def test_sensor_noise_perturbs_observation():
    params = EnvParams(
        randomization=RandomizationConfig(enabled=True, sensor_noise_enabled=True)
    )
    state, _ = rocket_env.reset(jax.random.PRNGKey(10), params)
    step_fn = jax.jit(rocket_env.step)
    _, o1 = step_fn(state, jnp.zeros(2), params)
    # same state, same action, different noise key after a second step
    s2, _ = step_fn(state, jnp.zeros(2), params)
    _, o2 = step_fn(s2.replace(body=state.body, step_count=state.step_count), jnp.zeros(2), params)
    assert not np.allclose(o1.obs[:7], o2.obs[:7])


def test_autoreset_starts_fresh_episode():
    params = EnvParams(max_episode_steps=3)
    state, _ = rocket_env.reset(jax.random.PRNGKey(11), params)
    step_fn = jax.jit(rocket_env.step_autoreset)
    for i in range(3):
        state, out, next_obs = step_fn(state, jnp.array([1.0, 1.0]), params)
    assert bool(out.terminated) or bool(out.truncated)
    assert int(state.step_count) == 0  # fresh episode carried
    assert float(state.fuel) == 1.0
    # next policy obs is the fresh episode's first obs: progress == 0
    assert float(next_obs[9]) == 0.0


def test_batched_episode_rollout(params):
    n = 32
    keys = jax.random.split(jax.random.PRNGKey(12), n)
    states, obs = jax.vmap(rocket_env.reset, in_axes=(0, None))(keys, params)
    step_fn = jax.jit(jax.vmap(rocket_env.step_autoreset, in_axes=(0, 0, None)))
    key = jax.random.PRNGKey(13)
    for i in range(20):
        key, k = jax.random.split(key)
        actions = jax.random.uniform(k, (n, 2), minval=-1, maxval=1)
        states, out, obs = step_fn(states, actions, params)
    assert obs.shape == (n, OBS_DIM)
    assert np.all(np.isfinite(np.asarray(out.reward)))


def test_phase_transition_boost_to_coast(params, jit_step):
    """Phase flips to COAST when fuel < 0.8 (ref :642-644); the observation's
    phase slot lags by one step (reference ordering quirk)."""
    from tvc_ai_tpu.env.types import PHASE_COAST

    state, _ = rocket_env.reset(jax.random.PRNGKey(14), params)
    # fast-forward fuel so post-burn fuel is clearly below the 0.8 threshold
    state = state.replace(fuel=jnp.float32(0.79))
    state, out = jit_step(state, jnp.zeros(2), params)
    assert int(state.phase) == PHASE_COAST
    assert int(out.phase) == PHASE_COAST


def test_actuator_delay_shifts_response():
    """With the delay flag, step 1's physics consume step 0's action."""
    from tvc_ai_tpu.env.types import RandomizationConfig as RC

    delayed = EnvParams(randomization=RC(actuator_delay=True))
    normal = EnvParams()
    s_d, _ = rocket_env.reset(jax.random.PRNGKey(20), delayed)
    s_n, _ = rocket_env.reset(jax.random.PRNGKey(20), normal)
    hard = jnp.array([1.0, 0.0])
    # delayed env: first hard action applies NO gimbal (pending buffer empty)
    s_d1, out_d = rocket_env.step(s_d, hard, delayed)
    s_n1, out_n = rocket_env.step(s_n, hard, normal)
    assert float(out_d.angular_velocity_mag) < float(out_n.angular_velocity_mag)
    assert float(out_d.angular_velocity_mag) == pytest.approx(0.0, abs=1e-5)
    # second step: the delayed env now applies the hard action
    s_d2, out_d2 = rocket_env.step(s_d1, jnp.zeros(2), delayed)
    assert float(out_d2.angular_velocity_mag) > 0.01


def test_sensor_noise_uniform_randomizes_per_episode():
    """sensor_noise_uniform: per-episode sigma ~ U[0, sensor_noise_std] so a
    single policy covers both the sterile and full-noise worlds."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tvc_ai_tpu.env.randomization import sample_domain_params
    from tvc_ai_tpu.env.types import RandomizationConfig
    from tvc_ai_tpu.physics.types import RocketParams

    rocket = RocketParams()
    cfg = RandomizationConfig(
        enabled=False, sensor_noise_enabled=True, sensor_noise_uniform=True
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    stds = np.asarray(
        jax.vmap(lambda k: sample_domain_params(k, rocket, cfg).sensor_noise_std)(
            keys
        )
    )
    assert stds.min() >= 0.0 and stds.max() <= 0.02
    assert stds.std() > 0.003  # actually varies
    assert np.unique(np.round(stds, 8)).size > 100

    cfg_fixed = RandomizationConfig(
        enabled=False, sensor_noise_enabled=True, sensor_noise_uniform=False
    )
    stds_fixed = np.asarray(
        jax.vmap(
            lambda k: sample_domain_params(k, rocket, cfg_fixed).sensor_noise_std
        )(keys)
    )
    assert np.allclose(stds_fixed, 0.02)


def test_feasible_only_sampling():
    """feasible_only: every drawn plant admits SOME controller that can hold
    the strict success window — no climb-away (thrust > weight), no
    friction-pinning, no equilibrium tilt past the limit (the measured
    controller-independent infeasible classes, RESULTS.md r4). The
    unfiltered suite box is ~56% infeasible, so 256 clean draws is a
    decisive check (P(all feasible unfiltered) ~ 0.44^256)."""
    import jax
    import numpy as np

    from tvc_ai_tpu.env.randomization import (
        feasible_draw_mask,
        sample_domain_params,
    )
    from tvc_ai_tpu.env.types import RandomizationConfig
    from tvc_ai_tpu.physics.types import RocketParams

    rocket = RocketParams()
    box = dict(
        mass_variation=jnp.float32(0.3),
        thrust_variation=jnp.float32(0.2),
        cg_offset_max=jnp.float32(0.05),
        wind_max=jnp.float32(3.0),
    )
    keys = jax.random.split(jax.random.PRNGKey(11), 256)

    cfg = RandomizationConfig(enabled=True, feasible_only=True, **box)
    dr = jax.vmap(lambda k: sample_domain_params(k, rocket, cfg))(keys)
    ok = np.asarray(
        feasible_draw_mask(
            dr.mass, dr.thrust_scale, dr.cg_offset, rocket,
            cfg.feasible_tilt_limit,
        )
    )
    assert ok.all(), f"{(~ok).sum()} infeasible draws leaked through"
    # still actually randomized (not collapsed onto the nominal fallback)
    assert np.asarray(dr.mass).std() > 0.05
    assert np.abs(np.asarray(dr.cg_offset)[:, :2]).max() > 0.02

    # the unfiltered box draws infeasible plants (the thing being fixed)
    cfg_raw = RandomizationConfig(enabled=True, **box)
    dr_raw = jax.vmap(lambda k: sample_domain_params(k, rocket, cfg_raw))(keys)
    ok_raw = np.asarray(
        feasible_draw_mask(
            dr_raw.mass, dr_raw.thrust_scale, dr_raw.cg_offset, rocket,
            cfg.feasible_tilt_limit,
        )
    )
    assert 0.2 < ok_raw.mean() < 0.8  # ~44% measured


def test_progress_rate_randomization():
    """progress_rate ~ U[min, max] scales the progress observation's slope so
    evaluation horizons the policy never trained on stay in-distribution
    (a 1000-step-trained policy reads a 2000-step horizon's halved progress
    slope as OOD — measured 100%->0% success)."""
    from tvc_ai_tpu.env.randomization import sample_domain_params
    from tvc_ai_tpu.env.types import RandomizationConfig
    from tvc_ai_tpu.physics.types import RocketParams

    rocket = RocketParams()
    cfg = RandomizationConfig(
        enabled=True,
        mass_variation=jnp.float32(0.0),
        thrust_variation=jnp.float32(0.0),
        cg_offset_max=jnp.float32(0.0),
        wind_max=jnp.float32(0.0),
        progress_rate_randomized=True,
        progress_rate_min=jnp.float32(0.5),
        progress_rate_max=jnp.float32(2.0),
    )
    keys = jax.random.split(jax.random.PRNGKey(3), 256)
    rates = np.asarray(
        jax.vmap(lambda k: sample_domain_params(k, rocket, cfg).progress_rate)(keys)
    )
    assert rates.min() >= 0.5 and rates.max() <= 2.0
    assert rates.std() > 0.2

    # default range degenerates to the nominal slope
    nominal = sample_domain_params(
        jax.random.PRNGKey(0), rocket, RandomizationConfig(enabled=True)
    )
    assert float(nominal.progress_rate) == pytest.approx(1.0)

    # the progress obs slot (index 9) actually follows the drawn rate
    params = EnvParams(randomization=cfg)
    state, _ = rocket_env.reset(jax.random.PRNGKey(7), params)
    rate = float(state.dr.progress_rate)
    obs = None
    for _ in range(10):
        state, out = rocket_env.step(state, jnp.zeros(2), params)
        obs = out.obs
    expected = min(1.0, 10 * rate / params.max_episode_steps)
    assert float(obs[9]) == pytest.approx(expected, abs=1e-5)


def test_progress_rate_and_actuator_delay_reachable_from_config():
    """Config/CLI users can turn the new DR axes on (no silent no-ops)."""
    from tvc_ai_tpu.config import load_config
    from tvc_ai_tpu.config.build import build_env_params

    cfg = load_config(
        None,
        overrides=[
            "env.domain_randomization.progress_rate_min=0.5",
            "env.domain_randomization.progress_rate_max=2.0",
            "env.domain_randomization.actuator_delay=true",
        ],
    )
    params = build_env_params(cfg)
    assert float(params.randomization.progress_rate_min) == pytest.approx(0.5)
    assert float(params.randomization.progress_rate_max) == pytest.approx(2.0)
    assert params.randomization.actuator_delay is True


def test_sensor_dropout_holds_last_imu():
    """sensor_dropout_prob=1: the IMU channels (obs[:7]) freeze at the reset
    reading while the true state keeps evolving (hold-last fault injection —
    ref GUIDE/Config-guide/CONFIG_GUIDE.md:93-96 spec, unimplemented there).
    The non-IMU channels (fuel/phase/progress) keep updating."""
    from tvc_ai_tpu.env.types import RandomizationConfig as RC

    drop = EnvParams(
        randomization=RC(sensor_dropout_enabled=True, sensor_dropout_prob=jnp.float32(1.0))
    )
    state, obs0 = rocket_env.reset(jax.random.PRNGKey(5), drop)
    hard = jnp.array([1.0, 0.3])
    obs = None
    for _ in range(5):
        state, out = rocket_env.step(state, hard, drop)
        obs = out.obs
    assert np.allclose(np.asarray(obs[:7]), np.asarray(obs0[:7]))
    assert float(obs[9]) > 0.0  # progress still advances
    # true state diverged from the frozen reading
    assert float(jnp.linalg.norm(state.body.omega)) > 1e-3

    # prob 0 (default): IMU tracks the true state again
    clean = EnvParams()
    state, obs0 = rocket_env.reset(jax.random.PRNGKey(5), clean)
    for _ in range(5):
        state, out = rocket_env.step(state, hard, clean)
    assert not np.allclose(np.asarray(out.obs[:7]), np.asarray(obs0[:7]))


def test_sensor_dropout_reachable_from_config():
    from tvc_ai_tpu.config import load_config
    from tvc_ai_tpu.config.build import build_env_params

    cfg = load_config(
        None,
        overrides=[
            "env.domain_randomization.sensor_dropout_prob=0.01",
            "env.magnus_effect=true",
            "env.ground_effect=true",
        ],
    )
    params = build_env_params(cfg)
    assert float(params.randomization.sensor_dropout_prob) == pytest.approx(0.01)
    assert params.rocket.magnus_effect is True
    assert params.rocket.ground_effect is True


def test_dr_prob_mixture():
    """dr_prob gates the hard physical axes per episode: at 0.5 roughly half
    the draws are nominal physics; dither axes (noise level, progress slope)
    stay randomized either way. Keeps the success-signal dense while
    training robustness (see RandomizationConfig.dr_prob)."""
    from tvc_ai_tpu.env.randomization import sample_domain_params
    from tvc_ai_tpu.env.types import RandomizationConfig
    from tvc_ai_tpu.physics.types import RocketParams

    rocket = RocketParams()
    cfg = RandomizationConfig(
        enabled=True,
        sensor_noise_enabled=True,
        sensor_noise_uniform=True,
        dr_prob=jnp.float32(0.5),
        dr_mixture_enabled=True,
        progress_rate_randomized=True,
        progress_rate_min=jnp.float32(0.5),
        progress_rate_max=jnp.float32(2.0),
    )
    keys = jax.random.split(jax.random.PRNGKey(11), 512)
    dps = jax.vmap(lambda k: sample_domain_params(k, rocket, cfg))(keys)
    nominal = np.isclose(np.asarray(dps.mass), float(rocket.mass))
    frac = nominal.mean()
    assert 0.4 < frac < 0.6
    # nominal-physics episodes still draw noise/progress dither
    assert np.asarray(dps.sensor_noise_std)[nominal].std() > 1e-3
    assert np.asarray(dps.progress_rate)[nominal].std() > 0.1
    # wind/cg/thrust also nominal on those draws
    assert np.allclose(np.asarray(dps.wind)[nominal], 0.0)
    assert np.allclose(np.asarray(dps.thrust_scale)[nominal], 1.0)
    # dr_prob=1 (default) -> every draw randomized
    cfg_full = RandomizationConfig(enabled=True)
    dps_full = jax.vmap(lambda k: sample_domain_params(k, rocket, cfg_full))(keys)
    assert (~np.isclose(np.asarray(dps_full.mass), float(rocket.mass))).mean() > 0.95


def test_terminate_on_success_flag():
    """terminate_on_success=False (training-incentive mode): the episode
    continues after mission success; the sticky flag still records it, and
    the survival payout is still paid exactly once. Default True = parity."""
    import dataclasses as dc

    from tvc_ai_tpu.env.types import SuccessConfig, TerminationConfig

    easy = SuccessConfig(
        max_tilt_angle=jnp.float32(1.0),
        max_angular_velocity=jnp.float32(10.0),
        max_horizontal_velocity=jnp.float32(10.0),
        max_vertical_velocity=jnp.float32(10.0),
        min_altitude=jnp.float32(0.0),
        max_altitude=jnp.float32(10.0),
        success_duration=1,
    )
    base = EnvParams(success=easy)
    cont = dc.replace(
        base, termination=TerminationConfig(terminate_on_success=False)
    )
    s0, _ = rocket_env.reset(jax.random.PRNGKey(0), base)
    _, out_term = rocket_env.step(s0, jnp.zeros(2), base)
    assert bool(out_term.mission_success) and bool(out_term.terminated)
    s1, out_cont = rocket_env.step(s0, jnp.zeros(2), cont)
    assert bool(out_cont.mission_success) and not bool(out_cont.terminated)
    # continues and keeps the sticky flag
    s2, out_next = rocket_env.step(s1, jnp.zeros(2), cont)
    assert bool(out_next.mission_success)
    # config-reachable
    from tvc_ai_tpu.config import load_config
    from tvc_ai_tpu.config.build import build_env_params

    cfg = load_config(None, overrides=["mission_success.terminate_on_success=false"])
    assert build_env_params(cfg).termination.terminate_on_success is False
    assert build_env_params(load_config(None)).termination.terminate_on_success is True


class TestEquilibriumRelativeShaping:
    """RewardConfig.equilibrium_relative_shaping: the dense tilt terms are
    measured against the per-episode hover equilibrium (gimbal->CG line
    vertical) instead of world-up. Success/termination keep true tilt."""

    def _state_with_cg(self, params, cg):
        import dataclasses as dc

        state, _ = rocket_env.reset(jax.random.PRNGKey(0), params)
        return dc.replace(
            state, dr=dc.replace(state.dr, cg_offset=jnp.asarray(cg, jnp.float32))
        )

    def test_upright_is_penalized_and_equilibrium_rewarded(self):
        import dataclasses as dc

        from tvc_ai_tpu.physics import quaternion as quat

        p_off = EnvParams()
        p_on = dc.replace(
            p_off, reward=dc.replace(p_off.reward, equilibrium_relative_shaping=True)
        )
        cg = [0.05, 0.0, 0.0]
        step = jax.jit(rocket_env.step, static_argnums=())
        # upright + cg offset: shaped tilt = atan(0.05/0.5) > 0 -> the tilt
        # reward terms must be LOWER than with shaping off (true tilt 0)
        s_on = self._state_with_cg(p_on, cg)
        s_off = self._state_with_cg(p_off, cg)
        _, out_on = step(s_on, jnp.zeros(2), p_on)
        _, out_off = step(s_off, jnp.zeros(2), p_off)
        assert float(out_on.reward) < float(out_off.reward)
        # body rotated TO the equilibrium attitude: shaped tilt ~ 0 ->
        # shaping-on reward recovers (>= the upright shaping-on reward)
        bhat = jnp.array([0.05, 0.0, 0.5])
        bhat = bhat / jnp.linalg.norm(bhat)
        axis = jnp.cross(bhat, jnp.array([0.0, 0.0, 1.0]))
        axis = axis / jnp.linalg.norm(axis)
        angle = jnp.arccos(bhat[2])
        q_eq = quat.from_axis_angle(axis, angle)
        s_eq = self._state_with_cg(p_on, cg)
        s_eq = dc.replace(s_eq, body=dc.replace(s_eq.body, quat=q_eq))
        # sanity: the equilibrium attitude maps bhat to world-up
        assert float(quat.rotate(q_eq, bhat)[2]) > 0.9999
        _, out_eq = step(s_eq, jnp.zeros(2), p_on)
        assert float(out_eq.reward) > float(out_on.reward)

    def test_zero_cg_is_identity(self):
        import dataclasses as dc

        p_off = EnvParams()
        p_on = dc.replace(
            p_off, reward=dc.replace(p_off.reward, equilibrium_relative_shaping=True)
        )
        step = jax.jit(rocket_env.step)
        s_on, _ = rocket_env.reset(jax.random.PRNGKey(2), p_on)
        s_off, _ = rocket_env.reset(jax.random.PRNGKey(2), p_off)
        _, out_on = step(s_on, jnp.array([0.2, -0.1]), p_on)
        _, out_off = step(s_off, jnp.array([0.2, -0.1]), p_off)
        # with cg=0 the equilibrium axis IS body-z; rewards may differ only
        # by the tilt definition (euler pitch/yaw vs axis angle) — both are
        # ~identical at the tiny tilts of a fresh reset
        assert abs(float(out_on.reward) - float(out_off.reward)) < 1e-3


class TestTrimObservation:
    """Trim channels (EnvParams.trim_obs_enabled): obs 10 → 14 with slow EMAs
    of the presented tilt reading and commanded action — the round-3 fix for
    the constant-CG-torque unobservability (RESULTS.md r2 ablation)."""

    def _params(self, **kw):
        import dataclasses as dc

        base = EnvParams(
            trim_obs_enabled=True,
            randomization=RandomizationConfig(**kw) if kw else RandomizationConfig(),
        )
        return base

    def test_shapes_and_reset_zeros(self):
        p = self._params()
        state, obs = rocket_env.reset(jax.random.PRNGKey(0), p)
        assert obs.shape == (OBS_DIM + 4,)
        assert np.allclose(np.asarray(obs[-4:]), 0.0)
        assert state.trim.shape == (4,)

    def test_action_ema_math(self):
        p = self._params()
        state, _ = rocket_env.reset(jax.random.PRNGKey(0), p)
        step = jax.jit(rocket_env.step)
        a = jnp.array([0.4, -0.2])
        for _ in range(30):
            state, out = step(state, a, p)
        d = float(p.trim_obs_decay)
        expect = (1.0 - d**30) * np.array([0.4, -0.2])
        assert np.allclose(np.asarray(out.obs[-2:]), expect, atol=1e-4)

    def test_tilt_ema_tracks_constant_bias(self):
        # a constant CG offset produces a persistent tilt; the trim channels
        # must make it readable (nonzero) while staying noise-filtered
        import dataclasses as dc

        p = self._params()
        state, _ = rocket_env.reset(jax.random.PRNGKey(3), p)
        state = dc.replace(
            state, dr=dc.replace(state.dr, cg_offset=jnp.array([0.03, 0.0, 0.0], jnp.float32))
        )
        step = jax.jit(rocket_env.step)
        out = None
        for _ in range(60):
            state, out = step(state, jnp.zeros(2), p)
            if bool(out.terminated):
                break
        tilt_ema = np.asarray(out.obs[10:12])
        assert np.any(np.abs(tilt_ema) > 1e-3)

    def test_autoreset_clears_trim(self):
        p = self._params()
        state, _ = rocket_env.reset(jax.random.PRNGKey(1), p)
        step = jax.jit(rocket_env.step_autoreset)
        # drive hard to termination (tilt > 30 deg)
        npo = None
        for _ in range(400):
            state, out, npo = step(state, jnp.array([1.0, 1.0]), p)
            if bool(out.terminated | out.truncated):
                break
        assert bool(out.terminated | out.truncated)
        # the carried (fresh) state has zero trim again
        assert np.allclose(np.asarray(state.trim), 0.0)
        assert np.allclose(np.asarray(npo[-4:]), 0.0)

    def test_integral_mode_holds_after_error_vanishes(self):
        # the integral channel must HOLD its accumulated value when the
        # presented tilt reading returns to zero (an EMA decays back — the
        # failure mode that left CG-axis robustness at 0% in round 3's first
        # campaign), and must respect the anti-windup clip
        import dataclasses as dc

        p = dc.replace(self._params(), trim_obs_integral=True)
        state, _ = rocket_env.reset(jax.random.PRNGKey(0), p)
        gain = 1.0 - float(p.trim_obs_decay)
        # inject a synthetic trim history, then step with a state whose
        # reading is ~0 (fresh vertical reset has qx=qy≈0, no noise draw
        # changes sign systematically)
        p0 = dc.replace(p, randomization=RandomizationConfig())
        state = dc.replace(state, trim=jnp.array([0.2, -0.1, 0.0, 0.0], jnp.float32))
        step = jax.jit(rocket_env.step)
        state2, out = step(state, jnp.zeros(2), p0)
        held = np.asarray(state2.trim[:2])
        assert np.allclose(held, [0.2, -0.1], atol=gain * 0.05)
        # EMA mode would have decayed by factor d — assert we did NOT
        assert abs(held[0] - 0.99 * 0.2) > 1e-4 or abs(held[0] - 0.2) < 1e-3
        # clip: a saturated integral stays at the bound
        state = dc.replace(state, trim=jnp.array([0.5, 0.5, 0.0, 0.0], jnp.float32))
        state3, _ = step(state, jnp.zeros(2), p0)
        assert np.all(np.asarray(state3.trim[:2]) <= float(p.trim_obs_clip) + 1e-6)

    def test_integral_mode_config_wired(self):
        from tvc_ai_tpu.config import load_config
        from tvc_ai_tpu.config.build import build_env_params

        cfg = load_config(None, overrides=[
            "env.trim_observation.enabled=true",
            "env.trim_observation.mode=integral",
        ])
        p = build_env_params(cfg)
        assert p.trim_obs_integral
        cfg_ema = load_config(None, overrides=["env.trim_observation.enabled=true"])
        assert not build_env_params(cfg_ema).trim_obs_integral
        import pytest

        with pytest.raises(ValueError, match="trim_observation.mode"):
            build_env_params(load_config(None, overrides=[
                "env.trim_observation.mode=typo",
            ]))

    def test_disabled_is_ten_dim_and_config_wired(self):
        state, obs = rocket_env.reset(jax.random.PRNGKey(0), EnvParams())
        assert obs.shape == (OBS_DIM,)
        from tvc_ai_tpu.config import load_config
        from tvc_ai_tpu.config.build import build_env_params, build_loop_config

        cfg = load_config(None, overrides=["env.trim_observation.enabled=true"])
        p = build_env_params(cfg)
        assert p.trim_obs_enabled
        assert build_loop_config(cfg).obs_dim == OBS_DIM + 4
        cfg0 = load_config(None)
        assert not build_env_params(cfg0).trim_obs_enabled
        assert build_loop_config(cfg0).obs_dim == OBS_DIM


class TestDriftObservation:
    """Drift channels (EnvParams.drift_obs_enabled): obs += 4 with scaled
    [vx, vy, x, y] — the idealized-INS estimate the r4 LQR ground-balance
    synthesis (scripts/lqr_balance.py) identified as necessary: position
    feedback IS integral-of-velocity feedback, the slow loop that absorbs an
    unknown CG trim, and neither v nor x is recoverable from the 10-D obs."""

    def test_shapes_and_reset(self):
        import dataclasses as dc

        p = EnvParams(drift_obs_enabled=True)
        state, obs = rocket_env.reset(jax.random.PRNGKey(0), p)
        assert obs.shape == (OBS_DIM + 4,)
        # nominal reset: origin x=y=0, zero velocity → zero drift channels
        assert np.allclose(np.asarray(obs[-4:]), 0.0, atol=1e-6)

    def test_channels_track_state_exactly(self):
        import dataclasses as dc

        p = EnvParams(
            drift_obs_enabled=True,
            drift_obs_vel_scale=jnp.float32(2.0),
            drift_obs_pos_scale=jnp.float32(0.5),
        )
        state, _ = rocket_env.reset(jax.random.PRNGKey(1), p)
        step = jax.jit(rocket_env.step)
        out = None
        for _ in range(25):  # tip the vehicle → lateral thrust → drift
            state, out = step(state, jnp.array([0.6, -0.3]), p)
            if bool(out.terminated):
                break
        vel = np.asarray(state.body.vel[:2])
        pos = np.asarray(state.body.pos[:2])
        tail = np.asarray(out.obs[-4:])
        assert np.allclose(tail[:2], vel * 2.0, atol=1e-5)
        assert np.allclose(tail[2:], pos * 0.5, atol=1e-5)
        assert np.any(np.abs(tail) > 1e-4)  # the motion actually registered

    def test_ordering_after_trim_block(self):
        # with both blocks on: obs = [10 base | 4 trim | 4 drift] = 18
        p = EnvParams(trim_obs_enabled=True, drift_obs_enabled=True)
        state, obs = rocket_env.reset(jax.random.PRNGKey(2), p)
        assert obs.shape == (OBS_DIM + 4 + 4,)
        step = jax.jit(rocket_env.step)
        a = jnp.array([0.4, -0.2])
        for _ in range(10):
            state, out = step(state, a, p)
        # trim action-EMA pair sits at [12:14], drift tail at [14:18]
        d = float(p.trim_obs_decay)
        expect_ema = (1.0 - d**10) * np.array([0.4, -0.2])
        assert np.allclose(np.asarray(out.obs[12:14]), expect_ema, atol=1e-4)
        assert np.allclose(
            np.asarray(out.obs[14:16]),
            np.asarray(state.body.vel[:2]) * float(p.drift_obs_vel_scale),
            atol=1e-5,
        )

    def test_autoreset_restarts_drift(self):
        p = EnvParams(drift_obs_enabled=True)
        state, _ = rocket_env.reset(jax.random.PRNGKey(3), p)
        step = jax.jit(rocket_env.step_autoreset)
        npo = None
        for _ in range(400):
            state, out, npo = step(state, jnp.array([1.0, 1.0]), p)
            if bool(out.terminated | out.truncated):
                break
        assert bool(out.terminated | out.truncated)
        assert np.allclose(np.asarray(npo[-4:]), 0.0, atol=1e-6)

    def test_config_wired(self):
        from tvc_ai_tpu.config import load_config
        from tvc_ai_tpu.config.build import build_env_params, build_loop_config

        cfg = load_config(None, overrides=[
            "env.drift_observation.enabled=true",
            "env.drift_observation.vel_scale=3.0",
        ])
        p = build_env_params(cfg)
        assert p.drift_obs_enabled
        assert float(p.drift_obs_vel_scale) == 3.0
        assert build_loop_config(cfg).obs_dim == OBS_DIM + 4
        both = load_config(None, overrides=[
            "env.drift_observation.enabled=true",
            "env.trim_observation.enabled=true",
        ])
        assert build_loop_config(both).obs_dim == OBS_DIM + 8
        assert not build_env_params(load_config(None)).drift_obs_enabled

    def test_suite_eval_reproduces_training_obs(self):
        # ADVICE r3: suite eval must reproduce the training-time observation
        # dynamics (incl. trim_obs_clip) — build the overrides from the run's
        # saved config, never from re-typed flags
        from tvc_ai_tpu.config import load_config
        from tvc_ai_tpu.eval.evaluate import (
            _suite_env_params,
            obs_overrides_from_config,
        )

        cfg = load_config(None, overrides=[
            "env.trim_observation.enabled=true",
            "env.trim_observation.mode=integral",
            "env.trim_observation.integral_clip=0.25",
            "env.drift_observation.enabled=true",
            "env.drift_observation.pos_scale=0.7",
        ])
        ov = obs_overrides_from_config(cfg)
        sp = _suite_env_params("robustness", obs_overrides=ov)
        assert sp.trim_obs_enabled and sp.trim_obs_integral
        assert float(sp.trim_obs_clip) == 0.25
        assert sp.drift_obs_enabled
        assert abs(float(sp.drift_obs_pos_scale) - 0.7) < 1e-6
