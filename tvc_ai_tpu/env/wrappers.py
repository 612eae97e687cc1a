"""Gymnasium-compatible wrappers over the functional core.

Two API generations coexist in the reference (SURVEY §0.1) and both are
served here:

- ``EnhancedRocketTVCEnv`` — the current generation: 10-D obs
  [quat, ω, fuel, phase, progress], constructor flags
  (enable_hierarchical/curiosity/physics_informed), mission phases
  (ref: env/enhanced_rocket_tvc_env.py:271-518).
- ``RocketTVCEnv`` + ``RocketConfig`` — the legacy generation required by
  evaluate/export/HPO/tests: 8-D obs [quat, ω, fuel], ``current_mass``
  under domain randomization (call sites: scripts/evaluate.py:364-379,
  tests/test_environment.py:46-122).

Both are thin host shells: state lives in an ``EnvState`` pytree and every
``step`` is one cached jitted call into ``rocket_env.step``.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Optional

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import spaces

from tvc_ai_tpu.env import rocket_env
from tvc_ai_tpu.env.types import (
    ACTION_DIM,
    OBS_DIM,
    OBS_DIM_LEGACY,
    PHASE_NAMES,
    EnvParams,
    RandomizationConfig,
)
from tvc_ai_tpu.physics.types import RocketParams


@dataclasses.dataclass
class RocketConfig:
    """Legacy physical-configuration object (mutable, like the original).

    The legacy source file is absent from the reference tree; the field set
    is reconstructed from its call sites (tests/test_environment.py:163-182,
    scripts/evaluate.py:368-372) and defaults are chosen to be consistent
    with the enhanced env's physics (mass deliberately ≠ 2.0 because the
    legacy contract test mutates mass to 2.0 and asserts it changed).
    """

    mass: float = 1.5                 # kg
    radius: float = 0.05              # m
    length: float = 1.0               # m
    thrust_mean: float = 35.0         # N
    burn_time: float = 20.0           # s (→ 0.001 fuel/step at 50 Hz)
    max_gimbal_angle: float = math.radians(18.0)
    mass_variation: float = 0.3       # ± fraction
    thrust_variation: float = 0.2     # σ fraction
    cg_offset_max: float = 0.05       # m
    wind_max: float = 3.0             # N
    sensor_noise_std: float = 0.02

    def to_env_params(
        self,
        *,
        domain_randomization: bool,
        sensor_noise: bool,
        max_episode_steps: int,
    ) -> EnvParams:
        dt = 0.02
        rocket = RocketParams(
            mass=jnp.float32(self.mass),
            radius=jnp.float32(self.radius),
            length=jnp.float32(self.length),
            thrust=jnp.float32(self.thrust_mean),
            max_gimbal=jnp.float32(self.max_gimbal_angle),
            fuel_burn_rate=jnp.float32(dt / self.burn_time),
        )
        rnd = RandomizationConfig(
            enabled=bool(domain_randomization),
            sensor_noise_enabled=bool(sensor_noise),
            mass_variation=jnp.float32(self.mass_variation),
            thrust_variation=jnp.float32(self.thrust_variation),
            cg_offset_max=jnp.float32(self.cg_offset_max),
            wind_max=jnp.float32(self.wind_max),
            sensor_noise_std=jnp.float32(self.sensor_noise_std),
        )
        return EnvParams(
            rocket=rocket, randomization=rnd, max_episode_steps=max_episode_steps
        )


@partial(jax.jit, static_argnames=())
def _jit_reset(key, params):
    return rocket_env.reset(key, params)


@partial(jax.jit, static_argnames=())
def _jit_step(state, action, params):
    return rocket_env.step(state, action, params)


class _BaseGymEnv(gym.Env):
    """Shared host shell: PRNG bookkeeping, jitted reset/step, info dict."""

    metadata = {"render_modes": ["human", "rgb_array"], "render_fps": 60}

    def __init__(self, params: EnvParams, seed: int = 0):
        self._params = params
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self.max_episode_steps = params.max_episode_steps
        self.action_space = spaces.Box(
            low=-1.0, high=1.0, shape=(ACTION_DIM,), dtype=np.float32
        )

    # -- helpers -----------------------------------------------------------
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _info(self, out=None) -> dict[str, Any]:
        s = self._state
        pos = np.asarray(s.body.pos)
        info = {
            "position": tuple(float(x) for x in pos),
            "altitude": float(pos[2]),
            "fuel_remaining": float(s.fuel),
            "mission_phase": PHASE_NAMES[int(s.phase)],
            "mission_successful": bool(s.mission_success),
            "step": int(s.step_count),
            "current_mass": float(s.dr.mass),
        }
        if out is not None:
            info.update(
                tilt_angle_deg=float(np.degrees(float(out.tilt))),
                angular_velocity_mag=float(out.angular_velocity_mag),
                reward_components={
                    k: float(v) for k, v in out.reward_components.items()
                },
                crashed=bool(out.crashed),
            )
        return info

    # -- gym API -----------------------------------------------------------
    def reset(self, *, seed: Optional[int] = None, options: Optional[dict] = None):
        super().reset(seed=seed)
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._state, obs = _jit_reset(self._next_key(), self._params)
        self._last_raw_obs = np.asarray(obs)
        return self._project_obs(np.asarray(obs)), self._info()

    def step(self, action):
        action = jnp.asarray(np.asarray(action, dtype=np.float32))
        self._state, out = _jit_step(self._state, action, self._params)
        raw_obs = np.asarray(out.obs)
        obs = self._project_obs(raw_obs)
        reward = float(out.reward)
        info = self._info(out)
        reward, info = self._augment_reward(reward, action, raw_obs, info)
        self._last_raw_obs = raw_obs
        return (
            obs,
            reward,
            bool(out.terminated),
            bool(out.truncated),
            info,
        )

    def _augment_reward(self, reward, action, raw_obs, info):
        """Hook for subclass reward shaping (e.g. curiosity bonus)."""
        return reward, info

    def render(self):  # pragma: no cover - no GUI in the TPU build
        return None

    def close(self):
        self._state = None

    # -- to override ---------------------------------------------------------
    def _project_obs(self, obs: np.ndarray) -> np.ndarray:
        return obs

    @property
    def current_mass(self) -> float:
        """Randomized episode mass (legacy contract, tests/test_environment.py:115)."""
        if self._state is None:
            return float(self._params.rocket.mass)
        return float(self._state.dr.mass)


class EnhancedRocketTVCEnv(_BaseGymEnv):
    """Current-generation env: 10-D obs, mission phases, multi-objective reward.

    Constructor signature mirrors the reference
    (env/enhanced_rocket_tvc_env.py:279-288). ``enable_curiosity`` is HONORED
    with the reference's in-env semantics (intrinsic forward-model bonus added
    to the step reward, ref :496-502); the production/fused path additionally
    TRAINS the ICM (training.loop). ``enable_hierarchical`` and
    ``enable_physics_informed`` are stored-without-effect exactly as in the
    reference env (ref :294-296 stores them; no other use in the env) — the
    real implementations live in the agent stack (models/hierarchical.py,
    agents/physics_informed.py, both config-reachable).
    """

    def __init__(
        self,
        config: Optional[dict] = None,
        max_episode_steps: int = 1000,
        render_mode: Optional[str] = None,
        enable_hierarchical: bool = True,
        enable_curiosity: bool = True,
        enable_physics_informed: bool = True,
        debug: bool = False,
        domain_randomization: bool = False,
        sensor_noise: bool = False,
        seed: int = 0,
    ):
        self.config = config or {}
        self.render_mode = render_mode
        self.enable_hierarchical = enable_hierarchical
        self.enable_curiosity = enable_curiosity
        self.enable_physics_informed = enable_physics_informed
        self.debug = debug
        self.domain_randomization = domain_randomization
        rc = RocketConfig(mass=2.0)  # enhanced-gen nominal mass (ref :412)
        params = rc.to_env_params(
            domain_randomization=domain_randomization,
            sensor_noise=sensor_noise,
            max_episode_steps=max_episode_steps,
        )
        super().__init__(params, seed=seed)
        obs_low = np.array(
            [-1, -1, -1, -1, -10, -10, -10, 0, 0, 0], dtype=np.float32
        )
        obs_high = np.array(
            [1, 1, 1, 1, 10, 10, 10, 1, 1, 1], dtype=np.float32
        )
        self.observation_space = spaces.Box(
            low=obs_low, high=obs_high, dtype=np.float32
        )
        self._icm = None
        if enable_curiosity:
            from tvc_ai_tpu.models import curiosity as icm_mod

            self._icm_mod = icm_mod
            self._icm_cfg = icm_mod.CuriosityConfig()
            self._icm = icm_mod.init(
                jax.random.PRNGKey(seed ^ 0x1C4), self._icm_cfg
            )
            self._icm_reward = jax.jit(
                lambda state, obs, action, next_obs: icm_mod.intrinsic_reward(
                    state, obs, action, next_obs, self._icm_cfg
                )
            )

    def _augment_reward(self, reward, action, raw_obs, info):
        # ref env/enhanced_rocket_tvc_env.py:496-502: intrinsic bonus =
        # forward-model MSE × 0.01 on obs[:8], added to the extrinsic reward
        if self._icm is not None:
            intrinsic = float(
                self._icm_reward(
                    self._icm,
                    jnp.asarray(self._last_raw_obs[None, :]),
                    jnp.asarray(np.asarray(action, np.float32)[None, :]),
                    jnp.asarray(raw_obs[None, :]),
                )[0]
            )
            info["intrinsic_reward"] = intrinsic
            reward = reward + intrinsic
        return reward, info


class RocketTVCEnv(_BaseGymEnv):
    """Legacy-generation env: 8-D obs [quat, ω, fuel] (SURVEY §0.1)."""

    def __init__(
        self,
        config: Optional[RocketConfig] = None,
        domain_randomization: bool = False,
        sensor_noise: bool = False,
        max_episode_steps: int = 1000,
        debug: bool = False,
        seed: int = 0,
    ):
        self.config = config or RocketConfig()
        self.domain_randomization = domain_randomization
        self.sensor_noise = sensor_noise
        self.debug = debug
        params = self.config.to_env_params(
            domain_randomization=domain_randomization,
            sensor_noise=sensor_noise,
            max_episode_steps=max_episode_steps,
        )
        super().__init__(params, seed=seed)
        obs_low = np.array([-1, -1, -1, -1, -10, -10, -10, 0], dtype=np.float32)
        obs_high = np.array([1, 1, 1, 1, 10, 10, 10, 1], dtype=np.float32)
        self.observation_space = spaces.Box(
            low=obs_low, high=obs_high, dtype=np.float32
        )

    def _project_obs(self, obs: np.ndarray) -> np.ndarray:
        return obs[:OBS_DIM_LEGACY]
