"""Gymnasium registration + environment factories.

Mirrors the reference's registry (env/__init__.py:28-102): three registered
ids and three factories. The factories accept the UNION of both API
generations' kwargs (SURVEY §0.1): the current generation's
(config, enable_hierarchical, enable_curiosity, enable_physics_informed) and
the legacy generation's (domain_randomization, sensor_noise,
max_episode_steps, debug) — the legacy HPO/eval scripts call them with the
latter (scripts/tune_hyperparameters.py:78-88).
"""

from __future__ import annotations

from gymnasium.envs.registration import register, registry

from tvc_ai_tpu.env.wrappers import EnhancedRocketTVCEnv, RocketConfig, RocketTVCEnv

_REGISTERED = False


def register_envs() -> None:
    """Idempotently register the env ids (ref env/__init__.py:28-49)."""
    global _REGISTERED
    if _REGISTERED:
        return
    specs = {
        "EnhancedRocketTVC-v0": {},
        "EnhancedRocketTVC-Eval-v0": {"domain_randomization": False},
        "EnhancedRocketTVC-Debug-v0": {"debug": True, "max_episode_steps": 200},
    }
    for env_id, kwargs in specs.items():
        if env_id not in registry:
            register(
                id=env_id,
                entry_point="tvc_ai_tpu.env.wrappers:EnhancedRocketTVCEnv",
                kwargs=kwargs,
            )
    _REGISTERED = True


def make_training_env(
    config=None,
    domain_randomization: bool = True,
    sensor_noise: bool = True,
    max_episode_steps: int = 1000,
    debug: bool = False,
    enable_hierarchical: bool = True,
    enable_curiosity: bool = True,
    enable_physics_informed: bool = True,
    seed: int = 0,
) -> EnhancedRocketTVCEnv:
    """Training env: randomization on by default (spec: config.yaml:340-349)."""
    return EnhancedRocketTVCEnv(
        config=config if isinstance(config, dict) else None,
        max_episode_steps=max_episode_steps,
        enable_hierarchical=enable_hierarchical,
        enable_curiosity=enable_curiosity,
        enable_physics_informed=enable_physics_informed,
        debug=debug,
        domain_randomization=domain_randomization,
        sensor_noise=sensor_noise,
        seed=seed,
    )


def make_evaluation_env(
    config=None,
    domain_randomization: bool = False,
    sensor_noise: bool = False,
    max_episode_steps: int = 1000,
    debug: bool = False,
    enable_hierarchical: bool = True,
    enable_curiosity: bool = False,
    enable_physics_informed: bool = True,
    seed: int = 0,
) -> EnhancedRocketTVCEnv:
    """Evaluation env: deterministic physics by default."""
    return EnhancedRocketTVCEnv(
        config=config if isinstance(config, dict) else None,
        max_episode_steps=max_episode_steps,
        enable_hierarchical=enable_hierarchical,
        enable_curiosity=enable_curiosity,
        enable_physics_informed=enable_physics_informed,
        debug=debug,
        domain_randomization=domain_randomization,
        sensor_noise=sensor_noise,
        seed=seed,
    )


def make_debug_env(max_episode_steps: int = 200, seed: int = 0, **kwargs):
    return make_evaluation_env(
        max_episode_steps=max_episode_steps, debug=True, seed=seed, **kwargs
    )


def make_legacy_env(
    config: RocketConfig | None = None,
    domain_randomization: bool = False,
    sensor_noise: bool = False,
    max_episode_steps: int = 1000,
    debug: bool = False,
    seed: int = 0,
) -> RocketTVCEnv:
    """Legacy 8-D-obs env factory (for the evaluate/export/HPO contract)."""
    return RocketTVCEnv(
        config=config,
        domain_randomization=domain_randomization,
        sensor_noise=sensor_noise,
        max_episode_steps=max_episode_steps,
        debug=debug,
        seed=seed,
    )
