"""Legacy behavioral-contract tests — the reference suite, re-targeted.

The reference's entire test suite imports a legacy API (SACAgent/SACConfig/
RocketTVCEnv/RocketConfig/factories) that its own tree no longer exports
(SURVEY §0.1). These tests re-implement that contract against our
implementations (mirrors tests/test_environment.py + tests/test_agent.py).
"""

import tempfile
from pathlib import Path

import numpy as np
import pytest

from tvc_ai_tpu.agents.legacy import SACAgent, SACConfig
from tvc_ai_tpu.env import (
    RocketConfig,
    RocketTVCEnv,
    make_evaluation_env,
    make_training_env,
)


@pytest.fixture
def env():
    e = RocketTVCEnv()
    yield e
    e.close()


@pytest.fixture
def agent(env):
    return SACAgent(
        obs_dim=env.observation_space.shape[0],
        action_dim=env.action_space.shape[0],
        config=SACConfig(
            hidden_dims=[64, 64],
            lr_actor=3e-4,
            buffer_size=10000,
            batch_size=32,
            learning_starts=50,
        ),
    )


# ---------------------------------------------------------------- env side


def test_legacy_observation_space(env):
    assert env.observation_space.shape == (8,)
    assert env.action_space.shape == (2,)
    assert np.all(env.action_space.low == -1.0)
    assert np.all(env.action_space.high == 1.0)


def test_legacy_reset(env):
    obs, info = env.reset()
    assert obs.shape == (8,)
    assert np.all(np.isfinite(obs))
    assert np.isclose(np.linalg.norm(obs[:4]), 1.0, atol=1e-3)
    assert "position" in info and "altitude" in info


def test_legacy_step(env):
    obs, _ = env.reset()
    next_obs, reward, terminated, truncated, info = env.step(np.zeros(2))
    assert next_obs.shape == (8,)
    assert np.all(np.isfinite(next_obs))
    assert isinstance(reward, float)
    assert isinstance(terminated, bool)
    assert isinstance(truncated, bool)
    assert isinstance(info, dict)


def test_legacy_domain_randomization_varies_mass():
    env1 = RocketTVCEnv(domain_randomization=True, seed=1)
    env2 = RocketTVCEnv(domain_randomization=True, seed=2)
    masses1, masses2 = [], []
    for _ in range(5):
        env1.reset()
        env2.reset()
        masses1.append(env1.current_mass)
        masses2.append(env2.current_mass)
    assert np.std(masses1) > 0 or np.std(masses2) > 0
    env1.close()
    env2.close()


def test_rocket_config_defaults():
    config = RocketConfig()
    assert config.mass > 0
    assert config.radius > 0
    assert config.length > 0
    assert config.thrust_mean > 0
    assert config.burn_time > 0
    assert config.max_gimbal_angle > 0


def test_rocket_config_modification():
    config = RocketConfig()
    original_mass = config.mass
    config.mass = 2.0
    assert config.mass != original_mass
    assert config.mass == 2.0


def test_factories():
    env = make_training_env()
    assert hasattr(env, "domain_randomization")
    env.close()
    env = make_evaluation_env()
    assert env is not None
    env.close()
    env = make_training_env(
        domain_randomization=False, sensor_noise=False, max_episode_steps=500
    )
    assert env.max_episode_steps == 500
    env.close()


# -------------------------------------------------------------- agent side


def test_agent_creation(env):
    agent = SACAgent(
        obs_dim=env.observation_space.shape[0],
        action_dim=env.action_space.shape[0],
    )
    assert agent is not None


def test_networks_initialization(agent):
    for net in (
        agent.actor, agent.critic1, agent.critic2,
        agent.target_critic1, agent.target_critic2,
    ):
        assert net is not None
        assert len(net.parameters()) > 0


def test_action_selection(agent, env):
    obs, _ = env.reset()
    action_det = agent.select_action(obs, deterministic=True)
    assert action_det.shape == env.action_space.shape
    assert np.all(action_det >= env.action_space.low)
    assert np.all(action_det <= env.action_space.high)
    a1 = agent.select_action(obs, deterministic=False)
    a2 = agent.select_action(obs, deterministic=False)
    assert not np.allclose(a1, a2, atol=1e-6)


def test_experience_storage(agent, env):
    obs, _ = env.reset()
    action = agent.select_action(obs)
    next_obs, reward, terminated, truncated, _ = env.step(action)
    agent.store_transition(obs, action, reward, next_obs, terminated or truncated)
    assert len(agent.replay_buffer) == 1


def _fill_buffer(agent, env, n=100):
    obs, _ = env.reset()
    for _ in range(n):
        action = agent.select_action(obs)
        next_obs, reward, terminated, truncated, _ = env.step(action)
        agent.store_transition(
            obs, action, reward, next_obs, terminated or truncated
        )
        obs = next_obs
        if terminated or truncated:
            obs, _ = env.reset()


@pytest.mark.integration
def test_training_step(agent, env):
    _fill_buffer(agent, env)
    metrics = agent.train()
    assert isinstance(metrics, dict)
    assert "critic_loss" in metrics and "actor_loss" in metrics
    for key, value in metrics.items():
        assert np.isfinite(value), key


@pytest.mark.integration
def test_automatic_entropy_tuning(agent, env):
    _fill_buffer(agent, env)
    for _ in range(10):
        agent.train()
    assert float(agent.log_alpha.exp()) > 0


def test_save_and_load(agent):
    with tempfile.TemporaryDirectory() as temp_dir:
        save_path = Path(temp_dir) / "test_agent.msgpack"
        agent.save(save_path)
        assert save_path.exists()
        new_agent = SACAgent(
            obs_dim=agent.obs_dim,
            action_dim=agent.action_dim,
            config=agent.config,
        )
        new_agent.load(save_path)
        for p1, p2 in zip(agent.actor.parameters(), new_agent.actor.parameters()):
            assert np.allclose(p1, p2)


def test_training_mode_switching(agent):
    assert agent.actor.training
    agent.eval_mode()
    assert not agent.actor.training
    assert not agent.critic1.training
    agent.actor.train()
    assert agent.actor.training


def test_actor_forward_contract(agent, env):
    """Export path contract: actor.forward(obs) -> (mean, log_std)."""
    obs, _ = env.reset()
    mean, log_std = agent.actor.forward(obs)
    assert mean.shape == (env.action_space.shape[0],)
    assert log_std.shape == (env.action_space.shape[0],)
