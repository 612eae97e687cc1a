"""End-to-end integration tests — the reference's integration contract.

Mirrors tests/test_integration.py: a mini training run completes
(:102-121), saved/loaded agents act identically (:181-225, atol 1e-6),
seeded envs are consistent (:288-313), and training does not regress
(final ≥ initial − 50 reward, :315-371). The eval-pipeline and export
smoke tests run against our evaluate/export modules.
"""

import numpy as np
import pytest

from tvc_ai_tpu.agents.legacy import SACAgent, SACConfig
from tvc_ai_tpu.env import RocketTVCEnv


def simple_training_run(num_episodes=3, max_steps=60, seed=0):
    """Mini train loop via the legacy single-env API (ref :46-100)."""
    env = RocketTVCEnv(max_episode_steps=max_steps, seed=seed)
    agent = SACAgent(
        obs_dim=env.observation_space.shape[0],
        action_dim=env.action_space.shape[0],
        config=SACConfig(
            hidden_dims=[32, 32], batch_size=16, buffer_size=4096,
            learning_starts=32,
        ),
        seed=seed,
    )
    episode_rewards = []
    for _ in range(num_episodes):
        obs, _ = env.reset()
        total = 0.0
        for _ in range(max_steps):
            action = agent.select_action(obs)
            next_obs, reward, terminated, truncated, _ = env.step(action)
            agent.store_transition(
                obs, action, reward, next_obs, terminated or truncated
            )
            agent.train()
            total += reward
            obs = next_obs
            if terminated or truncated:
                break
        episode_rewards.append(total)
    env.close()
    return agent, episode_rewards


@pytest.mark.integration
def test_mini_training_completes():
    agent, rewards = simple_training_run()
    assert len(rewards) == 3
    assert all(np.isfinite(r) for r in rewards)
    assert agent.total_steps > 0


@pytest.mark.integration
def test_save_load_action_consistency(tmp_path):
    """Saved and loaded agents act identically (ref :181-225)."""
    agent, _ = simple_training_run(num_episodes=2)
    path = tmp_path / "agent.msgpack"
    agent.save(path)
    agent2 = SACAgent(agent.obs_dim, agent.action_dim, agent.config)
    agent2.load(path)
    env = RocketTVCEnv(seed=7)
    obs, _ = env.reset()
    for _ in range(5):
        a1 = agent.select_action(obs, deterministic=True)
        a2 = agent2.select_action(obs, deterministic=True)
        np.testing.assert_allclose(a1, a2, atol=1e-6)
        obs, _, term, trunc, _ = env.step(a1)
        if term or trunc:
            break
    env.close()


def test_seeded_env_consistency():
    """Same seed → identical trajectories (ref :288-313). Without domain
    randomization the reset is deterministic, so different seeds also match;
    the different-seed divergence check uses a randomized env."""
    def rollout(seed, dr=False):
        env = RocketTVCEnv(seed=seed, domain_randomization=dr)
        obs, _ = env.reset(seed=seed)
        traj = [obs]
        for i in range(10):
            obs, r, term, trunc, _ = env.step(np.array([0.1, -0.1]))
            traj.append(obs)
            if term or trunc:
                break
        env.close()
        return np.stack(traj)

    t1, t2 = rollout(123), rollout(123)
    np.testing.assert_allclose(t1, t2, atol=1e-6)
    r1, r3 = rollout(123, dr=True), rollout(456, dr=True)
    assert r3.shape != r1.shape or not np.allclose(r1, r3)


def test_env_observation_sanity_bounds():
    env = RocketTVCEnv(seed=3)
    obs, _ = env.reset()
    for _ in range(30):
        obs, r, term, trunc, info = env.step(
            np.random.default_rng(0).uniform(-1, 1, 2).astype(np.float32)
        )
        assert np.linalg.norm(obs[:4]) == pytest.approx(1.0, abs=1e-3)
        assert np.all(np.abs(obs[4:7]) < 100.0)
        assert 0.0 <= obs[7] <= 1.0
        if term or trunc:
            break
    env.close()


@pytest.mark.integration
@pytest.mark.slow
def test_training_progress_non_regression():
    """Final episodes not drastically worse than initial (ref :315-371:
    final ≥ initial − 50 reward)."""
    _, rewards = simple_training_run(num_episodes=6, max_steps=50, seed=1)
    initial = np.mean(rewards[:2])
    final = np.mean(rewards[-2:])
    assert final >= initial - 50.0


@pytest.mark.integration
def test_eval_pipeline_with_saved_checkpoint(tmp_path):
    """evaluate-suite pipeline on a saved checkpoint (ref :123-179)."""
    from tvc_ai_tpu.agents.sac import SACConfig as CoreSACConfig
    from tvc_ai_tpu.eval.evaluate import load_agent_state, run_suite

    agent, _ = simple_training_run(num_episodes=2)
    path = tmp_path / "agent.msgpack"
    agent.save(path)
    cfg = CoreSACConfig(hidden_dims=(32, 32))
    state = load_agent_state(path, agent.obs_dim, agent.action_dim, cfg)
    result = run_suite(state, cfg, "standard", num_episodes=4, obs_dim=agent.obs_dim)
    assert 0.0 <= result.metrics["eval_success_rate"] <= 1.0
    assert np.isfinite(result.metrics["eval_reward_mean"])


def test_gym_registration():
    import gymnasium as gym

    from tvc_ai_tpu.env import register_envs

    register_envs()
    register_envs()  # idempotent
    env = gym.make("EnhancedRocketTVC-v0")
    obs, info = env.reset()
    assert obs.shape == (10,)
    obs, r, term, trunc, info = env.step(np.zeros(2, np.float32))
    assert np.isfinite(r)
    env.close()
