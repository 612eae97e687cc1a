"""Batched eval rollout: done-freezing, stat accumulation, summaries."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvc_ai_tpu.agents.sac import SACConfig
from tvc_ai_tpu.env.types import EnvParams
from tvc_ai_tpu.eval.rollout import (
    EpisodeStats,
    make_eval_fn,
    make_policy_eval_fn,
    summarize_stats,
)


def test_episode_stats_freeze_after_done():
    """A policy that tips the rocket terminates early; stats must stop
    accumulating at termination (no post-done reward/length leakage)."""
    from tvc_ai_tpu.agents import sac as sac_mod

    cfg = SACConfig(hidden_dims=(16, 16))
    agent = sac_mod.init(jax.random.PRNGKey(0), 10, 2, cfg)
    env_params = EnvParams(max_episode_steps=50)

    def hard_tilt_policy(agent, obs, key):
        return jnp.ones((obs.shape[0], 2))

    eval_fn = jax.jit(make_policy_eval_fn(hard_tilt_policy, num_episodes=4))
    stats = eval_fn(agent, jax.random.PRNGKey(1), env_params)
    lengths = np.asarray(stats.lengths)
    # hard gimbal tips past 30° well before the 50-step horizon
    assert np.all(lengths < 50)
    assert np.all(lengths > 0)
    # returns finite and equal across identical episodes? (no noise, same
    # reset → deterministic identical episodes)
    returns = np.asarray(stats.returns)
    assert np.allclose(returns, returns[0], atol=1e-3)


def test_summarize_percentiles():
    stats = EpisodeStats(
        returns=jnp.arange(100, dtype=jnp.float32),
        lengths=jnp.full(100, 10, jnp.int32),
        success=jnp.arange(100) < 30,
        crashed=jnp.arange(100) < 10,
        max_tilt=jnp.full(100, 0.1),
        max_angular_velocity=jnp.full(100, 0.2),
        mean_effort=jnp.full(100, 0.5),
        final_altitude=jnp.full(100, 0.5),
        fuel_used=jnp.full(100, 0.3),
    )
    m = summarize_stats(stats)
    assert m["eval_success_rate"] == pytest.approx(0.3)
    assert m["eval_crash_rate"] == pytest.approx(0.1)
    assert m["eval_reward_p50"] == pytest.approx(49.5)
    assert m["eval_reward_p95"] == pytest.approx(94.05)


def test_obs_dim_truncation_for_legacy_agents():
    """make_eval_fn(obs_dim=8) drives an 8-D agent against the 10-D env."""
    from tvc_ai_tpu.agents import sac as sac_mod

    cfg = SACConfig(hidden_dims=(16, 16))
    agent8 = sac_mod.init(jax.random.PRNGKey(0), 8, 2, cfg)
    eval_fn = jax.jit(make_eval_fn(cfg, num_episodes=2, obs_dim=8))
    stats = eval_fn(agent8, jax.random.PRNGKey(1), EnvParams(max_episode_steps=20))
    assert np.all(np.isfinite(np.asarray(stats.returns)))


def test_trajectory_recorder_shapes_and_masking():
    """make_trajectory_fn returns (T, E) series; live mask goes 1->0 and
    never back; recorded quantities are finite while live."""
    import numpy as np

    from tvc_ai_tpu.agents import sac as sac_mod
    from tvc_ai_tpu.env.types import EnvParams
    from tvc_ai_tpu.eval.rollout import make_trajectory_fn

    cfg = sac_mod.SACConfig(hidden_dims=(16, 16))
    agent = sac_mod.init(jax.random.PRNGKey(0), 10, 2, cfg)
    params = EnvParams(max_episode_steps=50)
    fn = jax.jit(make_trajectory_fn(cfg, 4))
    series = fn(agent, jax.random.PRNGKey(1), params)
    T, E = 50, 4
    assert series["altitude"].shape == (T, E)
    assert series["action"].shape == (T, E, 2)
    live = np.asarray(series["live"])
    # monotone non-increasing live mask per episode
    assert (np.diff(live, axis=0) <= 1e-6).all()
    alt = np.asarray(series["altitude"])
    assert np.isfinite(alt[live > 0.5]).all()


def test_plot_trajectories_writes_png(tmp_path):
    import numpy as np

    from tvc_ai_tpu.eval.rollout import plot_trajectories

    T, E = 30, 3
    rng = np.random.default_rng(0)
    series = {
        "altitude": rng.uniform(0, 5, (T, E)),
        "tilt": rng.uniform(0, 0.5, (T, E)),
        "angular_velocity": rng.uniform(0, 2, (T, E)),
        "reward": rng.uniform(0, 100, (T, E)),
        "live": np.ones((T, E)),
        "action": rng.uniform(-1, 1, (T, E, 2)),
    }
    out = tmp_path / "traj.png"
    plot_trajectories(series, out)
    assert out.exists() and out.stat().st_size > 10_000


def test_obs_dim_truncation_with_history():
    """--obs_dim 8 with --history 2: truncation must apply PER FRAME before
    flattening (round-2 advisor finding: a trailing slice on the stacked
    window shape-errors / feeds wrong dims). Net input = 8*2 = 16."""
    from tvc_ai_tpu.agents import sac as sac_mod

    cfg = SACConfig(hidden_dims=(16, 16))
    agent = sac_mod.init(jax.random.PRNGKey(0), 16, 2, cfg)
    env_params = EnvParams(max_episode_steps=20)
    eval_fn = jax.jit(
        make_eval_fn(cfg, num_episodes=3, obs_dim=8, history_len=2)
    )
    stats = eval_fn(agent, jax.random.PRNGKey(1), env_params)
    assert np.all(np.asarray(stats.lengths) > 0)
    assert np.all(np.isfinite(np.asarray(stats.returns)))

    from tvc_ai_tpu.eval.rollout import make_trajectory_fn

    traj_fn = jax.jit(
        make_trajectory_fn(cfg, num_episodes=2, obs_dim=8, history_len=2)
    )
    series = traj_fn(agent, jax.random.PRNGKey(2), env_params)
    assert series["altitude"].shape == (20, 2)


def test_eval_with_trim_obs_and_history():
    """Trim-augmented env (obs 14) × history 2 → policy view 28; the eval
    rollout must infer the frame size rather than hardcode 10."""
    from tvc_ai_tpu.agents import sac as sac_mod

    cfg = SACConfig(hidden_dims=(16, 16))
    agent = sac_mod.init(jax.random.PRNGKey(0), 28, 2, cfg)
    env_params = EnvParams(max_episode_steps=20, trim_obs_enabled=True)
    eval_fn = jax.jit(make_eval_fn(cfg, num_episodes=3, history_len=2))
    stats = eval_fn(agent, jax.random.PRNGKey(1), env_params)
    assert np.all(np.isfinite(np.asarray(stats.returns)))
