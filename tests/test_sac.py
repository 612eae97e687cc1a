"""SAC agent unit tests — the legacy behavioral contract, JAX-native.

Mirrors the reference suite's coverage (tests/test_agent.py): network init,
action bounds, deterministic-vs-stochastic divergence, finite losses, soft
target updates, entropy tuning α>0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvc_ai_tpu.agents import replay as replay_mod
from tvc_ai_tpu.agents import sac as sac_mod

OBS_DIM, ACT_DIM = 10, 2


@pytest.fixture(scope="module")
def cfg():
    return sac_mod.SACConfig(hidden_dims=(32, 32), batch_size=16)


@pytest.fixture(scope="module")
def agent(cfg):
    return sac_mod.init(jax.random.PRNGKey(0), OBS_DIM, ACT_DIM, cfg)


def random_batch(key, n=16):
    ks = jax.random.split(key, 5)
    return {
        "obs": jax.random.normal(ks[0], (n, OBS_DIM)),
        "action": jax.random.uniform(ks[1], (n, ACT_DIM), minval=-1, maxval=1),
        "reward": jax.random.normal(ks[2], (n,)),
        "next_obs": jax.random.normal(ks[3], (n, OBS_DIM)),
        "done": (jax.random.uniform(ks[4], (n,)) < 0.1).astype(jnp.float32),
    }


def test_action_bounds(agent, cfg):
    obs = jax.random.normal(jax.random.PRNGKey(1), (64, OBS_DIM))
    a = sac_mod.select_action(agent, obs, jax.random.PRNGKey(2), cfg, ACT_DIM)
    assert a.shape == (64, ACT_DIM)
    assert np.all(np.abs(np.asarray(a)) <= 1.0)


def test_deterministic_vs_stochastic(agent, cfg):
    obs = jax.random.normal(jax.random.PRNGKey(3), (8, OBS_DIM))
    d1 = sac_mod.select_action(
        agent, obs, jax.random.PRNGKey(4), cfg, ACT_DIM, deterministic=True
    )
    d2 = sac_mod.select_action(
        agent, obs, jax.random.PRNGKey(5), cfg, ACT_DIM, deterministic=True
    )
    s1 = sac_mod.select_action(agent, obs, jax.random.PRNGKey(6), cfg, ACT_DIM)
    s2 = sac_mod.select_action(agent, obs, jax.random.PRNGKey(7), cfg, ACT_DIM)
    assert np.allclose(d1, d2)
    assert not np.allclose(s1, s2)


def test_update_finite_losses(agent, cfg):
    batch = random_batch(jax.random.PRNGKey(8))
    new_agent, metrics = sac_mod.update(
        agent, batch, jax.random.PRNGKey(9), cfg, OBS_DIM, ACT_DIM
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(new_agent.step) == 1


def test_update_changes_params(agent, cfg):
    batch = random_batch(jax.random.PRNGKey(10))
    new_agent, _ = sac_mod.update(
        agent, batch, jax.random.PRNGKey(11), cfg, OBS_DIM, ACT_DIM
    )
    changed = any(
        not np.allclose(a, b)
        for a, b in zip(
            jax.tree.leaves(agent.actor_params),
            jax.tree.leaves(new_agent.actor_params),
        )
    )
    assert changed


def test_soft_target_update(agent, cfg):
    """Targets move toward online params by factor τ (ref test :139-165)."""
    batch = random_batch(jax.random.PRNGKey(12))
    new_agent, _ = sac_mod.update(
        agent, batch, jax.random.PRNGKey(13), cfg, OBS_DIM, ACT_DIM
    )
    t0 = jax.tree.leaves(agent.target_critic_params)
    t1 = jax.tree.leaves(new_agent.target_critic_params)
    o1 = jax.tree.leaves(new_agent.critic_params)
    moved = any(not np.allclose(a, b) for a, b in zip(t0, t1))
    assert moved
    # but only slightly: target stays much closer to old target than to online
    for a, b, o in zip(t0, t1, o1):
        if not np.allclose(a, o):
            assert np.abs(b - a).max() <= 0.01 * np.abs(o - a).max() + 1e-6


def test_alpha_positive_after_training(agent, cfg):
    """Automatic entropy tuning keeps α > 0 (ref test :220-242)."""
    a = agent
    key = jax.random.PRNGKey(14)
    for i in range(5):
        key, k1, k2 = jax.random.split(key, 3)
        a, m = sac_mod.update(a, random_batch(k1), k2, cfg, OBS_DIM, ACT_DIM)
    assert float(m["alpha"]) > 0.0


def test_replay_add_sample_wraparound():
    example = {"obs": jnp.zeros(3), "reward": jnp.float32(0)}
    buf = replay_mod.ReplayBuffer.create(8, example)
    batch = {
        "obs": jnp.arange(12, dtype=jnp.float32).reshape(4, 3),
        "reward": jnp.arange(4, dtype=jnp.float32),
    }
    buf = replay_mod.add_batch(buf, batch)
    assert int(buf.size) == 4 and int(buf.ptr) == 4
    buf = replay_mod.add_batch(buf, batch)
    buf = replay_mod.add_batch(buf, batch)  # wraps
    assert int(buf.size) == 8 and int(buf.ptr) == 4
    s = replay_mod.sample(buf, jax.random.PRNGKey(0), 16)
    assert s["obs"].shape == (16, 3)
    assert np.all(np.isfinite(np.asarray(s["obs"])))


def test_replay_rejects_bad_capacity():
    example = {"obs": jnp.zeros(3)}
    buf = replay_mod.ReplayBuffer.create(10, example)
    with pytest.raises(ValueError):
        replay_mod.add_batch(buf, {"obs": jnp.zeros((4, 3))})


def test_transformer_architecture_option():
    """SAC with the transformer policy (network.architecture_type parity)."""
    cfg = sac_mod.SACConfig(
        hidden_dims=(32, 32), batch_size=8, architecture="transformer",
        transformer_d_model=32, transformer_layers=1, transformer_heads=2,
    )
    agent = sac_mod.init(jax.random.PRNGKey(0), OBS_DIM, ACT_DIM, cfg)
    obs = jax.random.normal(jax.random.PRNGKey(1), (8, OBS_DIM))
    a = sac_mod.select_action(agent, obs, jax.random.PRNGKey(2), cfg, ACT_DIM)
    assert a.shape == (8, ACT_DIM)
    assert np.all(np.abs(np.asarray(a)) <= 1.0)
    batch = random_batch(jax.random.PRNGKey(3), n=8)
    agent2, metrics = sac_mod.update(
        agent, batch, jax.random.PRNGKey(4), cfg, OBS_DIM, ACT_DIM
    )
    assert np.isfinite(float(metrics["critic_loss"]))
    changed = any(
        not np.allclose(x, y)
        for x, y in zip(
            jax.tree.leaves(agent.actor_params),
            jax.tree.leaves(agent2.actor_params),
        )
    )
    assert changed
