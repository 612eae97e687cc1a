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


@pytest.mark.slow
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


def test_ema_actor_shadow():
    """EMA shadow actor (SACConfig.ema_decay): init copies θ, updates move it
    slowly toward θ, eval_actor_view serves it (round-3 oscillation fix)."""
    import jax.flatten_util  # noqa: F401

    cfg = sac_mod.SACConfig(
        hidden_dims=(32, 32), batch_size=8, ema_decay=0.9
    )
    agent = sac_mod.init(jax.random.PRNGKey(0), OBS_DIM, ACT_DIM, cfg)
    assert agent.ema_actor_params is not None
    flat0 = jax.flatten_util.ravel_pytree(agent.actor_params)[0]
    ema0 = jax.flatten_util.ravel_pytree(agent.ema_actor_params)[0]
    assert np.allclose(np.asarray(flat0), np.asarray(ema0))

    for i in range(5):
        k1, k2 = jax.random.split(jax.random.PRNGKey(i + 1))
        agent, _ = sac_mod.update(
            agent, random_batch(k1), k2, cfg, OBS_DIM, ACT_DIM
        )
    live = jax.flatten_util.ravel_pytree(agent.actor_params)[0]
    ema = jax.flatten_util.ravel_pytree(agent.ema_actor_params)[0]
    d_live = float(jnp.linalg.norm(live - flat0))
    d_ema = float(jnp.linalg.norm(ema - flat0))
    assert d_live > 0 and 0 < d_ema < d_live  # EMA lags the live actor

    view = sac_mod.eval_actor_view(agent, cfg)
    v = jax.flatten_util.ravel_pytree(view.actor_params)[0]
    assert np.allclose(np.asarray(v), np.asarray(ema))

    # off by default: no shadow, view is identity
    cfg0 = sac_mod.SACConfig(hidden_dims=(32, 32))
    a0 = sac_mod.init(jax.random.PRNGKey(0), OBS_DIM, ACT_DIM, cfg0)
    assert a0.ema_actor_params is None
    assert sac_mod.eval_actor_view(a0, cfg0) is a0


def test_bfloat16_compute_dtype():
    """compute_dtype=bfloat16: hidden matmuls run bf16 (MXU-native), params
    and action outputs stay fp32, one update step stays finite."""
    cfg = sac_mod.SACConfig(
        hidden_dims=(32, 32), batch_size=8, compute_dtype="bfloat16"
    )
    agent = sac_mod.init(jax.random.PRNGKey(0), OBS_DIM, ACT_DIM, cfg)
    leaves = jax.tree.leaves(agent.actor_params)
    assert all(l.dtype == jnp.float32 for l in leaves)  # params stored fp32
    obs = jax.random.normal(jax.random.PRNGKey(1), (8, OBS_DIM))
    a = sac_mod.select_action(agent, obs, jax.random.PRNGKey(2), cfg, ACT_DIM)
    assert a.dtype == jnp.float32
    assert np.all(np.abs(np.asarray(a)) <= 1.0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    agent, m = sac_mod.update(agent, random_batch(k1), k2, cfg, OBS_DIM, ACT_DIM)
    assert np.isfinite(float(m["critic_loss"]))
    assert np.isfinite(float(m["actor_loss"]))


@pytest.mark.slow
def test_bc_regularization_pulls_actor_toward_demo_actions():
    """SACConfig.bc_weight + a demo_mask batch: the Q-filtered BC term moves
    the policy mean toward demonstrated actions on demo states (the r4
    actor-side coupling for LQR demonstration seeding; replay-only demos
    measurably moved the critic but not the actor)."""
    import dataclasses

    cfg_bc = sac_mod.SACConfig(
        hidden_dims=(32, 32), batch_size=16, bc_weight=50.0,
        automatic_entropy_tuning=False, alpha=0.0,
    )
    agent_bc = sac_mod.init(jax.random.PRNGKey(1), OBS_DIM, ACT_DIM, cfg_bc)
    batch = random_batch(jax.random.PRNGKey(2))
    # all rows are demos with one fixed target action
    target = jnp.tile(jnp.array([0.7, -0.5]), (16, 1))
    batch = dict(batch, action=target, demo_mask=jnp.ones(16, jnp.float32))
    # a fresh random critic ranks ~half the demo actions above the policy's;
    # run several updates and check the mean action converges toward target
    agent = agent_bc
    for i in range(50):
        agent, metrics = sac_mod.update(
            agent, batch, jax.random.PRNGKey(100 + i), cfg_bc, OBS_DIM, ACT_DIM
        )
    assert "bc_loss" in metrics and np.isfinite(float(metrics["bc_loss"]))
    actor, _ = sac_mod.make_networks(OBS_DIM, ACT_DIM, cfg_bc)
    mean, _ = actor.apply(agent.actor_params, batch["obs"])
    err_bc = float(jnp.mean((jnp.tanh(mean) - target) ** 2))
    # same run WITHOUT BC for contrast
    cfg0 = dataclasses.replace(cfg_bc, bc_weight=0.0)
    agent0 = sac_mod.init(jax.random.PRNGKey(1), OBS_DIM, ACT_DIM, cfg0)
    b0 = {k: v for k, v in batch.items() if k != "demo_mask"}
    for i in range(50):
        agent0, m0 = sac_mod.update(
            agent0, b0, jax.random.PRNGKey(100 + i), cfg0, OBS_DIM, ACT_DIM
        )
    assert "bc_loss" not in m0
    mean0, _ = actor.apply(agent0.actor_params, batch["obs"])
    err_plain = float(jnp.mean((jnp.tanh(mean0) - target) ** 2))
    # the Q-filter admits only rows where the fresh random critic ranks the
    # demo action above the policy's (~half), so the pull is partial in 50
    # steps — require a clear but not total contraction
    assert err_bc < err_plain * 0.65, (err_bc, err_plain)
