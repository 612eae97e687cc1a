"""Population (multi-agent) training tests — the vmapped-agents axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvc_ai_tpu.agents.sac import SACConfig
from tvc_ai_tpu.env.types import EnvParams
from tvc_ai_tpu.training import population as pop_mod


@pytest.fixture(scope="module")
def setup():
    sac_cfg = SACConfig(
        hidden_dims=(16, 16), batch_size=16, buffer_size=1024, learning_starts=32
    )
    pop_cfg = pop_mod.PopulationConfig(
        num_agents=3, envs_per_agent=4, rollout_steps=8
    )
    env_params = EnvParams()
    carry = pop_mod.init_population(
        jax.random.PRNGKey(0), env_params, sac_cfg, pop_cfg
    )
    return sac_cfg, pop_cfg, env_params, carry


@pytest.mark.integration
@pytest.mark.slow
def test_population_trains_independently(setup):
    sac_cfg, pop_cfg, env_params, carry = setup
    it = jax.jit(pop_mod.make_population_iteration(sac_cfg, pop_cfg))
    carry, metrics = it(carry, env_params)
    carry, metrics = it(carry, env_params)
    # per-agent metrics have the population axis
    assert metrics["reward_mean"].shape == (3,)
    assert np.all(np.isfinite(np.asarray(metrics["reward_mean"])))
    # agents initialized differently and trained on different data → diverged
    kernels = np.asarray(
        jax.tree.leaves(carry.agent.actor_params)[0]
    )
    assert not np.allclose(kernels[0], kernels[1])
    returns = pop_mod.population_returns(carry)
    assert returns.shape == (3,)


@pytest.mark.integration
def test_clone_winners_copies_agent_state(setup):
    sac_cfg, pop_cfg, env_params, carry = setup
    it = jax.jit(pop_mod.make_population_iteration(sac_cfg, pop_cfg))
    carry, _ = it(carry, env_params)
    returns = np.asarray(pop_mod.population_returns(carry))
    loser = int(np.argsort(returns)[0])
    winner_set = set(np.argsort(returns)[-1:])
    new_carry = pop_mod.clone_winners(carry, jax.random.PRNGKey(5), fraction=1 / 3)
    old_k = np.asarray(jax.tree.leaves(carry.agent.actor_params)[0])
    new_k = np.asarray(jax.tree.leaves(new_carry.agent.actor_params)[0])
    # the loser row now equals some winner's row
    assert any(np.allclose(new_k[loser], old_k[w]) for w in winner_set)
    # env state untouched
    assert np.allclose(
        np.asarray(carry.obs), np.asarray(new_carry.obs)
    )
