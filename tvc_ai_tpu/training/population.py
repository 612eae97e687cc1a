"""Population training: P independent SAC agents over one env batch — vmapped.

The reference stubs multi-agent population training
(``experimental.multi_agent: {enabled: false, num_agents: 4}``,
config/config.yaml:442-446) and SURVEY §2.4 notes it is "trivially
vmappable (per-env agent params)". This module makes that real: the agent
axis is just another vmap dimension.

Layout: N envs split into P groups of N/P. Every pytree in the carry gains a
leading P axis — P agents, P replay shards, P env groups — and the whole
per-agent train iteration (the same ``training.loop`` code) is vmapped over
it. One compiled program trains the entire population; on a mesh this
composes with data parallelism by sharding the population axis.

Uses: seed/hyperparameter-robustness studies and population-based selection
(the ensemble's performance windows generalize: rank agents by their group's
episode returns, clone winners over losers with ``clone_winners``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tvc_ai_tpu.agents import sac as sac_mod
from tvc_ai_tpu.env.types import EnvParams
from tvc_ai_tpu.training import loop as loop_mod


@dataclasses.dataclass(frozen=True)
class PopulationConfig:
    num_agents: int = 4
    envs_per_agent: int = 128
    rollout_steps: int = 64
    updates_per_step: int = 1


def init_population(
    key: jnp.ndarray,
    env_params: EnvParams,
    sac_cfg: sac_mod.SACConfig,
    pop_cfg: PopulationConfig,
) -> loop_mod.TrainCarry:
    """Carry with leading agent axis P on every leaf."""
    loop_cfg = loop_mod.TrainLoopConfig(
        num_envs=pop_cfg.envs_per_agent,
        rollout_steps=pop_cfg.rollout_steps,
        updates_per_step=pop_cfg.updates_per_step,
    )
    keys = jax.random.split(key, pop_cfg.num_agents)
    return jax.vmap(
        lambda k: loop_mod.init_carry(k, env_params, sac_cfg, loop_cfg)
    )(keys)


def make_population_iteration(
    sac_cfg: sac_mod.SACConfig, pop_cfg: PopulationConfig
):
    """(pop_carry, env_params) -> (pop_carry, per-agent metrics [P])."""
    loop_cfg = loop_mod.TrainLoopConfig(
        num_envs=pop_cfg.envs_per_agent,
        rollout_steps=pop_cfg.rollout_steps,
        updates_per_step=pop_cfg.updates_per_step,
    )
    iteration = loop_mod.make_train_iteration(sac_cfg, loop_cfg)
    return jax.vmap(iteration, in_axes=(0, None))


def population_returns(carry: loop_mod.TrainCarry) -> jnp.ndarray:
    """(P,) mean finished-episode return per agent."""
    eps = jnp.maximum(jnp.sum(carry.episodes, axis=-1), 1)
    return jnp.sum(carry.return_sum, axis=-1) / eps


def clone_winners(
    carry: loop_mod.TrainCarry, key: jnp.ndarray, fraction: float = 0.25
) -> loop_mod.TrainCarry:
    """PBT-style exploit step: the bottom ``fraction`` of agents copy the
    agent state (params + optimizers + temperature) of uniformly-sampled
    top-``fraction`` agents. Envs/replay stay local so learning diverges
    again immediately (explore via different data)."""
    returns = population_returns(carry)
    p = returns.shape[0]
    n_cut = max(int(p * fraction), 1)
    order = jnp.argsort(returns)  # ascending
    losers = order[:n_cut]
    winners = order[-n_cut:]
    src_for_loser = winners[
        jax.random.randint(key, (n_cut,), 0, n_cut)
    ]

    def replace_rows(leaf):
        return leaf.at[losers].set(leaf[src_for_loser])

    new_agent = jax.tree.map(replace_rows, carry.agent)
    return carry.replace(agent=new_agent)
