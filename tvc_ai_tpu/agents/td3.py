"""TD3 — twin delayed deterministic policy gradient, pure JAX.

Matches the reference TD3 member's algorithmics
(agent/multi_algorithm_agent.py:629-681 create, :1018-1086 update):
deterministic tanh policy, twin critics, target-policy smoothing noise 0.2
clipped at 0.5, delayed policy updates every 2 critic steps, τ=0.005 soft
targets, exploration noise 0.1 at act time. The delayed update is a
``lax.cond`` on the update counter so the whole thing stays one compiled
program.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tvc_ai_tpu.models.mlp import DeterministicActor, TwinQ


@dataclasses.dataclass(frozen=True)
class TD3Config:
    hidden_dims: tuple[int, ...] = (256, 256)
    lr: float = 3e-4
    gamma: float = 0.99
    tau: float = 0.005
    batch_size: int = 256
    buffer_size: int = 1_000_000
    learning_starts: int = 100
    policy_delay: int = 2
    target_policy_noise: float = 0.2
    target_noise_clip: float = 0.5
    exploration_noise: float = 0.1
    gradient_clip_norm: float = 10.0

    def __post_init__(self):
        object.__setattr__(self, "hidden_dims", tuple(self.hidden_dims))


@struct.dataclass
class TD3State:
    actor_params: Any
    critic_params: Any
    target_actor_params: Any
    target_critic_params: Any
    actor_opt: Any
    critic_opt: Any
    step: jnp.ndarray


def make_networks(obs_dim: int, action_dim: int, cfg: TD3Config):
    return (
        DeterministicActor(action_dim=action_dim, hidden_dims=cfg.hidden_dims),
        TwinQ(hidden_dims=cfg.hidden_dims),
    )


def _optim(cfg: TD3Config) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip_norm), optax.adam(cfg.lr)
    )


def init(key: jnp.ndarray, obs_dim: int, action_dim: int, cfg: TD3Config) -> TD3State:
    actor, critic = make_networks(obs_dim, action_dim, cfg)
    k_a, k_c = jax.random.split(key)
    dummy_obs = jnp.zeros((1, obs_dim), jnp.float32)
    dummy_act = jnp.zeros((1, action_dim), jnp.float32)
    actor_params = actor.init(k_a, dummy_obs)
    critic_params = critic.init(k_c, dummy_obs, dummy_act)
    return TD3State(
        actor_params=actor_params,
        critic_params=critic_params,
        target_actor_params=jax.tree.map(jnp.copy, actor_params),
        target_critic_params=jax.tree.map(jnp.copy, critic_params),
        actor_opt=_optim(cfg).init(actor_params),
        critic_opt=_optim(cfg).init(critic_params),
        step=jnp.int32(0),
    )


def select_action(
    state: TD3State,
    obs: jnp.ndarray,
    key: jnp.ndarray,
    cfg: TD3Config,
    action_dim: int,
    deterministic: bool = False,
) -> jnp.ndarray:
    actor = DeterministicActor(action_dim=action_dim, hidden_dims=cfg.hidden_dims)
    action = actor.apply(state.actor_params, obs)
    if deterministic:
        return action
    noise = jax.random.normal(key, action.shape) * cfg.exploration_noise
    return jnp.clip(action + noise, -1.0, 1.0)


def update(
    state: TD3State,
    batch: dict[str, jnp.ndarray],
    key: jnp.ndarray,
    cfg: TD3Config,
    obs_dim: int,
    action_dim: int,
    axis_name: str | None = None,
) -> tuple[TD3State, dict[str, jnp.ndarray]]:
    actor, critic = make_networks(obs_dim, action_dim, cfg)

    def maybe_pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name is not None else x

    # ---- critic with target-policy smoothing (ref :1030-1046)
    noise = jnp.clip(
        jax.random.normal(key, batch["action"].shape) * cfg.target_policy_noise,
        -cfg.target_noise_clip,
        cfg.target_noise_clip,
    )
    next_action = jnp.clip(
        actor.apply(state.target_actor_params, batch["next_obs"]) + noise,
        -1.0,
        1.0,
    )
    tq1, tq2 = critic.apply(
        state.target_critic_params, batch["next_obs"], next_action
    )
    target_q = batch["reward"] + cfg.gamma * (1.0 - batch["done"]) * jnp.minimum(
        tq1, tq2
    )
    target_q = jax.lax.stop_gradient(target_q)

    def critic_loss_fn(params):
        q1, q2 = critic.apply(params, batch["obs"], batch["action"])
        return jnp.mean((q1 - target_q) ** 2) + jnp.mean((q2 - target_q) ** 2)

    critic_loss, critic_grads = jax.value_and_grad(critic_loss_fn)(
        state.critic_params
    )
    critic_grads = maybe_pmean(critic_grads)
    c_up, critic_opt = _optim(cfg).update(
        critic_grads, state.critic_opt, state.critic_params
    )
    critic_params = optax.apply_updates(state.critic_params, c_up)

    # ---- delayed policy + target update (ref :1048-1080, delay 2)
    def do_policy_update(_):
        def actor_loss_fn(params):
            action = actor.apply(params, batch["obs"])
            q1, _ = critic.apply(critic_params, batch["obs"], action)
            return -jnp.mean(q1)

        actor_loss, actor_grads = jax.value_and_grad(actor_loss_fn)(
            state.actor_params
        )
        actor_grads = maybe_pmean(actor_grads)
        a_up, actor_opt = _optim(cfg).update(
            actor_grads, state.actor_opt, state.actor_params
        )
        actor_params = optax.apply_updates(state.actor_params, a_up)
        target_actor = jax.tree.map(
            lambda t, o: t * (1 - cfg.tau) + o * cfg.tau,
            state.target_actor_params,
            actor_params,
        )
        target_critic = jax.tree.map(
            lambda t, o: t * (1 - cfg.tau) + o * cfg.tau,
            state.target_critic_params,
            critic_params,
        )
        # device-mean the reported loss so both cond branches produce
        # replication-invariant types under shard_map
        return (
            actor_params, actor_opt, target_actor, target_critic,
            maybe_pmean(actor_loss),
        )

    def skip_policy_update(_):
        return (
            state.actor_params,
            state.actor_opt,
            state.target_actor_params,
            state.target_critic_params,
            jnp.float32(0.0),
        )

    actor_params, actor_opt, target_actor, target_critic, actor_loss = (
        jax.lax.cond(
            (state.step + 1) % cfg.policy_delay == 0,
            do_policy_update,
            skip_policy_update,
            None,
        )
    )

    new_state = TD3State(
        actor_params=actor_params,
        critic_params=critic_params,
        target_actor_params=target_actor,
        target_critic_params=target_critic,
        actor_opt=actor_opt,
        critic_opt=critic_opt,
        step=state.step + 1,
    )
    metrics = {"critic_loss": critic_loss, "actor_loss": actor_loss}
    return new_state, metrics
