"""PPO — clipped surrogate + GAE, as one fused on-policy XLA program.

The reference's PPO member is a simplified REINFORCE-ish update with no
clipping and no GAE despite its config promising both
(agent/multi_algorithm_agent.py:914-948 vs config/config.yaml:21-33). This
is the real thing, built to that config's spec: clip 0.2, GAE λ=0.95,
entropy coef 0.01, value coef 0.5, grad-norm 0.5, multiple epochs of
minibatched updates per rollout.

One ``train_iteration`` = scan T env steps over N envs (collecting
obs/action/logp/value/reward/done), bootstrap + GAE (reverse scan), then
``n_epochs`` × minibatch gradient steps — all under one jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tvc_ai_tpu.env import rocket_env
from tvc_ai_tpu.env.types import EnvParams
from tvc_ai_tpu.models import distributions as dist
from tvc_ai_tpu.models.mlp import GaussianActor, ValueNetwork


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    hidden_dims: tuple[int, ...] = (256, 256)
    learning_rate: float = 2.5e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_range: float = 0.2
    ent_coef: float = 0.01
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    n_epochs: int = 10
    num_minibatches: int = 8
    normalize_advantages: bool = True

    def __post_init__(self):
        object.__setattr__(self, "hidden_dims", tuple(self.hidden_dims))


@struct.dataclass
class PPOState:
    actor_params: Any
    value_params: Any
    opt_state: Any
    step: jnp.ndarray


def make_networks(obs_dim: int, action_dim: int, cfg: PPOConfig):
    return (
        GaussianActor(action_dim=action_dim, hidden_dims=cfg.hidden_dims),
        ValueNetwork(hidden_dims=cfg.hidden_dims),
    )


def _optim(cfg: PPOConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.learning_rate),
    )


def init(key: jnp.ndarray, obs_dim: int, action_dim: int, cfg: PPOConfig) -> PPOState:
    actor, value = make_networks(obs_dim, action_dim, cfg)
    k_a, k_v = jax.random.split(key)
    dummy = jnp.zeros((1, obs_dim), jnp.float32)
    actor_params = actor.init(k_a, dummy)
    value_params = value.init(k_v, dummy)
    return PPOState(
        actor_params=actor_params,
        value_params=value_params,
        opt_state=_optim(cfg).init((actor_params, value_params)),
        step=jnp.int32(0),
    )


def select_action(
    state: PPOState,
    obs: jnp.ndarray,
    key: jnp.ndarray,
    cfg: PPOConfig,
    action_dim: int,
    deterministic: bool = False,
) -> jnp.ndarray:
    actor, _ = make_networks(obs.shape[-1], action_dim, cfg)
    mean, log_std = actor.apply(state.actor_params, obs)
    if deterministic:
        return dist.deterministic_action(mean)
    action, _ = dist.sample_and_log_prob(key, mean, log_std)
    return action


def compute_gae(
    rewards: jnp.ndarray,    # (T, N)
    values: jnp.ndarray,     # (T, N)
    dones: jnp.ndarray,      # (T, N) — terminated (bootstrap through truncation)
    last_value: jnp.ndarray,  # (N,)
    gamma: float,
    lam: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reverse-scan GAE; returns (advantages, returns)."""

    def scan_fn(carry, xs):
        gae, next_value = carry
        reward, value, done = xs
        nonterminal = 1.0 - done
        delta = reward + gamma * next_value * nonterminal - value
        gae = delta + gamma * lam * nonterminal * gae
        return (gae, value), gae

    (_, _), adv_rev = jax.lax.scan(
        scan_fn,
        (jnp.zeros_like(last_value), last_value),
        (rewards[::-1], values[::-1], dones[::-1]),
    )
    advantages = adv_rev[::-1]
    return advantages, advantages + values


def update(
    state: PPOState,
    batch: dict[str, jnp.ndarray],  # flat (B, ...) minibatch
    cfg: PPOConfig,
    key: jnp.ndarray,
    action_dim: int,
    axis_name: str | None = None,
) -> tuple[PPOState, dict[str, jnp.ndarray]]:
    """One clipped-surrogate gradient step on a minibatch with keys
    obs/pre_tanh/log_prob/advantage/return."""
    actor, value = make_networks(batch["obs"].shape[-1], action_dim, cfg)

    def loss_fn(params):
        actor_params, value_params = params
        mean, log_std = actor.apply(actor_params, batch["obs"])
        logp = dist.log_prob(mean, log_std, batch["pre_tanh"])
        ratio = jnp.exp(logp - batch["log_prob"])
        adv = batch["advantage"]
        if cfg.normalize_advantages:
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        unclipped = ratio * adv
        clipped = jnp.clip(ratio, 1 - cfg.clip_range, 1 + cfg.clip_range) * adv
        policy_loss = -jnp.mean(jnp.minimum(unclipped, clipped))
        v = value.apply(value_params, batch["obs"])
        value_loss = jnp.mean((v - batch["return"]) ** 2)
        # pre-squash Gaussian entropy: Σ(log σ) + const (tanh correction
        # omitted — constant offset w.r.t. the gradient through log_std)
        entropy = jnp.mean(
            jnp.sum(
                dist.clamp_log_std(log_std)
                + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e),
                axis=-1,
            )
        )
        total = (
            policy_loss + cfg.vf_coef * value_loss - cfg.ent_coef * entropy
        )
        approx_kl = jnp.mean(batch["log_prob"] - logp)
        clip_frac = jnp.mean(
            (jnp.abs(ratio - 1.0) > cfg.clip_range).astype(jnp.float32)
        )
        return total, (policy_loss, value_loss, entropy, approx_kl, clip_frac)

    (total, (policy_loss, value_loss, entropy, approx_kl, clip_frac)), grads = (
        jax.value_and_grad(loss_fn, has_aux=True)(
            (state.actor_params, state.value_params)
        )
    )
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
    updates, opt_state = _optim(cfg).update(
        grads, state.opt_state, (state.actor_params, state.value_params)
    )
    actor_params, value_params = optax.apply_updates(
        (state.actor_params, state.value_params), updates
    )
    new_state = PPOState(
        actor_params=actor_params,
        value_params=value_params,
        opt_state=opt_state,
        step=state.step + 1,
    )
    return new_state, {
        "ppo_loss": total,
        "policy_loss": policy_loss,
        "value_loss": value_loss,
        "entropy": entropy,
        "approx_kl": approx_kl,
        "clip_fraction": clip_frac,
    }


def make_train_iteration(
    cfg: PPOConfig,
    num_envs: int,
    rollout_steps: int,
    obs_dim: int,
    action_dim: int,
    axis_name: str | None = None,
):
    """Fused on-policy iteration:
    ``(ppo_state, env_states, obs, key, env_params) -> (..., metrics)``."""
    batched_step = jax.vmap(rocket_env.step_autoreset, in_axes=(0, 0, None))
    actor = GaussianActor(action_dim=action_dim, hidden_dims=tuple(cfg.hidden_dims))
    value_net = ValueNetwork(hidden_dims=tuple(cfg.hidden_dims))
    batch_size = num_envs * rollout_steps
    mb_size = max(batch_size // cfg.num_minibatches, 1)

    def collect_step(carry, _):
        ppo_state, env_states, obs, key, env_params = carry
        key, k_act = jax.random.split(key)
        mean, log_std = actor.apply(ppo_state.actor_params, obs)
        log_std = dist.clamp_log_std(log_std)
        noise = jax.random.normal(k_act, mean.shape)
        pre_tanh = mean + jnp.exp(log_std) * noise
        action = jnp.tanh(pre_tanh)
        logp = dist.log_prob(mean, log_std, pre_tanh)
        v = value_net.apply(ppo_state.value_params, obs)
        env_states, out, next_obs = batched_step(env_states, action, env_params)
        traj = {
            "obs": obs,
            "pre_tanh": pre_tanh,
            "log_prob": logp,
            "value": v,
            "reward": out.reward,
            "done": out.terminated.astype(jnp.float32),
            "any_done": (out.terminated | out.truncated).astype(jnp.float32),
            "success": (
                (out.terminated | out.truncated) & out.mission_success
            ).astype(jnp.float32),
        }
        return (ppo_state, env_states, next_obs, key, env_params), traj

    def train_iteration(ppo_state, env_states, obs, key, env_params: EnvParams):
        (ppo_state, env_states, obs, key, env_params), traj = jax.lax.scan(
            collect_step,
            (ppo_state, env_states, obs, key, env_params),
            None,
            length=rollout_steps,
        )
        last_value = value_net.apply(ppo_state.value_params, obs)
        advantages, returns = compute_gae(
            traj["reward"], traj["value"], traj["done"], last_value,
            cfg.gamma, cfg.gae_lambda,
        )
        flat = {
            "obs": traj["obs"].reshape(batch_size, obs_dim),
            "pre_tanh": traj["pre_tanh"].reshape(batch_size, action_dim),
            "log_prob": traj["log_prob"].reshape(batch_size),
            "advantage": advantages.reshape(batch_size),
            "return": returns.reshape(batch_size),
        }

        def epoch(carry, _):
            ppo_state, key = carry
            key, k_perm, k_up = jax.random.split(key, 3)
            perm = jax.random.permutation(k_perm, batch_size)

            def minibatch(carry, idx):
                ppo_state, key = carry
                mb = {k: v[idx] for k, v in flat.items()}
                ppo_state, metrics = update(
                    ppo_state, mb, cfg, key, action_dim, axis_name
                )
                return (ppo_state, key), metrics

            mb_idx = perm[: mb_size * cfg.num_minibatches].reshape(
                cfg.num_minibatches, mb_size
            )
            (ppo_state, _), metrics = jax.lax.scan(
                minibatch, (ppo_state, k_up), mb_idx
            )
            return (ppo_state, key), jax.tree.map(jnp.mean, metrics)

        (ppo_state, key), metrics = jax.lax.scan(
            epoch, (ppo_state, key), None, length=cfg.n_epochs
        )
        metrics = jax.tree.map(jnp.mean, metrics)
        metrics["reward_mean"] = jnp.mean(traj["reward"])
        ep_done = jnp.sum(traj["any_done"])
        metrics["success_rate"] = jnp.sum(traj["success"]) / jnp.maximum(
            ep_done, 1.0
        )
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return ppo_state, env_states, obs, key, metrics

    return train_iteration
