"""Hierarchical agent: high-level goal selection + goal-conditioned control.

Reimplements ``HierarchicalAgent`` (agent/multi_algorithm_agent.py:353-417):
a GELU+LayerNorm MLP picks one of 4 discrete goals
(hover/land/recover/maintain_altitude) by softmax-multinomial sampling; the
low-level transformer policy consumes state ‖ goal-onehot. Differences from
the reference, deliberate:

- the high level is TRAINABLE (REINFORCE on episode return with a moving
  baseline) — the reference defined optimizers (:388-390) but never stepped
  the high level;
- the unused goal-embedding table (:385, dead code) is dropped.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from tvc_ai_tpu.models.transformer import TransformerPolicyNetwork

GOALS = ("hover", "land", "recover", "maintain_altitude")


@dataclasses.dataclass(frozen=True)
class HierarchicalConfig:
    num_goals: int = len(GOALS)
    high_level_lr: float = 1e-4
    low_level_lr: float = 3e-4
    d_model: int = 256
    num_layers: int = 4


class HighLevelPolicy(nn.Module):
    """obs → goal logits (ref :367-375: 256→128→goals, GELU+LayerNorm)."""

    num_goals: int = len(GOALS)

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(256)(obs)
        x = nn.gelu(x)
        x = nn.LayerNorm()(x)
        x = nn.Dense(128)(x)
        x = nn.gelu(x)
        x = nn.LayerNorm()(x)
        return nn.Dense(self.num_goals)(x)


@struct.dataclass
class HierarchicalState:
    high_params: Any
    low_params: Any
    high_opt: Any
    low_opt: Any
    baseline: jnp.ndarray  # moving-average return baseline for REINFORCE


def make_networks(obs_dim: int, action_dim: int, cfg: HierarchicalConfig):
    high = HighLevelPolicy(num_goals=cfg.num_goals)
    low = TransformerPolicyNetwork(
        action_dim=action_dim, d_model=cfg.d_model, num_layers=cfg.num_layers
    )
    return high, low


def init(
    key: jnp.ndarray, obs_dim: int, action_dim: int, cfg: HierarchicalConfig
) -> HierarchicalState:
    high, low = make_networks(obs_dim, action_dim, cfg)
    k_h, k_l = jax.random.split(key)
    dummy = jnp.zeros((1, obs_dim), jnp.float32)
    dummy_goal = jnp.zeros((1, obs_dim + cfg.num_goals), jnp.float32)
    high_params = high.init(k_h, dummy)
    low_params = low.init(k_l, dummy_goal)
    return HierarchicalState(
        high_params=high_params,
        low_params=low_params,
        high_opt=optax.adam(cfg.high_level_lr).init(high_params),
        low_opt=optax.adam(cfg.low_level_lr).init(low_params),
        baseline=jnp.float32(0.0),
    )


def select_goal(
    state: HierarchicalState,
    obs: jnp.ndarray,
    key: jnp.ndarray,
    cfg: HierarchicalConfig,
) -> jnp.ndarray:
    """Softmax-multinomial goal sampling (ref :397-403)."""
    high, _ = make_networks(obs.shape[-1], 2, cfg)
    logits = high.apply(state.high_params, obs)
    return jax.random.categorical(key, logits, axis=-1)


def get_action(
    state: HierarchicalState,
    obs: jnp.ndarray,
    goal_idx: jnp.ndarray,
    cfg: HierarchicalConfig,
    action_dim: int = 2,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(mean, log_std, value) from the goal-conditioned low level (ref :405-417)."""
    _, low = make_networks(obs.shape[-1], action_dim, cfg)
    onehot = jax.nn.one_hot(goal_idx, cfg.num_goals, dtype=obs.dtype)
    return low.apply(state.low_params, jnp.concatenate([obs, onehot], axis=-1))


def update_high_level(
    state: HierarchicalState,
    obs: jnp.ndarray,        # (B, obs_dim) states where goals were chosen
    goal_idx: jnp.ndarray,   # (B,)
    returns: jnp.ndarray,    # (B,) episode/segment returns
    cfg: HierarchicalConfig,
) -> tuple[HierarchicalState, dict[str, jnp.ndarray]]:
    """REINFORCE with moving baseline — the training the reference omitted."""
    high, _ = make_networks(obs.shape[-1], 2, cfg)
    advantage = returns - state.baseline

    def loss_fn(params):
        logits = high.apply(params, obs)
        logp = jax.nn.log_softmax(logits, axis=-1)
        chosen = jnp.take_along_axis(logp, goal_idx[..., None], axis=-1)[..., 0]
        return -jnp.mean(chosen * jax.lax.stop_gradient(advantage))

    loss, grads = jax.value_and_grad(loss_fn)(state.high_params)
    updates, high_opt = optax.adam(cfg.high_level_lr).update(
        grads, state.high_opt, state.high_params
    )
    high_params = optax.apply_updates(state.high_params, updates)
    baseline = 0.99 * state.baseline + 0.01 * jnp.mean(returns)
    return (
        state.replace(
            high_params=high_params, high_opt=high_opt, baseline=baseline
        ),
        {"high_level_loss": loss, "baseline": baseline},
    )


# ---------------------------------------------------------------------------
# Fused-loop high level: goal policy trained by masked REINFORCE on finished-
# episode returns while the goal-conditioned LOW level is the SAC actor on
# [obs ‖ goal-onehot] (training.loop use_hierarchical). This is the
# production path the reference never had — its HierarchicalAgent defined
# optimizers (:388-390) but no training step ever ran.


@struct.dataclass
class HighLevelState:
    params: Any
    opt_state: Any
    baseline: jnp.ndarray
    step: jnp.ndarray


def init_high(
    key: jnp.ndarray, obs_dim: int, cfg: HierarchicalConfig
) -> HighLevelState:
    high = HighLevelPolicy(num_goals=cfg.num_goals)
    params = high.init(key, jnp.zeros((1, obs_dim), jnp.float32))
    return HighLevelState(
        params=params,
        opt_state=optax.adam(cfg.high_level_lr).init(params),
        baseline=jnp.float32(0.0),
        step=jnp.int32(0),
    )


def sample_goal(
    state: HighLevelState,
    obs: jnp.ndarray,
    key: jnp.ndarray,
    cfg: HierarchicalConfig,
    deterministic: bool = False,
) -> jnp.ndarray:
    """Goal index per row — softmax-multinomial like the ref (:397-403),
    argmax when deterministic (evaluation)."""
    high = HighLevelPolicy(num_goals=cfg.num_goals)
    logits = high.apply(state.params, obs)
    if deterministic:
        return jnp.argmax(logits, axis=-1)
    return jax.random.categorical(key, logits, axis=-1)


def update_high_masked(
    state: HighLevelState,
    obs: jnp.ndarray,        # (B, obs_dim) obs at goal selection
    goal_idx: jnp.ndarray,   # (B,)
    returns: jnp.ndarray,    # (B,)
    mask: jnp.ndarray,       # (B,) 1.0 = valid episode sample
    cfg: HierarchicalConfig,
    axis_name: str | None = None,
) -> tuple[HighLevelState, dict[str, jnp.ndarray]]:
    """Masked REINFORCE step over a ring of finished episodes (invalid slots
    contribute zero); grads/stats pmean'd across data-parallel shards."""
    high = HighLevelPolicy(num_goals=cfg.num_goals)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    advantage = (returns - state.baseline) * mask

    def loss_fn(params):
        logits = high.apply(params, obs)
        logp = jax.nn.log_softmax(logits, axis=-1)
        chosen = jnp.take_along_axis(logp, goal_idx[..., None], axis=-1)[..., 0]
        return -jnp.sum(chosen * jax.lax.stop_gradient(advantage)) / denom

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    mean_return = jnp.sum(returns * mask) / denom
    has_any = (jnp.sum(mask) > 0).astype(jnp.float32)
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        mean_return = jax.lax.pmean(mean_return, axis_name)
        has_any = jax.lax.pmean(has_any, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
    updates, opt_state = optax.adam(cfg.high_level_lr).update(
        grads, state.opt_state, state.params
    )
    params = optax.apply_updates(state.params, updates)
    # freeze everything when no shard saw a finished episode this iteration
    skip = has_any == 0.0
    params = jax.tree.map(
        lambda new, old: jnp.where(skip, old, new), params, state.params
    )
    opt_state = jax.tree.map(
        lambda new, old: jnp.where(skip, old, new), opt_state, state.opt_state
    )
    baseline = jnp.where(
        skip, state.baseline, 0.9 * state.baseline + 0.1 * mean_return
    )
    return (
        state.replace(
            params=params,
            opt_state=opt_state,
            baseline=baseline,
            step=state.step + (has_any > 0).astype(jnp.int32),
        ),
        {"high_level_loss": loss, "high_level_baseline": baseline},
    )
