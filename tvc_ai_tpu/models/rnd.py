"""Random Network Distillation — novelty-based exploration bonus.

The reference *configures* RND (config/config.yaml:129-132:
``random_network_distillation: {enabled, network_size: [256, 128],
update_frequency: 100}``) but never implements it anywhere in its tree
(SURVEY §5 exploration). Implemented here per the standard recipe
(Burda et al. 2018): a frozen randomly-initialized target network embeds
observations; a predictor network is trained to match it; the per-state
prediction error is the intrinsic novelty bonus. Running normalization of
the bonus keeps its scale stationary.

Pure functions over ``RNDState`` — fuses into the train program exactly like
the ICM path (``TrainLoopConfig.use_curiosity`` sibling).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct


@dataclasses.dataclass(frozen=True)
class RNDConfig:
    obs_dim: int = 8           # core observation slice, like the ICM's obs[:8]
    embed_dim: int = 64
    hidden_dims: tuple[int, ...] = (256, 128)  # reference network_size
    lr: float = 1e-4
    reward_scale: float = 0.01
    update_frequency: int = 100  # predictor updates every N calls (ref spec)

    def __post_init__(self):
        object.__setattr__(self, "hidden_dims", tuple(self.hidden_dims))


class _Embed(nn.Module):
    hidden_dims: tuple[int, ...]
    embed_dim: int

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        x = obs
        for h in self.hidden_dims:
            x = nn.relu(nn.Dense(h)(x))
        return nn.Dense(self.embed_dim)(x)


@struct.dataclass
class RNDState:
    target_params: Any      # frozen
    predictor_params: Any
    opt_state: Any
    step: jnp.ndarray
    # running normalization of the raw bonus (mean/var via Welford-ish EMA)
    bonus_mean: jnp.ndarray
    bonus_var: jnp.ndarray


def _net(cfg: RNDConfig) -> _Embed:
    return _Embed(hidden_dims=cfg.hidden_dims, embed_dim=cfg.embed_dim)


def init(key: jnp.ndarray, cfg: RNDConfig) -> RNDState:
    k_t, k_p = jax.random.split(key)
    dummy = jnp.zeros((1, cfg.obs_dim))
    net = _net(cfg)
    target = net.init(k_t, dummy)
    predictor = net.init(k_p, dummy)
    return RNDState(
        target_params=target,
        predictor_params=predictor,
        opt_state=optax.adam(cfg.lr).init(predictor),
        step=jnp.int32(0),
        bonus_mean=jnp.float32(0.0),
        bonus_var=jnp.float32(1.0),
    )


def raw_bonus(state: RNDState, obs: jnp.ndarray, cfg: RNDConfig) -> jnp.ndarray:
    """Per-sample squared prediction error on the core observation."""
    net = _net(cfg)
    o = obs[..., : cfg.obs_dim]
    target = jax.lax.stop_gradient(net.apply(state.target_params, o))
    pred = net.apply(state.predictor_params, o)
    return jnp.mean((pred - target) ** 2, axis=-1)


def intrinsic_reward(
    state: RNDState, obs: jnp.ndarray, cfg: RNDConfig
) -> jnp.ndarray:
    """Normalized novelty bonus × reward_scale."""
    err = raw_bonus(state, obs, cfg)
    return (
        (err - state.bonus_mean)
        / jnp.sqrt(jnp.maximum(state.bonus_var, 1e-8))
    ).clip(0.0) * cfg.reward_scale


def update(
    state: RNDState,
    obs: jnp.ndarray,
    cfg: RNDConfig,
    ema: float = 0.99,
    axis_name: str | None = None,
) -> tuple[RNDState, dict[str, jnp.ndarray]]:
    """One predictor gradient step + bonus-normalizer update.

    The reference's ``update_frequency: 100`` cadence is the CALLER's choice
    (e.g. ``step % 100 == 0`` in the loop); the update itself is always one
    step so it stays shape-static under jit.
    """
    net = _net(cfg)
    o = obs[..., : cfg.obs_dim]
    target = jax.lax.stop_gradient(net.apply(state.target_params, o))

    def loss_fn(params):
        pred = net.apply(params, o)
        return jnp.mean((pred - target) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(state.predictor_params)
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
    updates, opt_state = optax.adam(cfg.lr).update(
        grads, state.opt_state, state.predictor_params
    )
    predictor = optax.apply_updates(state.predictor_params, updates)

    err = raw_bonus(state, obs, cfg)
    batch_mean = jnp.mean(err)
    batch_var = jnp.var(err)
    if axis_name is not None:
        # keep the replicated normalizer state identical across shards
        batch_mean = jax.lax.pmean(batch_mean, axis_name)
        batch_var = jax.lax.pmean(batch_var, axis_name)
    new_state = state.replace(
        predictor_params=predictor,
        opt_state=opt_state,
        step=state.step + 1,
        bonus_mean=ema * state.bonus_mean + (1 - ema) * batch_mean,
        bonus_var=ema * state.bonus_var + (1 - ema) * batch_var,
    )
    return new_state, {"rnd_loss": loss, "rnd_bonus_mean": batch_mean}
