"""Intrinsic Curiosity Module (ICM) — forward/inverse models, actually trained.

Reimplements the reference's ``CuriosityModule``
(env/enhanced_rocket_tvc_env.py:226-269): inverse model (s,s')→a and forward
model (s,a)→s', both 2×256 ReLU MLPs with a joint Adam (lr 1e-4); intrinsic
reward = forward-model MSE × 0.01 on the 8-D core observation. The
reference's Adam was created but NEVER stepped (:251-255) — here ``update``
exists and the trainer calls it, so prediction error (and hence the bonus)
decays on familiar states as ICM intends.
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
class CuriosityConfig:
    obs_dim: int = 8  # core obs slice obs[:8] (ref :499)
    action_dim: int = 2
    hidden_dim: int = 256
    lr: float = 1e-4
    reward_scale: float = 0.01
    inverse_weight: float = 0.5


class _MLP(nn.Module):
    out_dim: int
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Dense(self.hidden_dim)(x))
        x = nn.relu(nn.Dense(self.hidden_dim)(x))
        return nn.Dense(self.out_dim)(x)


class ICMNetworks(nn.Module):
    cfg_obs_dim: int = 8
    cfg_action_dim: int = 2
    hidden_dim: int = 256

    def setup(self):
        self.forward_model = _MLP(self.cfg_obs_dim, self.hidden_dim)
        self.inverse_model = _MLP(self.cfg_action_dim, self.hidden_dim)

    def predict_next(self, obs, action):
        return self.forward_model(jnp.concatenate([obs, action], axis=-1))

    def predict_action(self, obs, next_obs):
        return self.inverse_model(jnp.concatenate([obs, next_obs], axis=-1))

    def __call__(self, obs, action, next_obs):
        return self.predict_next(obs, action), self.predict_action(obs, next_obs)


@struct.dataclass
class CuriosityState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def init(key: jnp.ndarray, cfg: CuriosityConfig) -> CuriosityState:
    net = ICMNetworks(cfg.obs_dim, cfg.action_dim, cfg.hidden_dim)
    params = net.init(
        key,
        jnp.zeros((1, cfg.obs_dim)),
        jnp.zeros((1, cfg.action_dim)),
        jnp.zeros((1, cfg.obs_dim)),
    )
    return CuriosityState(
        params=params,
        opt_state=optax.adam(cfg.lr).init(params),
        step=jnp.int32(0),
    )


def intrinsic_reward(
    state: CuriosityState,
    obs: jnp.ndarray,
    action: jnp.ndarray,
    next_obs: jnp.ndarray,
    cfg: CuriosityConfig,
) -> jnp.ndarray:
    """Per-sample forward-model MSE × reward_scale (ref :257-269)."""
    net = ICMNetworks(cfg.obs_dim, cfg.action_dim, cfg.hidden_dim)
    pred = net.apply(
        state.params, obs[..., : cfg.obs_dim], action, method=net.predict_next
    )
    err = jnp.mean((pred - next_obs[..., : cfg.obs_dim]) ** 2, axis=-1)
    return err * cfg.reward_scale


def update(
    state: CuriosityState,
    obs: jnp.ndarray,
    action: jnp.ndarray,
    next_obs: jnp.ndarray,
    cfg: CuriosityConfig,
    physics_loss_fn=None,
    axis_name: str | None = None,
) -> tuple[CuriosityState, dict[str, jnp.ndarray]]:
    """Joint forward+inverse gradient step (the training the reference skipped).

    ``physics_loss_fn(pred_next, obs, action)`` optionally adds the
    physics-informed consistency penalty (see agents.physics_informed) so the
    learned dynamics respect conservation structure. ``axis_name``
    pmean-reduces gradients so the replicated ICM params stay bit-identical
    across data-parallel shards.
    """
    net = ICMNetworks(cfg.obs_dim, cfg.action_dim, cfg.hidden_dim)
    o = obs[..., : cfg.obs_dim]
    no = next_obs[..., : cfg.obs_dim]

    def loss_fn(params):
        pred_next, pred_action = net.apply(params, o, action, no)
        fwd = jnp.mean((pred_next - no) ** 2)
        inv = jnp.mean((pred_action - action) ** 2)
        loss = fwd + cfg.inverse_weight * inv
        phys = jnp.float32(0.0)
        if physics_loss_fn is not None:
            phys = physics_loss_fn(pred_next, o, action)
            loss = loss + phys
        return loss, (fwd, inv, phys)

    (loss, (fwd, inv, phys)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
    updates, opt_state = optax.adam(cfg.lr).update(
        grads, state.opt_state, state.params
    )
    params = optax.apply_updates(state.params, updates)
    return (
        CuriosityState(params=params, opt_state=opt_state, step=state.step + 1),
        {
            "icm_loss": loss,
            "icm_forward_loss": fwd,
            "icm_inverse_loss": inv,
            "icm_physics_loss": phys,
        },
    )
