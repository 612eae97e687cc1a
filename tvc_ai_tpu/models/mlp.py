"""MLP actor/critic networks (flax.linen).

The workhorse networks for SAC/TD3 — small dense stacks whose batched matmuls
(4096-env batches) land on the MXU. Shapes follow the legacy SAC API the
reference's eval/export/tests demand (SURVEY §0.1: hidden_dims, an actor
producing (mean, log_std), twin critics) and the live SAC member's critic
topology (agent/multi_algorithm_agent.py:592-612: obs+act → 512 → 256 → 1).

Orthogonal init gain √2 matches the reference's network init
(agent/multi_algorithm_agent.py:218-227).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


def _dense(
    features: int, name: str | None = None, dtype: Any = jnp.float32
) -> nn.Dense:
    # `dtype` is the COMPUTE dtype (flax casts inputs/params to it for the
    # matmul); params are stored fp32 regardless. bfloat16 puts the hidden
    # matmuls on the MXU's native precision (VERDICT r2 item 5); output
    # heads stay fp32 for numerics (see each module below).
    return nn.Dense(
        features,
        kernel_init=nn.initializers.orthogonal(jnp.sqrt(2.0)),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )


class GaussianActor(nn.Module):
    """obs → (mean, log_std) with tanh squashing applied by the caller."""

    action_dim: int
    hidden_dims: Sequence[int] = (256, 256)
    dtype: Any = jnp.float32  # compute dtype of the hidden stack

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        x = obs
        for i, h in enumerate(self.hidden_dims):
            x = _dense(h, name=f"hidden_{i}", dtype=self.dtype)(x)
            x = nn.relu(x)
        mean = _dense(self.action_dim, name="mean_head")(x)
        log_std = _dense(self.action_dim, name="log_std_head")(x)
        return mean, log_std


class DeterministicActor(nn.Module):
    """TD3-style tanh MLP policy (agent/multi_algorithm_agent.py:633-646)."""

    action_dim: int
    hidden_dims: Sequence[int] = (256, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        x = obs
        for i, h in enumerate(self.hidden_dims):
            x = _dense(h, name=f"hidden_{i}", dtype=self.dtype)(x)
            x = nn.relu(x)
        return jnp.tanh(_dense(self.action_dim, name="action_head")(x))


class QNetwork(nn.Module):
    """(obs, action) → scalar Q."""

    hidden_dims: Sequence[int] = (256, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([obs, action], axis=-1)
        for i, h in enumerate(self.hidden_dims):
            x = _dense(h, name=f"hidden_{i}", dtype=self.dtype)(x)
            x = nn.relu(x)
        return _dense(1, name="q_head")(x)[..., 0]


class TwinQ(nn.Module):
    """Two independent Q networks evaluated in one apply (clipped double-Q)."""

    hidden_dims: Sequence[int] = (256, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, obs: jnp.ndarray, action: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        q1 = QNetwork(self.hidden_dims, dtype=self.dtype, name="q1")(obs, action)
        q2 = QNetwork(self.hidden_dims, dtype=self.dtype, name="q2")(obs, action)
        return q1, q2


class ValueNetwork(nn.Module):
    """obs → scalar V (PPO baseline head)."""

    hidden_dims: Sequence[int] = (256, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        x = obs
        for i, h in enumerate(self.hidden_dims):
            x = _dense(h, name=f"hidden_{i}", dtype=self.dtype)(x)
            x = nn.relu(x)
        return _dense(1, name="v_head")(x)[..., 0]
