"""Tanh-squashed Gaussian policy head math.

Pure functions (no distrax dependency): sampling via reparameterization and
the change-of-variables log-prob with the numerically-stable softplus form of
log(1 - tanh²(u)) = 2·(log 2 - u - softplus(-2u)).

The reference clamps log_std to [-20, 2] in its policy heads
(agent/multi_algorithm_agent.py:205-207); same bounds here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG_STD_MIN = -20.0
LOG_STD_MAX = 2.0


def clamp_log_std(log_std: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)


def sample_and_log_prob(
    key: jnp.ndarray, mean: jnp.ndarray, log_std: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reparameterized tanh-Gaussian sample and its log-prob (summed over dims)."""
    log_std = clamp_log_std(log_std)
    std = jnp.exp(log_std)
    noise = jax.random.normal(key, mean.shape, mean.dtype)
    pre_tanh = mean + std * noise
    action = jnp.tanh(pre_tanh)

    gauss_logp = -0.5 * (noise**2 + 2.0 * log_std + jnp.log(2.0 * jnp.pi))
    # log|d tanh(u)/du| = log(1 - tanh²u), stable softplus form
    correction = 2.0 * (jnp.log(2.0) - pre_tanh - jax.nn.softplus(-2.0 * pre_tanh))
    log_prob = jnp.sum(gauss_logp - correction, axis=-1)
    return action, log_prob


def log_prob(
    mean: jnp.ndarray, log_std: jnp.ndarray, pre_tanh: jnp.ndarray
) -> jnp.ndarray:
    """Log-prob of a given pre-tanh action under the tanh-Gaussian."""
    log_std = clamp_log_std(log_std)
    std = jnp.exp(log_std)
    z = (pre_tanh - mean) / std
    gauss_logp = -0.5 * (z**2 + 2.0 * log_std + jnp.log(2.0 * jnp.pi))
    correction = 2.0 * (jnp.log(2.0) - pre_tanh - jax.nn.softplus(-2.0 * pre_tanh))
    return jnp.sum(gauss_logp - correction, axis=-1)


def deterministic_action(mean: jnp.ndarray) -> jnp.ndarray:
    return jnp.tanh(mean)
