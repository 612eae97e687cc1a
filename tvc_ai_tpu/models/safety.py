"""CBF-style safety layer — analytic projection + optional learned correction.

The reference's ``SafetyLayer`` (agent/multi_algorithm_agent.py:287-351)
checks tilt / angular-velocity / control-effort constraints and, on
violation, substitutes the output of a correction MLP that is NEVER trained
(SURVEY §2.2) — i.e. violations get replaced by random-init noise. Here the
default intervention is an *analytic* safe fallback (a stabilizing
proportional law on attitude + effort rescaling — deterministic, tuneless,
and correct by construction), with the learned correction MLP retained as an
opt-in head that is actually trainable (``correction_loss``).

Branch-free: the correction applies per-row via ``jnp.where`` masks, so it
vmaps/shards with the policy.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from tvc_ai_tpu.env.types import OBS_DIM


@dataclasses.dataclass(frozen=True)
class SafetyConstraints:
    """Thresholds mirroring the reference dataclass (:80-88) / config safety
    section (config/config.yaml:289-306)."""

    max_tilt: float = 0.52
    max_angular_velocity: float = 5.0
    min_altitude: float = 0.1
    max_altitude: float = 20.0
    max_control_effort: float = 1.0
    fuel_reserve: float = 0.1


def obs_safety_features(obs: jnp.ndarray):
    """tilt, |ω|, ω from a 10-D (or 8-D) observation.

    Uses the same euler extraction as the reference layer (:314-322), which
    matches our quaternion.to_euler_zyx / tilt_angle definitions.
    """
    quat = obs[..., :4]
    omega = obs[..., 4:7]
    x, y, z, w = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    s = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(s)
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    tilt = jnp.sqrt(pitch**2 + yaw**2)
    return tilt, jnp.linalg.norm(omega, axis=-1), omega, pitch, yaw


def violations(
    obs: jnp.ndarray, action: jnp.ndarray, c: SafetyConstraints
) -> jnp.ndarray:
    """Boolean per-row violation mask (tilt | ang-vel | effort), ref :324-336."""
    tilt, omega_mag, *_ = obs_safety_features(obs)
    effort = jnp.linalg.norm(action, axis=-1)
    return (
        (tilt > c.max_tilt)
        | (omega_mag > c.max_angular_velocity)
        | (effort > c.max_control_effort)
    )


def analytic_safe_action(
    obs: jnp.ndarray, action: jnp.ndarray, c: SafetyConstraints
) -> jnp.ndarray:
    """Deterministic safe fallback.

    - attitude violation → proportional-derivative stabilizing gimbal:
      command the thrust vector against the measured pitch/yaw error and
      angular rate (gains 2.0 / 0.5, clipped to [-1, 1]);
    - effort violation → rescale onto the unit ball.
    """
    tilt, omega_mag, omega, pitch, yaw = obs_safety_features(obs)
    # gimbal[0] drives pitch (body-y thrust), gimbal[1] drives yaw (body-x):
    # push against the current attitude error and damp rates
    stabilize = jnp.stack(
        [
            -2.0 * pitch - 0.5 * omega[..., 1],
            -2.0 * yaw - 0.5 * omega[..., 2],
        ],
        axis=-1,
    )
    stabilize = jnp.clip(stabilize, -1.0, 1.0)
    attitude_bad = (tilt > c.max_tilt) | (omega_mag > c.max_angular_velocity)
    out = jnp.where(attitude_bad[..., None], stabilize, action)
    effort = jnp.linalg.norm(out, axis=-1, keepdims=True)
    out = jnp.where(
        effort > c.max_control_effort,
        out * (c.max_control_effort / jnp.maximum(effort, 1e-8)),
        out,
    )
    return jnp.clip(out, -1.0, 1.0)


def apply_safety(
    obs: jnp.ndarray, action: jnp.ndarray, c: SafetyConstraints
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(safe_action, violation_mask) — correction only where violated
    (ref :337-351 semantics, analytic instead of untrained-net output)."""
    mask = violations(obs, action, c)
    safe = analytic_safe_action(obs, action, c)
    return jnp.where(mask[..., None], safe, action), mask


class SafetyCorrectionNet(nn.Module):
    """Optional learned correction head (ref safety_net :296-302), trainable."""

    action_dim: int = 2
    obs_dim: int = OBS_DIM

    @nn.compact
    def __call__(self, obs: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([obs, action], axis=-1)
        x = nn.relu(nn.Dense(128)(x))
        x = nn.relu(nn.Dense(64)(x))
        return jnp.clip(nn.Dense(self.action_dim)(x), -1.0, 1.0)


def correction_loss(
    net: SafetyCorrectionNet,
    params: Any,
    obs: jnp.ndarray,
    action: jnp.ndarray,
    c: SafetyConstraints,
) -> jnp.ndarray:
    """Train the correction toward the analytic safe action while staying
    close to the proposal — the training signal the reference never had."""
    corrected = net.apply(params, obs, action)
    target = analytic_safe_action(obs, action, c)
    mask = violations(obs, action, c).astype(jnp.float32)[..., None]
    to_target = jnp.sum(mask * (corrected - target) ** 2, axis=-1)
    stay_close = jnp.sum((1 - mask) * (corrected - action) ** 2, axis=-1)
    return jnp.mean(to_target + 0.1 * stay_close)
