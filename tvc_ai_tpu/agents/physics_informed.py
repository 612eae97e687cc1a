"""Physics-informed consistency loss — wired into a learnable model.

Reimplements ``PhysicsInformedLoss`` (agent/multi_algorithm_agent.py:229-285)
with the same three terms and constants (control-torque coupling 0.1, energy
coupling 0.01, weight 0.1):

1. angular-momentum consistency: ω' ≈ ω + 0.1·‖a‖·1⃗
2. kinetic-energy consistency: ½‖ω'‖² ≈ ½‖ω‖² + 0.01·½‖a‖²
3. quaternion-norm regularization: ‖q‖, ‖q'‖ ≈ 1

The reference computed this on replay batches and merely *reported* it
(update() at :882-907 — no optimizer saw it). Here it regularizes the ICM
forward model's predicted next state (``models.curiosity.update`` accepts it
as ``physics_loss_fn``), where gradients actually flow — prediction targets
sampled from the simulator cannot be "optimized", predictions can.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PhysicsInformedConfig:
    physics_weight: float = 0.1
    torque_coupling: float = 0.1
    energy_coupling: float = 0.01


def physics_informed_loss(
    states: jnp.ndarray,       # (B, ≥7): [quat(4), ω(3), ...]
    actions: jnp.ndarray,      # (B, A)
    next_states: jnp.ndarray,  # (B, ≥7)
    cfg: PhysicsInformedConfig = PhysicsInformedConfig(),
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    quat = states[..., :4]
    omega = states[..., 4:7]
    next_quat = next_states[..., :4]
    next_omega = next_states[..., 4:7]

    control_torque = (
        jnp.linalg.norm(actions, axis=-1, keepdims=True) * cfg.torque_coupling
    )
    expected_omega = omega + control_torque  # broadcast over 3 axes (ref :258-260)
    momentum_loss = jnp.mean((next_omega - expected_omega) ** 2)

    kinetic = 0.5 * jnp.sum(omega**2, axis=-1)
    next_kinetic = 0.5 * jnp.sum(next_omega**2, axis=-1)
    control_energy = 0.5 * jnp.sum(actions**2, axis=-1)
    energy_loss = jnp.mean(
        (next_kinetic - (kinetic + control_energy * cfg.energy_coupling)) ** 2
    )

    quat_norm_loss = jnp.mean(
        (jnp.linalg.norm(quat, axis=-1) - 1.0) ** 2
    ) + jnp.mean((jnp.linalg.norm(next_quat, axis=-1) - 1.0) ** 2)

    losses = {
        "momentum_conservation": momentum_loss,
        "energy_conservation": energy_loss,
        "quaternion_normalization": quat_norm_loss,
    }
    total = sum(losses.values()) * cfg.physics_weight
    return total, losses


def make_icm_physics_loss(cfg: PhysicsInformedConfig = PhysicsInformedConfig()):
    """Adapter matching ``models.curiosity.update(physics_loss_fn=...)``:
    penalize the FORWARD MODEL's predicted next state for violating the
    consistency terms (gradients reach the model, unlike the reference)."""

    def fn(pred_next, obs, action):
        total, _ = physics_informed_loss(obs, action, pred_next, cfg)
        return total

    return fn
