"""Multi-objective reward with anti-hacking terms — pure & batchable.

Reimplements the reference's ``MultiObjectiveReward``
(env/enhanced_rocket_tvc_env.py:73-224) as one branch-free function.

Deviation notes (documented, behavior-preserving in practice):
- The reference's "diversity bonus" checks that >80 % of up to 1000 stored
  float rewards are *unique* (:221-223). Continuous rewards are essentially
  always unique, so the bonus is effectively constant; we grant it whenever
  the rolling window holds ≥2 non-identical values — same observable effect
  without a 1000-float ring per env.
- The variance penalty uses a 10-step rolling window exactly as the
  reference's ``reward_history[-10:]`` slice (:214-218).
"""

from __future__ import annotations

import jax.numpy as jnp

from tvc_ai_tpu.env.types import PHASE_LANDING, RewardConfig


def compute_reward(
    cfg: RewardConfig,
    *,
    altitude: jnp.ndarray,
    tilt: jnp.ndarray,
    angular_velocity_mag: jnp.ndarray,
    fuel: jnp.ndarray,
    crashed: jnp.ndarray,
    mission_successful: jnp.ndarray,  # pre-update flag, like the reference's stale state_dict
    phase: jnp.ndarray,               # pre-update phase
    action: jnp.ndarray,              # (..., 2), already clipped
    prev_action: jnp.ndarray,
    has_prev_action: jnp.ndarray,
    reward_window: jnp.ndarray,       # (..., W) rolling recent totals
    reward_window_len: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, dict[str, jnp.ndarray]]:
    """Returns (total_reward, new_window, new_window_len, components)."""
    f32 = altitude.dtype
    effort = jnp.linalg.norm(action, axis=-1)

    # --- primary objectives (ref :93-99)
    mission_completion = jnp.where(
        mission_successful, 1.0, jnp.where(phase == PHASE_LANDING, 0.1, 0.0)
    ).astype(f32)

    tilt_term = jnp.exp(-10.0 * jnp.maximum(0.0, tilt - 0.087))
    ang_term = jnp.exp(-5.0 * jnp.maximum(0.0, angular_velocity_mag - 0.1))
    alt_term = jnp.where((altitude >= 0.2) & (altitude <= 20.0), 1.0, 0.5)
    safety_compliance = (tilt_term + ang_term + alt_term) / 3.0

    fuel_efficiency = jnp.where(
        (fuel > 0.1) & (effort < 0.5), fuel * (1.0 - effort), 0.0
    )

    # --- secondary objectives (ref :102-108)
    stability_bonus = jnp.where(
        (tilt < 0.05) & (angular_velocity_mag < 0.1),
        1.0,
        jnp.where((tilt < 0.1) & (angular_velocity_mag < 0.2), 0.5, 0.0),
    )
    action_diff = jnp.linalg.norm(action - prev_action, axis=-1)
    control_smoothness = jnp.where(has_prev_action, jnp.exp(-5.0 * action_diff), 1.0)
    altitude_maintenance = jnp.exp(-2.0 * jnp.abs(altitude - cfg.target_altitude))

    # --- penalties (ref :189-207)
    crash_penalty = jnp.where(crashed, cfg.crash_penalty, 0.0)
    excessive_tilt = jnp.where(
        tilt > cfg.excessive_tilt_threshold,
        cfg.excessive_tilt_scale * (tilt - cfg.excessive_tilt_threshold),
        0.0,
    )
    control_saturation = jnp.where(
        effort > cfg.saturation_threshold,
        cfg.saturation_scale * (effort - cfg.saturation_threshold),
        0.0,
    )

    components = {
        "mission_completion": mission_completion * cfg.mission_completion_weight,
        "safety_compliance": safety_compliance * cfg.safety_compliance_weight,
        "fuel_efficiency": fuel_efficiency * cfg.fuel_efficiency_weight,
        "stability_bonus": stability_bonus * cfg.stability_bonus_weight,
        "control_smoothness": control_smoothness * cfg.control_smoothness_weight,
        "altitude_maintenance": altitude_maintenance * cfg.altitude_maintenance_weight,
        "crash_penalty": crash_penalty,
        "excessive_tilt": excessive_tilt,
        "control_saturation": control_saturation,
    }
    subtotal = sum(components.values())

    # --- anti-hacking (ref :209-224): variance penalty over last 10 totals,
    # near-universal diversity bonus.
    window = cfg.variance_window
    n = jnp.minimum(reward_window_len, window).astype(f32)
    have_full = reward_window_len > window  # ref: len(history) > 10
    mean = jnp.sum(reward_window, axis=-1) / jnp.maximum(n, 1.0)
    var = jnp.sum(
        jnp.where(
            jnp.arange(window) < reward_window_len[..., None],
            (reward_window - mean[..., None]) ** 2,
            0.0,
        ),
        axis=-1,
    ) / jnp.maximum(n, 1.0)
    variance_penalty = jnp.where(
        have_full & (var > 10000.0), -cfg.gradient_penalty * var, 0.0
    )
    spread = jnp.max(reward_window, axis=-1) - jnp.min(reward_window, axis=-1)
    diversity = jnp.where(
        (reward_window_len >= 2) & (spread > 1e-6), cfg.diversity_bonus, 0.0
    )
    anti_hack = variance_penalty + diversity
    components["anti_hacking"] = anti_hack

    total = jnp.clip(subtotal + anti_hack, cfg.clip_min, cfg.clip_max)

    # roll the window (shift left, append newest)
    new_window = jnp.concatenate(
        [reward_window[..., 1:], total[..., None]], axis=-1
    )
    new_len = jnp.minimum(reward_window_len + 1, jnp.int32(2**30))
    return total, new_window, new_len, components
