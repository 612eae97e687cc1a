"""Mission-phase FSM and success-window detection — branch-free.

Reimplements the reference's phase transitions
(env/enhanced_rocket_tvc_env.py:635-657) and the 100-step rolling
all-criteria success window (:659-695) with ``jnp.where`` selects and a
consecutive-step counter (equivalent to the reference's deque check: "all of
the last `success_duration` entries met" ⟺ consecutive-met count ≥ duration).
"""

from __future__ import annotations

import jax.numpy as jnp

from tvc_ai_tpu.env.types import (
    PHASE_BOOST,
    PHASE_COAST,
    PHASE_COMPLETE,
    PHASE_LANDING,
    PHASE_TOUCHDOWN,
    SuccessConfig,
)


def update_phase(
    phase: jnp.ndarray,
    altitude: jnp.ndarray,
    tilt: jnp.ndarray,
    fuel: jnp.ndarray,
    angular_velocity_mag: jnp.ndarray,
    success: SuccessConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One FSM tick. Returns (new_phase, completed_this_step).

    Transitions (ref :642-657): BOOST→COAST on fuel<0.8; COAST→LANDING on
    alt<5; LANDING→TOUCHDOWN on alt<1; TOUCHDOWN→COMPLETE on alt<0.5 with
    tilt<max_tilt_angle and ‖ω‖<max_angular_velocity (sets mission success).
    Only one transition fires per step, like the reference's elif chain.
    """
    to_coast = (phase == PHASE_BOOST) & (fuel < 0.8)
    to_landing = (phase == PHASE_COAST) & (altitude < 5.0)
    to_touchdown = (phase == PHASE_LANDING) & (altitude < 1.0)
    to_complete = (
        (phase == PHASE_TOUCHDOWN)
        & (altitude < 0.5)
        & (tilt < success.max_tilt_angle)
        & (angular_velocity_mag < success.max_angular_velocity)
    )
    new_phase = jnp.where(to_coast, PHASE_COAST, phase)
    new_phase = jnp.where(to_landing, PHASE_LANDING, new_phase)
    new_phase = jnp.where(to_touchdown, PHASE_TOUCHDOWN, new_phase)
    new_phase = jnp.where(to_complete, PHASE_COMPLETE, new_phase)
    return new_phase, to_complete


def update_success_window(
    success_count: jnp.ndarray,
    altitude: jnp.ndarray,
    tilt: jnp.ndarray,
    angular_velocity_mag: jnp.ndarray,
    horizontal_velocity: jnp.ndarray,
    vertical_velocity: jnp.ndarray,
    success: SuccessConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rolling success detection. Returns (new_count, window_success).

    All four criteria (attitude / velocity / position-band / stability,
    ref :665-675) must hold for ``success_duration`` consecutive steps.
    """
    criteria_met = (
        (tilt < success.max_tilt_angle)
        & (vertical_velocity < success.max_vertical_velocity)
        & (horizontal_velocity < success.max_horizontal_velocity)
        & (altitude >= success.min_altitude)
        & (altitude <= success.max_altitude)
        & (angular_velocity_mag < success.max_angular_velocity)
    )
    new_count = jnp.where(criteria_met, success_count + 1, 0)
    return new_count, new_count >= success.success_duration
