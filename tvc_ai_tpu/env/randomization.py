"""Domain-randomization sampling — one PRNG draw per env per reset.

The reference *specs* randomization (config/config.yaml:340-349, legacy
``RocketTVCEnv(domain_randomization=True)`` with ``.current_mass``) but the
enhanced env never implements it (SURVEY §2.1). Here it is implemented per
spec: each vmapped env carries its own ``DomainParams`` draw, resampled at
every reset from its own key — no host sync, no Python RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tvc_ai_tpu.env.types import DomainParams, RandomizationConfig
from tvc_ai_tpu.physics.types import RocketParams


def sample_domain_params(
    key: jnp.ndarray, rocket: RocketParams, cfg: RandomizationConfig
) -> DomainParams:
    """Draw per-episode physical parameters.

    mass: uniform ±mass_variation (fraction of nominal);
    thrust: normal σ=thrust_variation (clipped to ±2σ, always positive);
    cg offset: uniform ball ≤ cg_offset_max in xy and half that in z;
    wind: normal σ=wind_max/2 clipped to ±wind_max per horizontal axis;
    sensor noise σ fixed from config.
    """
    if cfg.progress_rate_randomized:
        k_noise, k_prog, key = jax.random.split(key, 3)
        progress_rate = jax.random.uniform(
            k_prog, (),
            minval=cfg.progress_rate_min, maxval=cfg.progress_rate_max,
        )
    else:
        k_noise, key = jax.random.split(key)
        progress_rate = jnp.float32(1.0)
    noise_std = (
        jnp.asarray(cfg.sensor_noise_std, jnp.float32)
        if cfg.sensor_noise_enabled
        else jnp.float32(0.0)
    )
    if cfg.sensor_noise_enabled and cfg.sensor_noise_uniform:
        # per-episode noise level: σ ~ U[0, sensor_noise_std]
        noise_std = noise_std * jax.random.uniform(k_noise, ())
    if not cfg.enabled:
        return DomainParams.nominal(rocket).replace(
            sensor_noise_std=noise_std, progress_rate=progress_rate
        )

    k_mass, k_thrust, k_cg, k_wind, k_mix = jax.random.split(key, 5)
    mass = rocket.mass * (
        1.0
        + jax.random.uniform(
            k_mass, (), minval=-cfg.mass_variation, maxval=cfg.mass_variation
        )
    )
    thrust_scale = 1.0 + jnp.clip(
        jax.random.normal(k_thrust, ()) * cfg.thrust_variation,
        -2.0 * cfg.thrust_variation,
        2.0 * cfg.thrust_variation,
    )
    cg_dir = jax.random.uniform(k_cg, (3,), minval=-1.0, maxval=1.0)
    cg_offset = cg_dir * cfg.cg_offset_max * jnp.array([1.0, 1.0, 0.5])
    wind_xy = jnp.clip(
        jax.random.normal(k_wind, (2,)) * (cfg.wind_max * 0.5),
        -cfg.wind_max,
        cfg.wind_max,
    )
    wind = jnp.concatenate([wind_xy, jnp.zeros(1)])
    if cfg.dr_mixture_enabled:
        # easy/hard mixture gate on the hard physical axes (see
        # RandomizationConfig.dr_prob); dither axes (noise level, progress
        # slope, initial state) stay active either way
        hard = jax.random.uniform(k_mix, ()) < cfg.dr_prob
        mass = jnp.where(hard, mass, rocket.mass)
        thrust_scale = jnp.where(hard, thrust_scale, 1.0)
        cg_offset = jnp.where(hard, cg_offset, 0.0)
        wind = jnp.where(hard, wind, 0.0)
    return DomainParams(
        mass=mass.astype(jnp.float32),
        thrust_scale=thrust_scale.astype(jnp.float32),
        cg_offset=cg_offset.astype(jnp.float32),
        wind=wind.astype(jnp.float32),
        sensor_noise_std=noise_std,
        progress_rate=progress_rate.astype(jnp.float32),
    )
