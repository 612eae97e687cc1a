"""Domain-randomization sampling — one PRNG draw per env per reset.

The reference *specs* randomization (config/config.yaml:340-349, legacy
``RocketTVCEnv(domain_randomization=True)`` with ``.current_mass``) but the
enhanced env never implements it (SURVEY §2.1). Here it is implemented per
spec: each vmapped env carries its own ``DomainParams`` draw, resampled at
every reset from its own key — no host sync, no Python RNG.

Hot-path note (round 3): under branchless autoreset this sampler runs EVERY
env step for EVERY env, so the PRNG op count dominates its cost. All uniform
variates come from ONE ``jax.random.uniform`` call and all normal variates
from ONE ``jax.random.normal`` call (two threefry invocations total, vs ~10
for field-by-field draws — measured ~15% of headline env throughput); the
static config gates then select nominal values arithmetically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tvc_ai_tpu.env.types import DomainParams, RandomizationConfig
from tvc_ai_tpu.physics.types import RocketParams

# slots of the fused uniform draw u ~ U[-1, 1]^7
_U_MASS, _U_CG_X, _U_CG_Y, _U_CG_Z, _U_MIX, _U_NOISE, _U_PROG = range(7)
# slots of the fused normal draw n ~ N(0,1)^3
_N_THRUST, _N_WIND_X, _N_WIND_Y = range(3)


def feasible_draw_mask(
    mass: jnp.ndarray,
    thrust_scale: jnp.ndarray,
    cg_offset: jnp.ndarray,
    rocket: RocketParams,
    tilt_limit: jnp.ndarray,
) -> jnp.ndarray:
    """True where the strict success window is physically attainable.

    The three controller-independent infeasible classes, measured by the
    per-draw CEM oracle (RESULTS.md r4 suite-ceiling section; same labels
    as scripts/suite_feasibility.py::_report):

    - climb-away: fixed thrust exceeds weight (thrust > m·g_eff) — no
      throttle exists, the vehicle cannot stay under the success window's
      altitude bound;
    - friction-pinned: stiction exceeds max lateral thrust
      (μ·(m·g_eff − T) > T·sin(max_gimbal)) — the base cannot slide and
      thrust applies AT the contact, so zero torque authority about it;
    - equilibrium tilt: the contact-balance equilibrium
      tan θ* = 2·T·d/(m·g_eff) lies beyond the success tilt limit at the
      draw's lateral cg offset d.

    g_eff honors the double-gravity parity quirk (physics/types.py).
    """
    g_eff = rocket.gravity * (2.0 if rocket.double_gravity else 1.0)
    thrust = thrust_scale * rocket.thrust
    weight = mass * g_eff
    climb = thrust > weight
    pinned = rocket.contact_friction * (weight - thrust) > thrust * jnp.sin(
        rocket.max_gimbal
    )
    cg_mag = jnp.sqrt(jnp.sum(cg_offset[..., :2] ** 2, axis=-1))
    tilted = jnp.arctan2(2.0 * thrust * cg_mag, weight) > tilt_limit
    return ~(climb | (~climb & pinned) | tilted)


def sample_domain_params(
    key: jnp.ndarray, rocket: RocketParams, cfg: RandomizationConfig
) -> DomainParams:
    """Draw per-episode physical parameters.

    mass: uniform ±mass_variation (fraction of nominal);
    thrust: normal σ=thrust_variation (clipped to ±2σ, always positive);
    cg offset: uniform ball ≤ cg_offset_max in xy and half that in z;
    wind: normal σ=wind_max/2 clipped to ±wind_max per horizontal axis;
    sensor noise σ fixed from config (or σ ~ U[0, max] per episode).
    """
    needs_uniform = (
        cfg.enabled or cfg.sensor_noise_uniform or cfg.progress_rate_randomized
    )
    if not needs_uniform:
        noise_std = (
            jnp.asarray(cfg.sensor_noise_std, jnp.float32)
            if cfg.sensor_noise_enabled
            else jnp.float32(0.0)
        )
        return DomainParams.nominal(rocket).replace(sensor_noise_std=noise_std)

    ku, kn = jax.random.split(key)
    u = jax.random.uniform(ku, (7,), minval=-1.0, maxval=1.0)

    noise_std = (
        jnp.asarray(cfg.sensor_noise_std, jnp.float32)
        if cfg.sensor_noise_enabled
        else jnp.float32(0.0)
    )
    if cfg.sensor_noise_enabled and cfg.sensor_noise_uniform:
        # per-episode noise level: σ ~ U[0, sensor_noise_std]
        noise_std = noise_std * (u[_U_NOISE] * 0.5 + 0.5)
    if cfg.progress_rate_randomized:
        progress_rate = cfg.progress_rate_min + (u[_U_PROG] * 0.5 + 0.5) * (
            cfg.progress_rate_max - cfg.progress_rate_min
        )
    else:
        progress_rate = jnp.float32(1.0)

    if not cfg.enabled:
        return DomainParams.nominal(rocket).replace(
            sensor_noise_std=noise_std,
            progress_rate=progress_rate.astype(jnp.float32),
        )

    if cfg.feasible_only:
        # K candidate draws of the physical axes from fresh subkeys (the
        # dither slots above keep the single-draw stream); first feasible
        # candidate wins, nominal plant if none is (always feasible)
        k = cfg.feasible_tries
        ku2, kn2 = jax.random.split(kn)
        uk = jax.random.uniform(ku2, (k, 4), minval=-1.0, maxval=1.0)
        nk = jax.random.normal(kn2, (k, 3))
        mass_k = rocket.mass * (1.0 + uk[:, 0] * cfg.mass_variation)
        thrust_k = 1.0 + jnp.clip(
            nk[:, _N_THRUST] * cfg.thrust_variation,
            -2.0 * cfg.thrust_variation,
            2.0 * cfg.thrust_variation,
        )
        cg_k = uk[:, 1:4] * cfg.cg_offset_max * jnp.array([1.0, 1.0, 0.5])
        ok = feasible_draw_mask(
            mass_k, thrust_k, cg_k, rocket, cfg.feasible_tilt_limit
        )
        i = jnp.argmax(ok)  # first True (argmax returns the first max)
        any_ok = ok.any()
        mass = jnp.where(any_ok, mass_k[i], rocket.mass)
        thrust_scale = jnp.where(any_ok, thrust_k[i], 1.0)
        cg_offset = jnp.where(any_ok, cg_k[i], 0.0)
        wind_src = nk[i, _N_WIND_X:]
    else:
        n = jax.random.normal(kn, (3,))
        mass = rocket.mass * (1.0 + u[_U_MASS] * cfg.mass_variation)
        thrust_scale = 1.0 + jnp.clip(
            n[_N_THRUST] * cfg.thrust_variation,
            -2.0 * cfg.thrust_variation,
            2.0 * cfg.thrust_variation,
        )
        cg_offset = (
            u[_U_CG_X : _U_CG_Z + 1]
            * cfg.cg_offset_max
            * jnp.array([1.0, 1.0, 0.5])
        )
        wind_src = n[_N_WIND_X:]
    wind_xy = jnp.clip(
        wind_src * (cfg.wind_max * 0.5), -cfg.wind_max, cfg.wind_max
    )
    wind = jnp.concatenate([wind_xy, jnp.zeros(1)])
    if cfg.dr_mixture_enabled:
        # easy/hard mixture gate on the hard physical axes (see
        # RandomizationConfig.dr_prob); dither axes (noise level, progress
        # slope, initial state) stay active either way
        hard = (u[_U_MIX] * 0.5 + 0.5) < cfg.dr_prob
        mass = jnp.where(hard, mass, rocket.mass)
        thrust_scale = jnp.where(hard, thrust_scale, 1.0)
        cg_offset = jnp.where(hard, cg_offset, 0.0)
        wind = jnp.where(hard, wind, 0.0)
    return DomainParams(
        mass=mass.astype(jnp.float32),
        thrust_scale=thrust_scale.astype(jnp.float32),
        cg_offset=cg_offset.astype(jnp.float32),
        wind=wind.astype(jnp.float32),
        sensor_noise_std=noise_std.astype(jnp.float32),
        progress_rate=progress_rate.astype(jnp.float32),
    )
