"""Bridge: typed config tree → runtime pytrees (EnvParams / agent configs)."""

from __future__ import annotations

import math

import jax.numpy as jnp

from tvc_ai_tpu.agents.sac import SACConfig
from tvc_ai_tpu.config.schema import CurriculumStage, FrameworkConfig
from tvc_ai_tpu.env.types import (
    EnvParams,
    RandomizationConfig,
    RewardConfig,
    SuccessConfig,
    TerminationConfig,
)
from tvc_ai_tpu.physics.types import RocketParams
from tvc_ai_tpu.training.loop import TrainLoopConfig


def build_env_params(
    cfg: FrameworkConfig, stage: CurriculumStage | None = None
) -> EnvParams:
    """EnvParams from config; a curriculum stage overlays its conditions
    (wind/mass-variation/initial-tilt/sensor-noise/gimbal-limit — the overlay
    the reference spec'd but never applied, SURVEY §2.5)."""
    e = cfg.env
    dr = e.domain_randomization
    gimbal_scale = stage.gimbal_limit_scale if stage else 1.0
    rocket = RocketParams(
        mass=jnp.float32(e.mass),
        length=jnp.float32(e.length),
        radius=jnp.float32(e.radius),
        thrust=jnp.float32(e.thrust),
        max_gimbal=jnp.float32(math.radians(e.max_gimbal_deg) * gimbal_scale),
        fuel_burn_rate=jnp.float32(e.fuel_burn_rate),
        double_gravity=e.double_gravity,
        gyroscopic=e.gyroscopic,
        magnus_effect=e.magnus_effect,
        ground_effect=e.ground_effect,
        dt=e.physics_timestep,
        substeps=e.substeps,
    )
    rnd = RandomizationConfig(
        enabled=dr.enabled,
        sensor_noise_enabled=dr.sensor_noise_enabled,
        sensor_noise_uniform=dr.sensor_noise_uniform,
        mass_variation=jnp.float32(
            stage.mass_variation if stage else dr.mass_variation
        ),
        thrust_variation=jnp.float32(
            stage.thrust_variation
            if stage and stage.thrust_variation is not None
            else dr.thrust_variation
        ),
        cg_offset_max=jnp.float32(
            stage.cg_offset_max
            if stage and stage.cg_offset_max is not None
            else dr.cg_offset_max
        ),
        wind_max=jnp.float32(stage.wind_force if stage else dr.wind_max),
        sensor_noise_std=jnp.float32(
            stage.sensor_noise if stage else dr.sensor_noise_std
        ),
        init_tilt_max=jnp.float32(
            stage.initial_tilt_max if stage else dr.init_tilt_max
        ),
        init_omega_max=jnp.float32(
            stage.initial_omega_max
            if stage and stage.initial_omega_max is not None
            else dr.init_omega_max
        ),
        init_pos_jitter=jnp.float32(dr.init_pos_jitter),
        dr_prob=jnp.float32(
            stage.dr_prob
            if stage and stage.dr_prob is not None
            else dr.dr_prob
        ),
        dr_mixture_enabled=(
            stage.dr_prob if stage and stage.dr_prob is not None else dr.dr_prob
        )
        < 1.0,
        progress_rate_randomized=dr.progress_rate_min != dr.progress_rate_max,
        progress_rate_min=jnp.float32(dr.progress_rate_min),
        progress_rate_max=jnp.float32(dr.progress_rate_max),
        actuator_delay=dr.actuator_delay,
        sensor_dropout_enabled=dr.sensor_dropout_prob > 0.0,
        sensor_dropout_prob=jnp.float32(dr.sensor_dropout_prob),
        feasible_only=dr.feasible_only,
        feasible_tries=dr.feasible_tries,
        # the filter tests against the run's own success tilt limit
        feasible_tilt_limit=jnp.float32(cfg.mission_success.max_tilt_angle),
    )
    ms = cfg.mission_success
    success = SuccessConfig(
        max_tilt_angle=jnp.float32(ms.max_tilt_angle),
        max_angular_velocity=jnp.float32(ms.max_angular_velocity),
        max_horizontal_velocity=jnp.float32(ms.max_horizontal_velocity),
        max_vertical_velocity=jnp.float32(ms.max_vertical_velocity),
        min_altitude=jnp.float32(ms.min_altitude),
        max_altitude=jnp.float32(ms.max_altitude),
        success_duration=ms.success_duration,
    )
    r = cfg.reward_function
    reward = RewardConfig(
        mission_completion_weight=jnp.float32(r.mission_completion_weight),
        safety_compliance_weight=jnp.float32(r.safety_compliance_weight),
        fuel_efficiency_weight=jnp.float32(r.fuel_efficiency_weight),
        stability_bonus_weight=jnp.float32(r.stability_bonus_weight),
        control_smoothness_weight=jnp.float32(r.control_smoothness_weight),
        altitude_maintenance_weight=jnp.float32(r.altitude_maintenance_weight),
        crash_penalty=jnp.float32(r.crash_penalty),
        gradient_penalty=jnp.float32(r.gradient_penalty),
        diversity_bonus=jnp.float32(r.diversity_bonus),
        clip_min=jnp.float32(r.clip_min),
        clip_max=jnp.float32(r.clip_max),
        target_altitude=jnp.float32(r.target_altitude),
        survival_normalized_success=r.survival_normalized_success,
        survival_success_scale=jnp.float32(r.survival_success_scale),
        equilibrium_relative_shaping=r.equilibrium_relative_shaping,
    )
    sc = cfg.safety.constraints
    termination = TerminationConfig(
        terminate_on_success=cfg.mission_success.terminate_on_success,
        crash_altitude=jnp.float32(sc.min_altitude),
        max_tilt=jnp.float32(sc.max_tilt),
        max_altitude=jnp.float32(sc.max_altitude),
    )
    trim = e.trim_observation
    if trim.mode not in ("ema", "integral"):
        raise ValueError(
            f"env.trim_observation.mode={trim.mode!r} (want 'ema'|'integral')"
        )
    drift = e.drift_observation
    return EnvParams(
        rocket=rocket,
        randomization=rnd,
        success=success,
        reward=reward,
        termination=termination,
        max_episode_steps=e.max_episode_steps,
        trim_obs_enabled=trim.enabled,
        trim_obs_decay=jnp.float32(trim.decay),
        trim_obs_tilt_scale=jnp.float32(trim.tilt_scale),
        trim_obs_integral=trim.mode == "integral",
        trim_obs_clip=jnp.float32(trim.integral_clip),
        drift_obs_enabled=drift.enabled,
        drift_obs_vel_scale=jnp.float32(drift.vel_scale),
        drift_obs_pos_scale=jnp.float32(drift.pos_scale),
        action_obs_enabled=e.action_observation.enabled,
    )


def build_sac_config(cfg: FrameworkConfig) -> SACConfig:
    s = cfg.algorithms.sac
    st = cfg.stability
    auto_ent = isinstance(s.ent_coef, str) and s.ent_coef == "auto"
    return SACConfig(
        hidden_dims=tuple(s.hidden_dims),
        lr_actor=s.lr_actor,
        lr_critic=s.lr_critic,
        lr_alpha=s.lr_alpha,
        ema_decay=s.ema_decay,
        compute_dtype=s.compute_dtype,
        gamma=s.gamma,
        tau=s.tau,
        alpha=0.2 if auto_ent else float(s.ent_coef),
        automatic_entropy_tuning=auto_ent,
        batch_size=s.batch_size,
        buffer_size=s.buffer_size,
        learning_starts=s.learning_starts,
        gradient_clip_norm=s.grad_clip_norm,
        reward_scale=s.reward_scale,
        # Q-filtered BC toward demo actions; only meaningful when the loop
        # mixes demo batches (training.demo_seeding.fraction > 0)
        bc_weight=(
            cfg.training.demo_seeding.bc_weight
            if cfg.training.demo_seeding.enabled
            else 0.0
        ),
        architecture=cfg.network.architecture_type,
        transformer_d_model=cfg.network.transformer.d_model,
        transformer_layers=cfg.network.transformer.num_layers,
        transformer_heads=cfg.network.transformer.num_heads,
        # training-stability wiring: the YAML toggles reach the compiled
        # update (the reference initialized its scheduler machinery and never
        # called it — SURVEY §2.5; utils/training_stability.py:75-150)
        lr_schedule=(
            st.scheduler_type if st.enable_lr_scheduling else "constant"
        ),
        # decay horizon in GRADIENT UPDATES, aligned to the configured run:
        # (env steps / envs) × updates_per_step. Left at the dataclass
        # default, a 250M-step campaign would hit LR 0 a quarter of the way
        # in (the schedule counts optimizer steps, not env steps).
        schedule_total_steps=max(
            int(
                cfg.training.total_timesteps
                / max(cfg.training.num_envs, 1)
                * cfg.training.updates_per_step
                / max(cfg.training.update_interval, 1)
            ),
            1,
        ),
        adaptive_tau=st.adaptive_tau,
    )


def build_loop_config(cfg: FrameworkConfig) -> TrainLoopConfig:
    """Fused-loop config INCLUDING the extension stack.

    The reference's live path runs the SafetyLayer on every action
    (agent/multi_algorithm_agent.py:784-786) and adds ICM intrinsic reward
    every env step (env/enhanced_rocket_tvc_env.py:496-502); RND is spec'd at
    config/config.yaml ``random_network_distillation`` but unimplemented
    there. All three are config-reachable here.
    """
    from tvc_ai_tpu.agents.physics_informed import PhysicsInformedConfig
    from tvc_ai_tpu.models.curiosity import CuriosityConfig as ICMConfig
    from tvc_ai_tpu.models.hierarchical import (
        HierarchicalConfig as HierConfig,
    )
    from tvc_ai_tpu.models.rnd import RNDConfig
    from tvc_ai_tpu.models.safety import SafetyConstraints

    t = cfg.training
    h = cfg.hierarchical_rl
    icm = cfg.exploration.curiosity
    rnd = cfg.exploration.random_network_distillation
    sc = cfg.safety.constraints
    pi = cfg.physics_informed
    from tvc_ai_tpu.env.types import (
        ACTION_OBS_DIM,
        DRIFT_OBS_DIM,
        OBS_DIM,
        TRIM_OBS_DIM,
    )

    return TrainLoopConfig(
        num_envs=t.num_envs,
        rollout_steps=t.rollout_steps,
        updates_per_step=t.updates_per_step,
        update_interval=t.update_interval,
        obs_dim=OBS_DIM
        + (TRIM_OBS_DIM if cfg.env.trim_observation.enabled else 0)
        + (DRIFT_OBS_DIM if cfg.env.drift_observation.enabled else 0)
        + (ACTION_OBS_DIM if cfg.env.action_observation.enabled else 0),
        demo_fraction=(
            t.demo_seeding.fraction if t.demo_seeding.enabled else 0.0
        ),
        history_len=cfg.network.history_len,
        use_pallas_physics=t.use_pallas_physics,
        use_safety_layer=cfg.safety.enabled,
        safety=SafetyConstraints(
            max_tilt=sc.max_tilt,
            max_angular_velocity=sc.max_angular_velocity,
            min_altitude=sc.min_altitude,
            max_altitude=sc.max_altitude,
            max_control_effort=sc.max_control_effort,
            fuel_reserve=sc.fuel_reserve,
        ),
        use_curiosity=icm.enabled,
        curiosity=ICMConfig(
            hidden_dim=icm.hidden_dim,
            lr=icm.lr,
            reward_scale=icm.reward_scale,
        ),
        use_rnd=rnd.enabled,
        rnd=RNDConfig(
            hidden_dims=tuple(rnd.network_size),
            lr=rnd.lr,
            reward_scale=rnd.reward_scale,
            update_frequency=rnd.update_frequency,
        ),
        use_physics_informed=pi.enabled,
        physics_informed=PhysicsInformedConfig(
            physics_weight=pi.physics_loss_weight,
        ),
        use_hierarchical=h.enabled,
        hierarchical=HierConfig(
            num_goals=h.num_goals,
            high_level_lr=h.high_level_lr,
            low_level_lr=h.low_level_lr,
        ),
    )
