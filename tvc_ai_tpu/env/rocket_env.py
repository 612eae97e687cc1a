"""The core functional rocket-TVC environment.

Pure, vmappable reimplementation of the reference's
``EnhancedRocketTVCEnv.step`` (env/enhanced_rocket_tvc_env.py:466-518),
preserving its exact per-step ordering — including two subtle behaviors a
naive rewrite would "fix":

1. The observation's phase slot holds the *pre-update* phase (the reference
   builds obs at :482 before ``_update_mission_phase`` at :485).
2. The reward sees the *pre-update* phase and success flag (the reference
   builds ``state_dict`` at :481 and never rebuilds it after the FSM tick),
   while termination sees the *post-update* success flag (:703 reads the
   attribute).

API:
    reset(key, params)            -> (EnvState, obs)
    step(state, action, params)   -> (EnvState, StepOutput)      # no autoreset
    step_autoreset(...)           -> (EnvState, StepOutput)      # for vmapped rollouts

Batch by ``jax.vmap(reset)`` / ``jax.vmap(step, in_axes=(0, 0, None))``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tvc_ai_tpu.env import mission as mission_mod
from tvc_ai_tpu.env import reward as reward_mod
from tvc_ai_tpu.env.randomization import sample_domain_params
from tvc_ai_tpu.env.types import (
    ACTION_DIM,
    NUM_PHASES,
    OBS_DIM,
    PHASE_BOOST,
    TRIM_OBS_DIM,
    EnvParams,
    EnvState,
    StepOutput,
)
from tvc_ai_tpu.physics import quaternion as quat
from tvc_ai_tpu.physics.integrator import ThrustControl
from tvc_ai_tpu.physics.integrator import step as physics_step
from tvc_ai_tpu.physics.types import RigidBodyState


def _observe(
    state_body: RigidBodyState,
    fuel: jnp.ndarray,
    phase: jnp.ndarray,
    step_count: jnp.ndarray,
    params: EnvParams,
    noise_key: jnp.ndarray,
    noise_std: jnp.ndarray,
    progress_rate: jnp.ndarray,
    prev_imu: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """10-D observation [quat, ω, fuel, phase/7, progress] (ref :587-606).

    IMU noise (domain-randomization spec, config.yaml:347-349) perturbs the
    quaternion (renormalized) and angular-velocity channels; the draw is
    static-gated on ``sensor_noise_enabled`` and fused into ONE normal(7)
    call (hot-path: this runs per env step). ``progress_rate`` (nominal 1.0)
    scales the progress slope per episode — see DomainParams.progress_rate.
    With ``sensor_dropout_prob`` > 0 and a ``prev_imu`` available, the IMU
    channels go stale (hold-last) on dropout steps. Returns ``(obs, imu)``
    where ``imu`` is the presented 7-channel [quat, ω] reading to carry as
    the next ``prev_imu`` — ``None`` unless sensor dropout is enabled (the
    only consumer of the carry).
    """
    use_dropout = (
        params.randomization.sensor_dropout_enabled and prev_imu is not None
    )
    if params.randomization.sensor_noise_enabled:
        if use_dropout:
            kn, kd = jax.random.split(noise_key)
        else:
            kn = noise_key
        noise = jax.random.normal(kn, (7,)) * noise_std
        q = quat.normalize(state_body.quat + noise[:4])
        w = state_body.omega + noise[4:]
    else:
        kd = noise_key
        q = state_body.quat
        w = state_body.omega
    phase_value = phase.astype(jnp.float32) / NUM_PHASES
    progress = jnp.minimum(
        1.0,
        step_count.astype(jnp.float32) * progress_rate / params.max_episode_steps,
    )
    if use_dropout:
        imu = jnp.concatenate([q, w]).astype(jnp.float32)
        drop = jax.random.bernoulli(
            kd, params.randomization.sensor_dropout_prob
        )
        imu = jnp.where(drop, prev_imu, imu)
        obs = jnp.concatenate(
            [imu, fuel[None], phase_value[None], progress[None]]
        ).astype(jnp.float32)
        return obs, imu
    obs = jnp.concatenate(
        [q, w, fuel[None], phase_value[None], progress[None]]
    ).astype(jnp.float32)
    # no dropout → nothing consumes a carried IMU reading; None keeps the
    # (7,) slice + its autoreset select + checkpoint traffic out of the
    # hot path entirely (the round-2 always-materialized carry cost ~6%)
    return obs, None


def _append_trim(
    obs: jnp.ndarray, trim: jnp.ndarray, params: EnvParams
) -> jnp.ndarray:
    """Append the scaled trim channels when the static gate is on (obs
    10 → 14); compiled away entirely when off."""
    if not params.trim_obs_enabled:
        return obs
    scale = jnp.concatenate(
        [
            jnp.broadcast_to(params.trim_obs_tilt_scale, (2,)),
            jnp.ones(2, jnp.float32),
        ]
    )
    return jnp.concatenate([obs, trim * scale]).astype(jnp.float32)


def _append_drift(
    obs: jnp.ndarray, body: RigidBodyState, params: EnvParams
) -> jnp.ndarray:
    """Append the scaled drift channels [vx, vy, x, y] when the static gate
    is on (obs += 4); compiled away entirely when off. See
    EnvParams.drift_obs_enabled for the rationale (r4 LQR forensics: the
    ground-balance controller needs velocity + its integral)."""
    if not params.drift_obs_enabled:
        return obs
    drift = jnp.concatenate(
        [
            body.vel[:2] * params.drift_obs_vel_scale,
            body.pos[:2] * params.drift_obs_pos_scale,
        ]
    )
    return jnp.concatenate([obs, drift]).astype(jnp.float32)


def _append_action(
    obs: jnp.ndarray, action: jnp.ndarray, params: EnvParams
) -> jnp.ndarray:
    """Append the commanded action (already [-1, 1]) when the static gate is
    on (obs += 2); compiled away entirely when off. With history stacking
    the policy input becomes (obs, action) pairs — the system-ID window a
    blind student needs to infer the episode's mass/thrust draw (see
    ACTION_OBS_DIM in env/types.py)."""
    if not params.action_obs_enabled:
        return obs
    return jnp.concatenate([obs, action]).astype(jnp.float32)


def reset(key: jnp.ndarray, params: EnvParams) -> tuple[EnvState, jnp.ndarray]:
    """Reset one env: nominal pose [0,0,1]/identity (ref :434-441) plus any
    configured initial-condition randomization (curriculum/legacy spec).

    Hot-path note: under branchless autoreset this runs per env step, so all
    initial-condition variates come from ONE fused uniform(7) draw (tilt
    angle/azimuth, ω, position jitter) — see env/randomization.py for the
    same treatment of the domain draw.
    """
    rnd = params.randomization
    if rnd.sensor_noise_enabled:
        k_dr, k_init, k_noise, k_next = jax.random.split(key, 4)
    else:
        k_dr, k_init, k_next = jax.random.split(key, 3)
        k_noise = k_next  # unused by _observe when noise is off
    dr = sample_domain_params(k_dr, params.rocket, rnd)

    u = jax.random.uniform(k_init, (7,), minval=-1.0, maxval=1.0)
    # tilt: angle ~ U[0, max], azimuth ~ U[-π, π] (same law as
    # quaternion.random_tilt_quaternion, drawn from the fused vector)
    angle = (u[0] * 0.5 + 0.5) * rnd.init_tilt_max
    azimuth = u[1] * jnp.pi
    axis = jnp.array([1.0, 0.0, 0.0]) * jnp.cos(azimuth) + jnp.array(
        [0.0, 1.0, 0.0]
    ) * jnp.sin(azimuth)
    q0 = quat.from_axis_angle(axis, angle)
    omega0 = u[2:5] * rnd.init_omega_max
    pos0 = params.init_pos + jnp.concatenate(
        [u[5:7] * rnd.init_pos_jitter, jnp.zeros(1)]
    )
    body = RigidBodyState(
        pos=pos0.astype(jnp.float32),
        quat=q0.astype(jnp.float32),
        vel=jnp.zeros(3, jnp.float32),
        omega=omega0.astype(jnp.float32),
    )
    obs, imu = _observe(
        body, jnp.float32(1.0), jnp.int32(PHASE_BOOST), jnp.int32(0), params,
        k_noise, dr.sensor_noise_std, dr.progress_rate,
    )
    if params.randomization.sensor_dropout_enabled:
        # seed the hold-last carry with the first presented reading (the
        # reset-time _observe has no previous reading to drop to)
        imu = obs[:7]
    trim = jnp.zeros(TRIM_OBS_DIM, jnp.float32)
    obs = _append_trim(obs, trim, params)
    obs = _append_drift(obs, body, params)
    obs = _append_action(obs, jnp.zeros(ACTION_DIM, jnp.float32), params)
    state = EnvState(
        body=body,
        fuel=jnp.float32(1.0),
        step_count=jnp.int32(0),
        phase=jnp.int32(PHASE_BOOST),
        mission_success=jnp.bool_(False),
        success_count=jnp.int32(0),
        prev_action=jnp.zeros(ACTION_DIM, jnp.float32),
        has_prev_action=jnp.bool_(False),
        reward_window=jnp.zeros(params.reward.variance_window, jnp.float32),
        reward_window_len=jnp.int32(0),
        prev_imu=imu,
        trim=trim,
        dr=dr,
        key=k_next,
    )
    return state, obs


def _pre_physics(
    state: EnvState, action: jnp.ndarray, params: EnvParams
):
    """Steps 1 of ``step``: action conditioning + fuel gate + PRNG split.

    Split out so the batched Pallas physics path (``batched_step_autoreset``)
    can vmap it around the whole-batch kernel call."""
    # the per-step key is consumed only by sensor noise/dropout; skip the
    # split when neither is enabled (hot path: one threefry per env step).
    # The key chain still advances at episode boundaries (autoreset splits
    # the carried key), so resets stay decorrelated.
    rnd = params.randomization
    if rnd.sensor_noise_enabled or rnd.sensor_dropout_enabled:
        key, k_noise = jax.random.split(state.key)
    else:
        key = k_noise = state.key

    # 1. action → gimbal (ref :470-471); fuel gate checked *before* burn (:530-533)
    action = jnp.clip(action, -1.0, 1.0)
    # optional one-step actuator delay (DR spec): physics consumes the
    # previously commanded action; reward/smoothness still see the command
    applied = (
        state.prev_action if params.randomization.actuator_delay else action
    )
    gimbal = applied * params.rocket.max_gimbal
    thrust_active = state.fuel > 0.0
    fuel = jnp.where(
        thrust_active,
        jnp.maximum(0.0, state.fuel - params.rocket.fuel_burn_rate),
        state.fuel,
    )
    return action, gimbal, thrust_active, fuel, key, k_noise


def step(
    state: EnvState, action: jnp.ndarray, params: EnvParams
) -> tuple[EnvState, StepOutput]:
    action, gimbal, thrust_active, fuel, key, k_noise = _pre_physics(
        state, action, params
    )

    # 2. physics (4 substeps @ 50 Hz, ref :339-345,:477)
    body = physics_step(
        state.body,
        ThrustControl(gimbal=gimbal, thrust_active=thrust_active),
        params.rocket,
        mass=state.dr.mass,
        thrust_scale=state.dr.thrust_scale,
        cg_offset=state.dr.cg_offset,
        wind=state.dr.wind,
    )
    return _post_physics(state, body, action, fuel, key, k_noise, params)


def _post_physics(
    state: EnvState,
    body: RigidBodyState,
    action: jnp.ndarray,
    fuel: jnp.ndarray,
    key: jnp.ndarray,
    k_noise: jnp.ndarray,
    params: EnvParams,
) -> tuple[EnvState, StepOutput]:
    """Steps 3-7 of ``step``: everything after the rigid-body integrate."""
    step_count = state.step_count + 1

    # 3. derived quantities (ref _get_state_dict :608-633)
    altitude = body.pos[2]
    tilt = quat.tilt_angle(body.quat)
    ang_mag = jnp.linalg.norm(body.omega)
    horiz_vel = jnp.linalg.norm(body.vel[:2])
    vert_vel = jnp.abs(body.vel[2])
    crashed = altitude < params.termination.crash_altitude

    # 4. observation with PRE-update phase (ref ordering :482 vs :485)
    obs, imu = _observe(body, fuel, state.phase, step_count, params, k_noise,
                        state.dr.sensor_noise_std, state.dr.progress_rate,
                        prev_imu=state.prev_imu)
    # 4b. trim channels: slow EMAs of the presented tilt reading and the
    # commanded action (static-gated; see EnvParams.trim_obs_enabled).
    # obs[:2] IS the presented qx, qy reading (post-noise/dropout).
    trim = state.trim
    if params.trim_obs_enabled:
        d = params.trim_obs_decay
        if params.trim_obs_integral:
            # clipped integrator on the tilt pair (holds the accumulated
            # error = the trim), EMA on the commanded-action pair
            tilt_i = jnp.clip(
                trim[:2] + (1.0 - d) * obs[:2],
                -params.trim_obs_clip,
                params.trim_obs_clip,
            )
            act_ema = d * trim[2:] + (1.0 - d) * action
            trim = jnp.concatenate([tilt_i, act_ema])
        else:
            trim = d * trim + (1.0 - d) * jnp.concatenate([obs[:2], action])
        obs = _append_trim(obs, trim, params)
    obs = _append_drift(obs, body, params)
    obs = _append_action(obs, action, params)

    # 5. mission FSM + success window (post-physics quantities)
    new_phase, completed = mission_mod.update_phase(
        state.phase, altitude, tilt, fuel, ang_mag, params.success
    )
    success_count, window_success = mission_mod.update_success_window(
        state.success_count, altitude, tilt, ang_mag, horiz_vel, vert_vel,
        params.success,
    )
    mission_success = state.mission_success | completed | window_success

    # 6. reward with PRE-update phase & success flag (ref stale state_dict)
    # Optional privileged shaping: measure the dense tilt terms against the
    # per-episode hover equilibrium (body axis s.t. the gimbal->CG line is
    # world-vertical) instead of upright — see RewardConfig.
    # equilibrium_relative_shaping. Success/termination keep the true tilt.
    reward_tilt = tilt
    if params.reward.equilibrium_relative_shaping:
        gimbal_to_cg = state.dr.cg_offset - params.rocket.thrust_offset
        bhat = gimbal_to_cg / jnp.linalg.norm(gimbal_to_cg)
        reward_tilt = jnp.arccos(
            jnp.clip(quat.rotate(body.quat, bhat)[..., 2], -1.0, 1.0)
        )
    total_reward, reward_window, reward_window_len, components = (
        reward_mod.compute_reward(
            params.reward,
            altitude=altitude,
            tilt=reward_tilt,
            angular_velocity_mag=ang_mag,
            fuel=fuel,
            crashed=crashed,
            mission_successful=state.mission_success,
            phase=state.phase,
            action=action,
            prev_action=state.prev_action,
            has_prev_action=state.has_prev_action,
            reward_window=state.reward_window,
            reward_window_len=state.reward_window_len,
        )
    )

    # 6b. survival-normalized success payout (opt-in incentive fix — see
    # RewardConfig.survival_normalized_success). Paid once, on the step that
    # first achieves mission success; NOT subject to the per-step clip (it
    # stands in for the clipped per-step rewards of the forgone steps).
    if params.reward.survival_normalized_success:
        first_success = (completed | window_success) & ~state.mission_success
        # reward_window_len counts total rewards seen (it can exceed the
        # fixed window size); the window itself holds at most variance_window
        window_fill = jnp.clip(
            reward_window_len.astype(jnp.float32),
            1.0,
            float(params.reward.variance_window),
        )
        window_mean = jnp.sum(reward_window) / window_fill
        remaining = jnp.maximum(
            params.max_episode_steps - step_count, 0
        ).astype(jnp.float32)
        total_reward = total_reward + jnp.where(
            first_success,
            jnp.maximum(window_mean, 0.0)
            * remaining
            * params.reward.survival_success_scale,
            0.0,
        )

    # 7. termination with POST-update success flag (ref :697-721);
    # success terminates only when terminate_on_success (default = parity)
    horiz_dist = jnp.linalg.norm(body.pos[:2])
    success_term = (
        mission_success
        if params.termination.terminate_on_success
        else jnp.bool_(False)
    )
    terminated = (
        success_term
        | crashed
        | (tilt > params.termination.max_tilt)
        | (altitude > params.termination.max_altitude)
        | (horiz_dist > params.termination.max_horizontal_distance)
    )
    truncated = step_count >= params.max_episode_steps

    new_state = EnvState(
        body=body,
        fuel=fuel,
        step_count=step_count,
        phase=new_phase,
        mission_success=mission_success,
        success_count=success_count,
        prev_action=action,
        has_prev_action=jnp.bool_(True),
        reward_window=reward_window,
        reward_window_len=reward_window_len,
        prev_imu=imu,
        trim=trim,
        dr=state.dr,
        key=key,
    )
    out = StepOutput(
        obs=obs,
        reward=total_reward,
        terminated=terminated,
        truncated=truncated,
        altitude=altitude,
        tilt=tilt,
        angular_velocity_mag=ang_mag,
        fuel=fuel,
        phase=new_phase,
        mission_success=mission_success,
        crashed=crashed,
        reward_components=components,
    )
    return new_state, out


def _finish_autoreset(
    new_state: EnvState, out: StepOutput, params: EnvParams
) -> tuple[EnvState, StepOutput, jnp.ndarray]:
    """Masked in-place reset after a completed ``step`` (per-env; vmappable)."""
    done = out.terminated | out.truncated
    k_reset, k_carry = jax.random.split(new_state.key)
    reset_state, reset_obs = reset(k_reset, params)
    # keep the key chain moving even when not resetting
    carried = jax.tree.map(
        lambda r, n: jnp.where(
            jnp.reshape(done, done.shape + (1,) * (jnp.ndim(n) - jnp.ndim(done))),
            r,
            n,
        ),
        reset_state,
        new_state.replace(key=k_carry),
    )
    next_policy_obs = jnp.where(done, reset_obs, out.obs)
    return carried, out, next_policy_obs


def step_autoreset(
    state: EnvState, action: jnp.ndarray, params: EnvParams
) -> tuple[EnvState, StepOutput, jnp.ndarray]:
    """Step with masked in-place reset — the vmap replacement for Gym's episode loop.

    Returns ``(carried_state, out, next_policy_obs)``:

    - ``out.obs`` is the TRUE next observation of the (possibly finished)
      episode step — what belongs in the replay buffer as next_obs;
    - ``next_policy_obs`` is the observation to act on next step — equal to
      ``out.obs`` unless the episode ended, in which case it is the first
      observation of a freshly reset episode (new domain-randomization draw
      from the env's own key chain, no host sync).
    """
    new_state, out = step(state, action, params)
    return _finish_autoreset(new_state, out, params)


def pallas_physics_ok(params: EnvParams) -> bool:
    """Static check: the SoA Pallas kernel implements exactly the parity
    physics (gravity quirk, gimbaled thrust, drag, damping, penalty
    contact). The optional extra terms live only in the XLA integrator, so
    any of them being on routes the batch through the vmapped path."""
    r = params.rocket
    return not (r.magnus_effect or r.ground_effect or r.gyroscopic)


def batched_step_autoreset(
    states: EnvState,
    actions: jnp.ndarray,
    params: EnvParams,
    use_pallas: bool | None = None,
    block_envs: int = 512,
    interpret: bool = False,
) -> tuple[EnvState, StepOutput, jnp.ndarray]:
    """Whole-batch ``step_autoreset`` — the production N-env hot path.

    Semantically identical to ``vmap(step_autoreset, in_axes=(0, 0, None))``
    but with the rigid-body integrate done by the SoA Pallas kernel
    (``ops.pallas_step``) as ONE whole-batch call: the vmapped XLA path keeps
    state as (N, 3)/(N, 4) arrays where elementwise physics uses 3-4 of 128
    VPU lanes; the kernel's (rows, N) layout uses all of them (+35% whole-app
    on a v5e chip at N=4096). Pre/post stages (action conditioning, reward,
    FSM, observation, autoreset) stay on the vmapped XLA path — they are
    cheap and fuse well.

    ``use_pallas=None`` auto-selects: the kernel runs when the backend is
    TPU and no extra physics term is enabled (``pallas_physics_ok``); CPU
    (tests, the multichip dryrun) and extended-physics configs fall back to
    the vmapped path. All selection is static — no runtime branch.
    """
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu" and pallas_physics_ok(params)
        )
    if not use_pallas:
        return jax.vmap(step_autoreset, in_axes=(0, 0, None))(
            states, actions, params
        )
    if not pallas_physics_ok(params):
        raise ValueError(
            "use_pallas=True but an extra physics term (magnus/ground-effect/"
            "gyroscopic) is enabled; the kernel implements parity physics only"
        )
    from tvc_ai_tpu.ops.pallas_step import step_pallas

    action, gimbal, thrust_active, fuel, key, k_noise = jax.vmap(
        _pre_physics, in_axes=(0, 0, None)
    )(states, actions, params)
    body = step_pallas(
        states.body,
        ThrustControl(gimbal=gimbal, thrust_active=thrust_active),
        params.rocket,
        mass=states.dr.mass,
        thrust_scale=states.dr.thrust_scale,
        cg_offset=states.dr.cg_offset,
        wind=states.dr.wind,
        block_envs=block_envs,
        interpret=interpret,
    )
    new_state, out = jax.vmap(
        _post_physics, in_axes=(0, 0, 0, 0, 0, 0, None)
    )(states, body, action, fuel, key, k_noise, params)
    return jax.vmap(_finish_autoreset, in_axes=(0, 0, None))(
        new_state, out, params
    )
