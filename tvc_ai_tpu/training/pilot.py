"""Blind model-based identification pilot: particle filter + CEM replanning.

The round-4 cross-transfer measurement (``scripts/cross_transfer.py``,
RESULTS.md) proved the robustness suite is an *identification race*: the
per-draw CEM oracle wins ~11 % of suite episodes, but the winning
controllers barely transfer (18.7 % off-diagonal), the best single fixed
controller covers 34.5 % of the solved set, and so any policy that cannot
identify the episode's plant draw in-flight is capped at ~3.9 % — exactly
where every distilled student landed. Passing that bound requires picking
the right controller *for this draw* from the observation stream before
the marginally stable plant tips over.

This module is the framework's answer, built from parts it already has:
the batched simulator is a perfect forward model, so a **blind** policy
(observations only — never the env's true state or draw) can run a
Rao-Blackwellized-style particle filter over the 7-D domain-randomization
draw (mass, thrust_scale, cg_offset×3, wind×2):

- each particle is a full plant hypothesis: a DR draw plus the rigid-body
  state that draw implies under the executed action history (the suite's
  reset state is deterministic, so particle trajectories ARE the
  hypothesis-conditioned truth — the filter compares trajectories, not
  noisy point predictions);
- the measurement update scores the presented IMU reading ([quat, ω] with
  the suite's σ=0.02 sensor noise) and the idealized-INS drift channels
  against each particle's predicted reading;
- systematic resampling with Liu-West-style parameter jitter (shrinking
  with the posterior spread, clipped to the prior box) anneals the swarm
  onto the true draw;
- control is the measured-best blind strategy while identifying (the
  gain-scheduled ground-balance LQR of ``training/demos.py`` evaluated at
  the posterior-mean plant and the posterior-mean state), then a per-draw
  CEM replan (``training/cem.py``) *inside the pilot's own model* — the
  same search the privileged oracle runs, but on the identified plant
  hypothesis from the estimated current state.

Honesty contract: every function here consumes only (a) the observation
stream the eval suite presents, (b) the pilot's own actions, and (c) the
public environment constants (physics parameters and the DR *prior* —
both part of the benchmark definition, not the episode draw). The true
``EnvState``/``DomainParams`` of the evaluated episode are never read.
Reference contract this serves: the robustness/stress evaluation suites
(ref scripts/evaluate.py:338-391).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tvc_ai_tpu.env import rocket_env
from tvc_ai_tpu.env.randomization import sample_domain_params
from tvc_ai_tpu.env.types import (
    ACTION_DIM,
    OBS_DIM,
    TRIM_OBS_DIM,
    DomainParams,
    EnvParams,
    EnvState,
)
from tvc_ai_tpu.physics import quaternion as quat
from tvc_ai_tpu.physics.integrator import ThrustControl
from tvc_ai_tpu.physics.integrator import step as physics_step
from tvc_ai_tpu.physics.types import RigidBodyState
from tvc_ai_tpu.training import cem as cem_mod
from tvc_ai_tpu.training import demos


class PilotConfig(NamedTuple):
    particles: int = 192
    # measurement model: σ for the noisy IMU channels (the robustness
    # suite's sensor_noise_std; the uniform-noise axis draws σ ≤ this, so
    # using the max is a conservative likelihood) and for the noise-free
    # drift channels (tolerance for residual initial-state error — the
    # t=0 IMU reading seeds the swarm's shared body state, so even the
    # true-draw particle carries an O(σ_imu) state offset).
    sigma_imu: float = 0.02
    sigma_drift: float = 0.02
    ess_frac: float = 0.5          # resample when ESS < ess_frac · P
    jitter_frac: float = 0.25      # param jitter × posterior std on resample
    # MMAE-style observer feedback: after weighting, each particle's
    # OBSERVED channels are nudged toward the reading (innovation gain).
    # Without this the deterministic particle states accumulate unbounded
    # drift once their params are jittered (no process noise, no feedback)
    # and the weights measure stale history instead of current model error;
    # with it each particle is a per-model observer and the innovation
    # stream is persistent for wrong params, ~noise for the right ones —
    # classical multiple-model adaptive estimation. z and vz have no
    # observed channel and evolve by model only.
    obs_gain_imu: float = 0.25     # quat/ω blend toward the noisy reading
    obs_gain_drift: float = 0.4    # pos/vel-xy blend toward the exact INS
    # absolute jitter floors keep the swarm alive once it has collapsed
    # (units: kg, thrust fraction, m, N)
    jitter_floor_mass: float = 0.004
    jitter_floor_thrust: float = 0.002
    jitter_floor_cg: float = 0.0004
    jitter_floor_wind: float = 0.01
    # control-path state source: False = posterior-mean body (the filter
    # doubles as an IMU denoiser, at the cost of estimator lag), True =
    # the presented observation directly (quat/ω from the IMU reading,
    # xy pos/vel from the exact INS drift channels) with only the two
    # unobserved channels (z, vz) taken from the posterior. The plant is
    # marginally stable, so feedback latency costs more than the σ=0.02
    # reading noise — measured on the robustness suite (RESULTS.md r4).
    state_from_obs: bool = False


class FilterState(NamedTuple):
    """Per-env particle swarm (leading axis = particles)."""

    bodies: RigidBodyState        # (P, ...) hypothesis rigid-body states
    dr: DomainParams              # (P,) hypothesis draws
    log_w: jnp.ndarray            # (P,) unnormalized log weights
    fuel: jnp.ndarray             # scalar — deterministic, shared
    key: jnp.ndarray


class PilotState(NamedTuple):
    filt: FilterState
    theta: jnp.ndarray            # (THETA_DIM,) CEM-replanned controller
    has_theta: jnp.ndarray        # bool — False until the first replan
    prev_action: jnp.ndarray      # (ACTION_DIM,) last commanded action
    last_obs: jnp.ndarray         # the most recent presented observation


# ---------------------------------------------------------------------------
# observation parsing (the pilot's only input channel)
# ---------------------------------------------------------------------------


def _parse_obs(obs: jnp.ndarray, params: EnvParams):
    """Split a presented observation into (quat_read, omega_read, fuel,
    drift_read|None). Drift channels are the scaled [vx, vy, x, y] INS
    block (env/rocket_env.py::_append_drift)."""
    q = obs[..., 0:4]
    w = obs[..., 4:7]
    fuel = obs[..., 7]
    i = OBS_DIM + (TRIM_OBS_DIM if params.trim_obs_enabled else 0)
    drift = obs[..., i : i + 4] if params.drift_obs_enabled else None
    return q, w, fuel, drift


def _predicted_drift(body: RigidBodyState, params: EnvParams) -> jnp.ndarray:
    return jnp.concatenate(
        [
            body.vel[..., :2] * params.drift_obs_vel_scale,
            body.pos[..., :2] * params.drift_obs_pos_scale,
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# filter init / predict / update  (single env; vmap over envs at the driver)
# ---------------------------------------------------------------------------


def init_filter(
    key: jnp.ndarray, obs0: jnp.ndarray, params: EnvParams, cfg: PilotConfig
) -> FilterState:
    """Seed the swarm from the first presented observation.

    The body state is reconstructed from public information only: the IMU
    reading gives quat/ω (to sensor-noise accuracy), the drift channels
    give x, y, vx, vy exactly, and the reset law pins z = init_pos[2] and
    vz = 0 (env/rocket_env.py::reset — suite params draw no initial-state
    randomization; with init randomization enabled this seed is still
    correct to the jitter scale and the filter absorbs the rest).
    """
    k_dr, k_next = jax.random.split(key)
    p = cfg.particles
    dr = jax.vmap(sample_domain_params, in_axes=(0, None, None))(
        jax.random.split(k_dr, p), params.rocket, params.randomization
    )
    q_read, w_read, _, drift = _parse_obs(obs0, params)
    if drift is not None:
        vel_xy = drift[:2] / params.drift_obs_vel_scale
        pos_xy = drift[2:] / params.drift_obs_pos_scale
    else:
        vel_xy = jnp.zeros(2, jnp.float32)
        pos_xy = params.init_pos[:2]
    pos = jnp.concatenate([pos_xy, params.init_pos[2:3]])
    vel = jnp.concatenate([vel_xy, jnp.zeros(1, jnp.float32)])
    body1 = RigidBodyState(
        pos=pos.astype(jnp.float32),
        quat=quat.normalize(q_read).astype(jnp.float32),
        vel=vel.astype(jnp.float32),
        omega=w_read.astype(jnp.float32),
    )
    bodies = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (p,) + x.shape), body1
    )
    return FilterState(
        bodies=bodies,
        dr=dr,
        log_w=jnp.zeros(p, jnp.float32),
        fuel=jnp.float32(1.0),
        key=k_next,
    )


def _predict(fs: FilterState, action: jnp.ndarray, params: EnvParams):
    """Advance every hypothesis one control step under the executed action
    (mirrors env/rocket_env.py::_pre_physics fuel gating; actuator delay is
    carried by the caller feeding the *applied* action)."""
    rp = params.rocket
    thrust_active = fs.fuel > 0.0
    gimbal = jnp.clip(action, -1.0, 1.0) * rp.max_gimbal
    p = fs.log_w.shape[0]
    bodies = physics_step(
        fs.bodies,
        ThrustControl(
            gimbal=jnp.broadcast_to(gimbal, (p, ACTION_DIM)),
            thrust_active=jnp.broadcast_to(thrust_active, (p,)),
        ),
        rp,
        mass=fs.dr.mass,
        thrust_scale=fs.dr.thrust_scale,
        cg_offset=fs.dr.cg_offset,
        wind=fs.dr.wind,
    )
    fuel = jnp.where(
        thrust_active, jnp.maximum(0.0, fs.fuel - rp.fuel_burn_rate), fs.fuel
    )
    return fs._replace(bodies=bodies, fuel=fuel)


def _loglik(
    fs: FilterState, obs: jnp.ndarray, params: EnvParams, cfg: PilotConfig
) -> jnp.ndarray:
    q_read, w_read, _, drift = _parse_obs(obs, params)
    # quaternion sign ambiguity: q and -q are the same rotation
    dq = jnp.minimum(
        jnp.sum((fs.bodies.quat - q_read) ** 2, -1),
        jnp.sum((fs.bodies.quat + q_read) ** 2, -1),
    )
    dw = jnp.sum((fs.bodies.omega - w_read) ** 2, -1)
    ll = -(dq + dw) / (2.0 * cfg.sigma_imu**2)
    if drift is not None:
        dd = jnp.sum((_predicted_drift(fs.bodies, params) - drift) ** 2, -1)
        ll = ll - dd / (2.0 * cfg.sigma_drift**2)
    return ll


def _prior_box(params: EnvParams):
    """Support of the DR prior (public benchmark definition) — resampled
    hypotheses are clipped back into it."""
    rnd = params.randomization
    rp = params.rocket
    m_lo = rp.mass * (1.0 - rnd.mass_variation)
    m_hi = rp.mass * (1.0 + rnd.mass_variation)
    t_lo = 1.0 - 2.0 * rnd.thrust_variation
    t_hi = 1.0 + 2.0 * rnd.thrust_variation
    cg_hi = jnp.stack(
        [rnd.cg_offset_max, rnd.cg_offset_max, rnd.cg_offset_max * 0.5]
    )
    wind_hi = jnp.stack([rnd.wind_max, rnd.wind_max, jnp.float32(0.0)])
    return (m_lo, m_hi), (t_lo, t_hi), cg_hi, wind_hi


def _resample(fs: FilterState, params: EnvParams, cfg: PilotConfig):
    """Systematic resample + Liu-West parameter jitter, applied only when
    the effective sample size has degenerated (computed branch-free and
    select-gated so it vmaps)."""
    p = fs.log_w.shape[0]
    lw = fs.log_w - jax.scipy.special.logsumexp(fs.log_w)
    w = jnp.exp(lw)
    ess = 1.0 / jnp.sum(w**2)
    need = ess < cfg.ess_frac * p

    key, k_u, k_j = jax.random.split(fs.key, 3)
    cum = jnp.cumsum(w)
    pts = (jax.random.uniform(k_u) + jnp.arange(p)) / p
    idx = jnp.searchsorted(cum, pts)
    idx = jnp.clip(idx, 0, p - 1)

    take = lambda x: jnp.where(need, x[idx], x)  # noqa: E731
    bodies = jax.tree.map(take, fs.bodies)
    dr = jax.tree.map(take, fs.dr)

    # posterior spread per physical field (weighted, pre-resample)
    def wstd(x):
        mu = jnp.sum(w[(...,) + (None,) * (x.ndim - 1)] * x, 0)
        var = jnp.sum(w[(...,) + (None,) * (x.ndim - 1)] * (x - mu) ** 2, 0)
        return jnp.sqrt(var + 1e-12)

    n4 = jax.random.normal(k_j, (p, 8))
    (m_lo, m_hi), (t_lo, t_hi), cg_hi, wind_hi = _prior_box(params)
    j_m = n4[:, 0] * (cfg.jitter_frac * wstd(fs.dr.mass) + cfg.jitter_floor_mass)
    j_t = n4[:, 1] * (
        cfg.jitter_frac * wstd(fs.dr.thrust_scale) + cfg.jitter_floor_thrust
    )
    j_cg = n4[:, 2:5] * (
        cfg.jitter_frac * wstd(fs.dr.cg_offset) + cfg.jitter_floor_cg
    )
    j_wind = n4[:, 5:8] * (
        cfg.jitter_frac * wstd(fs.dr.wind) + cfg.jitter_floor_wind
    )
    j_wind = j_wind * jnp.array([1.0, 1.0, 0.0])  # wind is horizontal
    mass = jnp.clip(dr.mass + jnp.where(need, j_m, 0.0), m_lo, m_hi)
    tsc = jnp.clip(dr.thrust_scale + jnp.where(need, j_t, 0.0), t_lo, t_hi)
    cg = jnp.clip(dr.cg_offset + jnp.where(need, j_cg, 0.0), -cg_hi, cg_hi)
    wind = jnp.clip(dr.wind + jnp.where(need, j_wind, 0.0), -wind_hi, wind_hi)
    dr = dr.replace(mass=mass, thrust_scale=tsc, cg_offset=cg, wind=wind)

    log_w = jnp.where(need, jnp.zeros_like(fs.log_w), lw)
    return fs._replace(bodies=bodies, dr=dr, log_w=log_w, key=key)


def _observer_correct(
    fs: FilterState, obs: jnp.ndarray, params: EnvParams, cfg: PilotConfig
) -> FilterState:
    """Blend each particle's observed channels toward the presented reading
    (see PilotConfig.obs_gain_*)."""
    q_read, w_read, _, drift = _parse_obs(obs, params)
    b = fs.bodies
    # sign-align the reading to each particle before blending
    sgn = jnp.sign(jnp.sum(b.quat * q_read, -1, keepdims=True))
    sgn = jnp.where(sgn == 0.0, 1.0, sgn)
    g = cfg.obs_gain_imu
    q = quat.normalize(b.quat + g * (sgn * q_read - b.quat))
    w = b.omega + g * (w_read - b.omega)
    pos, vel = b.pos, b.vel
    if drift is not None:
        gd = cfg.obs_gain_drift
        vel_read = drift[:2] / params.drift_obs_vel_scale
        pos_read = drift[2:] / params.drift_obs_pos_scale
        vel = vel.at[..., :2].add(gd * (vel_read - vel[..., :2]))
        pos = pos.at[..., :2].add(gd * (pos_read - pos[..., :2]))
    return fs._replace(bodies=RigidBodyState(pos=pos, quat=q, vel=vel, omega=w))


def observe(
    fs: FilterState,
    action: jnp.ndarray,
    obs: jnp.ndarray,
    params: EnvParams,
    cfg: PilotConfig,
) -> FilterState:
    """One filter cycle: predict under the executed action, weight the
    innovation, apply observer feedback, resample if degenerate."""
    fs = _predict(fs, action, params)
    fs = fs._replace(log_w=fs.log_w + _loglik(fs, obs, params, cfg))
    fs = _observer_correct(fs, obs, params, cfg)
    return _resample(fs, params, cfg)


# ---------------------------------------------------------------------------
# posterior estimates
# ---------------------------------------------------------------------------


def _weights(fs: FilterState) -> jnp.ndarray:
    return jax.nn.softmax(fs.log_w)


def estimate_body(fs: FilterState) -> RigidBodyState:
    """Posterior-mean rigid-body state (quat renormalized — the weighted
    chordal mean is fine at the swarm's small angular spread)."""
    w = _weights(fs)
    wm = lambda x: jnp.sum(w[:, None] * x, 0)  # noqa: E731
    # align quat signs to the highest-weight particle before averaging
    ref = fs.bodies.quat[jnp.argmax(w)]
    sgn = jnp.sign(jnp.sum(fs.bodies.quat * ref, -1, keepdims=True))
    sgn = jnp.where(sgn == 0.0, 1.0, sgn)
    return RigidBodyState(
        pos=wm(fs.bodies.pos),
        quat=quat.normalize(wm(fs.bodies.quat * sgn)),
        vel=wm(fs.bodies.vel),
        omega=wm(fs.bodies.omega),
    )


def estimate_dr(fs: FilterState) -> DomainParams:
    """Posterior-mean draw hypothesis."""
    w = _weights(fs)
    wm = lambda x: jnp.sum(  # noqa: E731
        w[(...,) + (None,) * (x.ndim - 1)] * x, 0
    )
    return DomainParams(
        mass=wm(fs.dr.mass),
        thrust_scale=wm(fs.dr.thrust_scale),
        cg_offset=wm(fs.dr.cg_offset),
        wind=wm(fs.dr.wind),
        sensor_noise_std=wm(fs.dr.sensor_noise_std),
        progress_rate=wm(fs.dr.progress_rate),
    )


# ---------------------------------------------------------------------------
# pilot (filter + control): act / observe / replan
# ---------------------------------------------------------------------------


def init_pilot(
    key: jnp.ndarray, obs0: jnp.ndarray, params: EnvParams, cfg: PilotConfig
) -> PilotState:
    return PilotState(
        filt=init_filter(key, obs0, params, cfg),
        theta=jnp.zeros(cem_mod.THETA_DIM, jnp.float32),
        has_theta=jnp.asarray(False),
        prev_action=jnp.zeros(ACTION_DIM, jnp.float32),
        last_obs=obs0,
    )


def body_from_obs(
    obs: jnp.ndarray, filt: FilterState, params: EnvParams
) -> RigidBodyState:
    """Control-state reconstruction straight from the presented observation:
    quat/ω are the IMU reading, xy pos/vel the exact INS drift channels;
    only the unobserved (z, vz) come from the filter's posterior mean."""
    q_read, w_read, _, drift = _parse_obs(obs, params)
    post = estimate_body(filt)
    if drift is not None:
        vel_xy = drift[:2] / params.drift_obs_vel_scale
        pos_xy = drift[2:] / params.drift_obs_pos_scale
    else:
        vel_xy = post.vel[:2]
        pos_xy = post.pos[:2]
    return RigidBodyState(
        pos=jnp.concatenate([pos_xy, post.pos[2:3]]),
        quat=quat.normalize(q_read),
        vel=jnp.concatenate([vel_xy, post.vel[2:3]]),
        omega=w_read,
    )


def control_body(
    ps: PilotState, params: EnvParams, cfg: PilotConfig
) -> RigidBodyState:
    """The state fed to the control law (see PilotConfig.state_from_obs)."""
    if cfg.state_from_obs:
        return body_from_obs(ps.last_obs, ps.filt, params)
    return estimate_body(ps.filt)


def pilot_act(
    ps: PilotState,
    sched: demos.LQRSchedule,
    params: EnvParams,
    cfg: PilotConfig = PilotConfig(),
) -> tuple[PilotState, jnp.ndarray]:
    """Action from the current posterior: the CEM-replanned controller once
    one exists, else the gain-scheduled blind LQR at the posterior-mean
    plant — fed the posterior-mean state or the raw observed state per
    ``cfg.state_from_obs``."""
    body = control_body(ps, params, cfg)
    dr = estimate_dr(ps.filt)
    rp = params.rocket
    a_lqr = demos.lqr_action_scheduled(
        body, sched, dr.mass, dr.thrust_scale, jnp.zeros(3), rp
    )
    a_cem = cem_mod.controller_action(ps.theta, body, rp)
    action = jnp.where(ps.has_theta, a_cem, a_lqr)
    return ps._replace(prev_action=action), action


def pilot_observe(
    ps: PilotState, obs: jnp.ndarray, params: EnvParams, cfg: PilotConfig
) -> PilotState:
    return ps._replace(
        filt=observe(ps.filt, ps.prev_action, obs, params, cfg),
        last_obs=obs,
    )


def replan_from(
    key: jnp.ndarray,
    ps: PilotState,                 # batched over envs (leading axis N)
    bodies: RigidBodyState,         # (N,) plan-from body states
    drs: DomainParams,              # (N,) plant hypotheses
    fuel: jnp.ndarray,              # (N,) fuel hypotheses
    sched: demos.LQRSchedule,
    params: EnvParams,
    ccfg: cem_mod.CEMConfig,
    template: EnvState,             # (N,) env-state template for shapes only
) -> PilotState:
    """Per-draw CEM replan mechanism from explicit (body, draw, fuel)
    hypotheses. ``replan`` feeds it the pilot's own posterior (the honest
    blind path); scripts/pilot_eval.py's --oracle_* probes feed it the
    evaluated episode's truth to isolate which estimation error binds."""
    n = ps.has_theta.shape[0]
    states = template.replace(
        body=bodies,
        dr=drs,
        fuel=fuel,
        step_count=jnp.zeros(n, jnp.int32),
        phase=template.phase,
        mission_success=jnp.zeros(n, bool),
        success_count=jnp.zeros(n, jnp.int32),
        prev_action=ps.prev_action,
    )
    theta0 = cem_mod.theta_from_design(
        demos.interp_design(sched, drs.mass, drs.thrust_scale)
    )
    # warm-start from the previous plan where one exists
    theta0 = jnp.where(ps.has_theta[:, None], ps.theta, theta0)
    theta, _ = cem_mod.refine_per_draw(key, params, states, theta0, ccfg)
    return ps._replace(theta=theta, has_theta=jnp.ones_like(ps.has_theta))


def select_from_library(
    key: jnp.ndarray,
    ps: PilotState,                 # batched over envs (leading axis N)
    library: jnp.ndarray,           # (K, THETA_DIM) set-cover controllers
    params: EnvParams,
    score_cfg: cem_mod.CEMConfig,   # horizon/shaping for the scoring rollouts
    template: EnvState,             # (N,) env-state template for shapes only
    n_samples: int = 8,
    bodies: RigidBodyState | None = None,  # PROBE: (N,) true body states
    drs: DomainParams | None = None,       # PROBE: (N,) true draws
    fuel: jnp.ndarray | None = None,       # PROBE: (N,) true fuel
) -> PilotState:
    """Bayes-adaptive controller selection: score every library member on
    ``n_samples`` posterior PARTICLES (each a joint state+draw hypothesis —
    no mean collapse, so jointly-unidentifiable axes like (cg, wind) torque
    are handled by agreement across samples) inside the pilot's own model,
    and commit to the member with the best posterior-mean score.

    Cost: N·K·S model rollouts of ``score_cfg.horizon`` steps — at the
    defaults (512·16·8·500 ≈ 33M model steps) well under a second of TPU
    time, cheap enough to re-select several times per episode. The library
    comes from scripts/build_ctrl_library.py (greedy set cover of the
    per-draw CEM oracle's solved set; library[0] = best single coverage,
    the pre-identification strategy).

    ``bodies``/``drs``/``fuel`` are PRIVILEGED probe overrides (see
    scripts/pilot_eval.py --oracle_*): when given, the corresponding
    hypothesis is the evaluated episode's truth (tiled across the sample
    axis) instead of a posterior sample — isolating how much of a
    selection failure is estimation error vs the selection mechanism."""
    n = ps.has_theta.shape[0]
    k = library.shape[0]
    s = n_samples
    key, k_obs = jax.random.split(key)

    # sample S particle indices per env from the posterior weights
    def draw_idx(key_i, log_w):
        return jax.random.categorical(key_i, log_w, shape=(s,))

    idx = jax.vmap(draw_idx)(jax.random.split(key, n), ps.filt.log_w)  # (N,S)

    # gather sampled hypotheses: bodies (N,S,...), draws (N,S,...)
    take = lambda x: jnp.take_along_axis(  # noqa: E731
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1
    )
    tile = lambda x: jnp.broadcast_to(  # noqa: E731
        x[:, None], (n, s) + x.shape[1:]
    )
    bodies = (jax.tree.map(take, ps.filt.bodies) if bodies is None
              else jax.tree.map(tile, bodies))
    drs = (jax.tree.map(take, ps.filt.dr) if drs is None
           else jax.tree.map(tile, drs))

    # tile to (N·S·K,) rollouts: env slowest, sample middle, member fastest
    def rep(x):
        x = jnp.repeat(x.reshape((n * s,) + x.shape[2:]), k, axis=0)
        return x

    rbodies = jax.tree.map(rep, bodies)
    rdrs = jax.tree.map(rep, drs)
    r = n * s * k
    texp = jax.tree.map(
        lambda x: jnp.repeat(x, s * k, axis=0), template
    )
    fuel_src = ps.filt.fuel if fuel is None else fuel
    states = texp.replace(
        body=rbodies,
        dr=rdrs,
        fuel=jnp.repeat(fuel_src, s * k),
        step_count=jnp.zeros(r, jnp.int32),
        mission_success=jnp.zeros(r, bool),
        success_count=jnp.zeros(r, jnp.int32),
        prev_action=jnp.repeat(ps.prev_action, s * k, axis=0),
    )
    theta = jnp.tile(library, (n * s, 1))  # (N·S·K, THETA_DIM)
    scores = cem_mod.rollout_score(theta, states, params, score_cfg, key=k_obs)
    mean_over_samples = scores.reshape(n, s, k).mean(1)  # (N, K)
    best = jnp.argmax(mean_over_samples, axis=1)  # (N,)
    return ps._replace(
        theta=library[best], has_theta=jnp.ones_like(ps.has_theta)
    )


def replan(
    key: jnp.ndarray,
    ps: PilotState,                 # batched over envs (leading axis N)
    sched: demos.LQRSchedule,
    params: EnvParams,
    ccfg: cem_mod.CEMConfig,
    template: EnvState,             # (N,) env-state template for shapes only
) -> PilotState:
    """Per-draw CEM inside the pilot's model: plan from the posterior-mean
    state on the posterior-mean plant (batched over envs). ``template`` is
    any correctly-shaped batched EnvState (e.g. a fresh vmap(reset)); its
    physical content is fully overwritten by the pilot's own estimates —
    nothing of the evaluated episode leaks in."""
    bodies = jax.vmap(estimate_body)(ps.filt)
    drs = jax.vmap(estimate_dr)(ps.filt)
    return replan_from(
        key, ps, bodies, drs, ps.filt.fuel, sched, params, ccfg, template
    )
