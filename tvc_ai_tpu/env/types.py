"""Environment state/parameter pytrees.

The reference env is a stateful Python object wrapping one PyBullet client
(ref: env/enhanced_rocket_tvc_env.py:271-753). Here the environment is a pair
of pure functions over these pytrees, so N envs = one leading batch axis and
the whole rollout fuses into a single XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from tvc_ai_tpu.physics.types import RigidBodyState, RocketParams

# Mission phases, same ordering as the reference enum so the normalized
# phase observation matches (ref: env/enhanced_rocket_tvc_env.py:21-29,:593).
PHASE_BOOST = 0
PHASE_COAST = 1
PHASE_LANDING = 2
PHASE_TOUCHDOWN = 3
PHASE_HOVER = 4
PHASE_COMPLETE = 5
PHASE_FAILED = 6
NUM_PHASES = 7

PHASE_NAMES = ("boost", "coast", "landing", "touchdown", "hover", "complete", "failed")

OBS_DIM = 10          # [quat(4), ω(3), fuel, phase, progress]  (ref :354-374)
OBS_DIM_LEGACY = 8    # [quat(4), ω(3), fuel]                   (legacy API, SURVEY §0.1)
ACTION_DIM = 2        # gimbal [pitch, yaw] in [-1, 1]          (ref :376-379)
# optional trim-observation channels appended after the reference's 10
# (EnvParams.trim_obs_enabled): [ema_qx, ema_qy, ema_act_pitch, ema_act_yaw]
TRIM_OBS_DIM = 4
# optional drift-observation channels appended after the trim block
# (EnvParams.drift_obs_enabled): [vx, vy, x, y] scaled — an idealized-INS
# horizontal velocity + position-drift estimate (see EnvParams docstring)
DRIFT_OBS_DIM = 4
# optional action-observation channels appended after the drift block
# (EnvParams.action_obs_enabled): the previously commanded [pitch, yaw] in
# [-1, 1]. With history stacking this turns the policy input into
# (obs, action) pairs — the system-identification window a blind policy
# needs to infer the episode's mass/thrust draw from the response it
# provokes (RMA-style teacher-student distillation; RESULTS.md r4: the
# nominal-plant LQR collapses 77%→3% when the mass/thrust axes combine,
# so param-adaptivity IS the missing robust skill).
ACTION_OBS_DIM = 2


def obs_dim(params: "EnvParams") -> int:
    """Actual observation width for a parameterization (10, +4 trim, +4
    drift, +2 prev-action)."""
    return (
        OBS_DIM
        + (TRIM_OBS_DIM if params.trim_obs_enabled else 0)
        + (DRIFT_OBS_DIM if params.drift_obs_enabled else 0)
        + (ACTION_OBS_DIM if params.action_obs_enabled else 0)
    )


@struct.dataclass
class DomainParams:
    """Per-episode randomized physical parameters (one draw per reset).

    Ranges follow the reference's domain-randomization spec
    (config/config.yaml:340-349 + legacy RocketConfig fields): mass ±30 %
    uniform, thrust ±20 % normal, CG offset ≤ 0.1 m, wind ≤ 3 N normal,
    IMU noise σ = 0.02.
    """

    mass: jnp.ndarray          # kg
    thrust_scale: jnp.ndarray  # multiplier on nominal thrust
    cg_offset: jnp.ndarray     # (3,) m, body frame
    wind: jnp.ndarray          # (3,) N, world frame, constant over the episode
    sensor_noise_std: jnp.ndarray
    # multiplier on the progress observation's per-step increment; the obs
    # becomes min(1, step · progress_rate / max_episode_steps). Randomizing
    # it per episode makes the policy robust to evaluation horizons it was
    # never trained on (the ref suites use 1000/1500/2000-step horizons, and
    # a policy trained at one horizon reads a different progress slope as
    # out-of-distribution — measured 100%→0% success at 1000→2000).
    progress_rate: jnp.ndarray

    @staticmethod
    def nominal(rocket: RocketParams) -> "DomainParams":
        return DomainParams(
            mass=jnp.asarray(rocket.mass, jnp.float32),
            thrust_scale=jnp.float32(1.0),
            cg_offset=jnp.zeros(3, jnp.float32),
            wind=jnp.zeros(3, jnp.float32),
            sensor_noise_std=jnp.float32(0.0),
            progress_rate=jnp.float32(1.0),
        )


@struct.dataclass
class RandomizationConfig:
    """Randomization ranges; curriculum stages scale these (config.yaml:240-286)."""

    enabled: bool = struct.field(pytree_node=False, default=False)
    sensor_noise_enabled: bool = struct.field(pytree_node=False, default=False)
    mass_variation: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.3))
    thrust_variation: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.2))
    cg_offset_max: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.1))
    wind_max: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(3.0))
    sensor_noise_std: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.02))
    # per-episode probability that the HARD physical axes (mass, thrust,
    # CG offset, wind) are randomized; the rest of the episodes draw nominal
    # physics (noise/progress dither still applies). Under full DR the
    # success criterion is so rarely met by stochastic training rollouts
    # that the success-seeking learning signal starves (measured ~0.1%
    # train-episode success while nominal evals oscillate 30-90%); an
    # easy/hard mixture keeps the signal dense while still training
    # robustness. 1.0 = always randomized (default).
    dr_prob: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    # static gate for the mixture draw (set when dr_prob < 1): lets XLA
    # compile the per-reset Bernoulli + selects away in the common case
    dr_mixture_enabled: bool = struct.field(pytree_node=False, default=False)
    # per-episode IMU-noise-level randomization: σ ~ U[0, sensor_noise_std]
    # instead of the fixed σ. Covers the sterile (σ=0) and full-noise worlds
    # with ONE policy — a fixed-σ-trained policy sees noise-free inputs as
    # out-of-distribution and can fail the deterministic eval suites.
    sensor_noise_uniform: bool = struct.field(pytree_node=False, default=False)
    # per-step probability the IMU reading goes stale (sensor fault
    # injection — spec'd in the reference's GUIDE/Config-guide/
    # CONFIG_GUIDE.md:93-96 ``sensor_dropout_prob`` but never implemented
    # there): on a dropout step the policy sees the PREVIOUS quat/ω reading
    # (hold-last, like a real IMU packet drop). The static enable flag lets
    # XLA compile the Bernoulli draw out of the hot path entirely when off
    # (a traced prob alone costs ~5% env throughput at 4096 envs).
    sensor_dropout_enabled: bool = struct.field(pytree_node=False, default=False)
    sensor_dropout_prob: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.0)
    )
    # initial-condition randomization (legacy/curriculum; the enhanced env
    # resets deterministically to [0,0,1] + identity, ref :381-407,:438)
    # per-episode progress-slope randomization: progress_rate ~ U[min, max]
    # (1.0/1.0 = off). Train with e.g. [0.5, 2.0] so the 1500/2000-step eval
    # horizons' slower progress slopes are in-distribution. The static gate
    # (set when min != max) compiles the draw away when unused — under
    # branchless autoreset the sampler runs EVERY env step, so dead draws
    # cost real throughput.
    progress_rate_randomized: bool = struct.field(pytree_node=False, default=False)
    progress_rate_min: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    progress_rate_max: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    init_tilt_max: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    init_omega_max: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    init_pos_jitter: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    # one-control-step actuator delay (spec'd in the reference's DR section,
    # config/config.yaml:340-349 / GUIDE fault-injection docs; static flag so
    # the no-delay path compiles away entirely)
    actuator_delay: bool = struct.field(pytree_node=False, default=False)
    # feasibility-filtered sampling (round 4): reject draws on which NO
    # controller can satisfy the strict success window. The measured
    # infeasible classes (RESULTS.md r4 suite-ceiling section) are
    # controller-independent physics: climb-away (fixed thrust exceeds
    # weight — no throttle exists, the 2 m altitude bound cannot hold),
    # friction-pinned (stiction exceeds max lateral thrust — thrust applies
    # AT the contact, zero torque authority), and equilibrium tilt
    # tan θ* = 2·T·d/(m·g_eff) beyond the success tilt limit. Training on
    # unwinnable episodes is pure noise pressure on the policy (the r3
    # cg-campaign failure mode); this keeps the TRAINING distribution
    # inside the physics ceiling while the eval suites stay official.
    # Mechanism: feasible_tries candidate draws per reset, first feasible
    # wins; if all are infeasible (prob ~0.56^8 ≈ 1 % on the suite box)
    # the episode draws the nominal plant, which is always feasible.
    feasible_only: bool = struct.field(pytree_node=False, default=False)
    feasible_tries: int = struct.field(pytree_node=False, default=8)
    # the success window's tilt limit the filter tests against (kept in
    # sync with SuccessConfig.max_tilt_angle by the schema wiring)
    feasible_tilt_limit: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.087)
    )


@struct.dataclass
class SuccessConfig:
    """SpaceX-style landing criteria (ref MissionSuccess dataclass :39-61)."""

    max_tilt_angle: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.087))
    max_angular_velocity: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.1))
    max_horizontal_velocity: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.5))
    max_vertical_velocity: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(2.0))
    min_altitude: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.2))
    max_altitude: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(2.0))
    success_duration: int = struct.field(pytree_node=False, default=100)


@struct.dataclass
class RewardConfig:
    """Multi-objective reward weights/thresholds (ref MultiObjectiveReward :73-224)."""

    mission_completion_weight: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(100.0))
    safety_compliance_weight: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(50.0))
    fuel_efficiency_weight: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(20.0))
    stability_bonus_weight: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(10.0))
    control_smoothness_weight: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(5.0))
    altitude_maintenance_weight: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(5.0))
    crash_penalty: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(-1000.0))
    excessive_tilt_threshold: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.52))
    excessive_tilt_scale: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(-500.0))
    saturation_threshold: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.9))
    saturation_scale: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(-50.0))
    gradient_penalty: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.1))
    diversity_bonus: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.05))
    clip_min: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(-1000.0))
    clip_max: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(200.0))
    target_altitude: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(3.0))
    variance_window: int = struct.field(pytree_node=False, default=10)
    # Survival-normalized success payout (static: toggling recompiles).
    # The inherited reward design DISINCENTIVIZES success: succeeding
    # terminates the episode (~283 steps, ~15k return) while hovering just
    # outside the window for all 1000 steps collects ~35-50k, so a converged
    # reward-maximizer learns to avoid the success window (RESULTS.md round 1;
    # the reference's own reward-hacking incident, GUIDE/STATE_OF_THE_ART_
    # INTEGRATION.md:5,130-134, is this same flaw). When enabled, the first
    # success step additionally pays the agent's own recent per-step reward
    # (rolling-window mean, floored at 0) × remaining episode steps — success
    # then weakly dominates edge-hovering. Default OFF = reference parity.
    survival_normalized_success: bool = struct.field(
        pytree_node=False, default=False
    )
    # Multiplier on the survival-normalized payout. The window mean is taken
    # over the LAST steps before success — the descent phase, whose per-step
    # reward is depressed vs hovering at the 3 m altitude target — so a 1.0
    # payout underpays success relative to continued edge-hovering and a
    # converged reward-maximizer under hard domain randomization reverts to
    # hover-farming (measured: nominal eval 86% → ~10% after hard-DR
    # training). >1 restores strict dominance of succeeding.
    survival_success_scale: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(1.0)
    )
    # Privileged equilibrium-relative shaping (training-only knowledge; the
    # success criterion and termination always use the true tilt). With a
    # lateral CG offset the unique hover equilibrium tilts the BODY by
    # atan(|cg_xy| / gimbal-to-CG distance); shaping the dense tilt terms
    # toward UPRIGHT therefore pulls the policy away from the only attitude
    # that can pass the strict success window (RESULTS.md r3 feasibility
    # ceiling). When enabled, the reward's tilt input is measured relative
    # to that per-episode equilibrium axis instead of world-up. Uses the
    # episode's true cg draw — privileged information, standard asymmetric
    # training practice; the POLICY never sees it.
    equilibrium_relative_shaping: bool = struct.field(
        pytree_node=False, default=False
    )


@struct.dataclass
class TerminationConfig:
    """Termination thresholds (ref _check_termination :697-721, crash at :632)."""

    # Terminate the episode when mission success is achieved (ref :703 —
    # default True = parity). False is a TRAINING-incentive mode: the
    # episode continues after success, so the success payout is purely
    # additive and succeeding strictly dominates hover-farming by
    # construction — terminating on success makes its value compete with
    # the forgone per-step income, a contest a sparse high-variance payout
    # loses under TD learning (measured: repeated convergence to
    # edge-hovering under domain randomization). Evaluation counts the
    # sticky mission_success flag either way, so the criterion is unchanged.
    terminate_on_success: bool = struct.field(pytree_node=False, default=True)
    crash_altitude: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.1))
    max_tilt: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.52))
    max_altitude: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(20.0))
    max_horizontal_distance: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(50.0))


@struct.dataclass
class EnvParams:
    """Full environment configuration (one pytree; replicate or override)."""

    rocket: RocketParams = struct.field(default_factory=RocketParams)
    randomization: RandomizationConfig = struct.field(default_factory=RandomizationConfig)
    success: SuccessConfig = struct.field(default_factory=SuccessConfig)
    reward: RewardConfig = struct.field(default_factory=RewardConfig)
    termination: TerminationConfig = struct.field(default_factory=TerminationConfig)
    max_episode_steps: int = struct.field(pytree_node=False, default=1000)
    init_pos: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([0.0, 0.0, 1.0], jnp.float32)
    )
    # Trim-observation channels (opt-in; obs grows 10 → 14). A constant
    # unknown thrust-torque bias (CG offset) is unobservable to a memoryless
    # policy and only marginally identifiable through a short history window
    # (RESULTS.md r2: cg 0.05 m → 0% success on every trained policy; the
    # dominant robustness-suite failure axis). These channels expose the
    # classic adaptive-control trim state directly: slow EMAs of the
    # PRESENTED tilt reading (noisy qx, qy — what a real estimator would
    # integrate, and the EMA also filters the sensor noise ~14×) and of the
    # commanded gimbal action (the trim currently being flown). The EMA time
    # constant 1/(1-decay) steps makes a steady-state bias directly readable.
    trim_obs_enabled: bool = struct.field(pytree_node=False, default=False)
    trim_obs_decay: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.99)
    )
    # observation scaling on the tilt-EMA pair (steady qx/qy are O(0.01));
    # the action-EMA pair is already O(0.1-1) and goes unscaled
    trim_obs_tilt_scale: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(10.0)
    )
    # integral mode (trim_observation.mode="integral"): the tilt pair becomes
    # a clipped INTEGRAL of the presented reading instead of an EMA. An EMA
    # decays back to zero once the policy trims out, erasing exactly the
    # state it was meant to carry; a clipped integrator converges to (gain ×
    # accumulated error) and HOLDS it — the classic PI trim memory for
    # constant-disturbance rejection (measured: EMA channels left CG-axis
    # robustness at 0%, RESULTS.md r3). Per-step gain is (1 - decay); the
    # clip bounds the raw integral (anti-windup).
    trim_obs_integral: bool = struct.field(pytree_node=False, default=False)
    trim_obs_clip: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.5)
    )
    # Drift-observation channels (opt-in; obs += 4, appended after any trim
    # block): scaled [vx, vy, x, y] — horizontal velocity and position
    # drift, i.e. an idealized-INS estimate (accelerometer-integrated
    # velocity, twice-integrated drift). Motivation (RESULTS.md r4 LQR
    # forensics): with thrust < double-gravity weight the success window is
    # a GROUND-balance regime, and the stabilizing controller — synthesized
    # by LQR from the true step map — is linear feedback on
    # (tilt, omega, v_xy, x_y). Position feedback is integral-of-velocity
    # feedback: it is exactly the slow integral loop that absorbs the
    # unknown CG trim. tilt/omega are already observed; v and its integral
    # are NOT representable from the 10-D obs or its short history, so no
    # memoryless-or-history-4 policy could express the working controller.
    # The channels are noise-free (a real INS velocity error is far below
    # the raw gyro noise sigma).
    drift_obs_enabled: bool = struct.field(pytree_node=False, default=False)
    drift_obs_vel_scale: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(2.0)
    )
    drift_obs_pos_scale: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.5)
    )
    # Append the previously commanded action (2 channels, already [-1, 1])
    # to the observation. See ACTION_OBS_DIM for the rationale.
    action_obs_enabled: bool = struct.field(pytree_node=False, default=False)


@struct.dataclass
class EnvState:
    """Per-environment mutable state (batch axis = many rockets)."""

    body: RigidBodyState
    fuel: jnp.ndarray            # remaining fuel fraction [0, 1]
    step_count: jnp.ndarray      # i32
    phase: jnp.ndarray           # i32, PHASE_* index
    mission_success: jnp.ndarray  # bool
    success_count: jnp.ndarray   # i32, consecutive steps with all criteria met
    prev_action: jnp.ndarray     # (2,) for control-smoothness reward
    has_prev_action: jnp.ndarray  # bool (first-step smoothness = 1.0, ref :170-179)
    reward_window: jnp.ndarray   # (variance_window,) rolling recent rewards
    reward_window_len: jnp.ndarray  # i32, #valid entries in the window
    prev_imu: jnp.ndarray | None  # (7,) last presented [quat, ω] reading,
                                 # held on sensor-dropout steps; None unless
                                 # sensor dropout is enabled (the only
                                 # consumer — keeps the carry out of the
                                 # hot path / checkpoints otherwise)
    trim: jnp.ndarray            # (4,) [ema_qx, ema_qy, ema_act×2] — the
                                 # trim-observation state (zeros when the
                                 # trim_obs_enabled gate is off)
    dr: DomainParams
    key: jnp.ndarray             # per-env PRNG key (sensor noise, next reset)


@struct.dataclass
class StepOutput:
    """Everything step() produces besides the new state."""

    obs: jnp.ndarray
    reward: jnp.ndarray
    terminated: jnp.ndarray
    truncated: jnp.ndarray
    # diagnostics (flat scalars so they stack cleanly under scan/vmap)
    altitude: jnp.ndarray
    tilt: jnp.ndarray
    angular_velocity_mag: jnp.ndarray
    fuel: jnp.ndarray
    phase: jnp.ndarray
    mission_success: jnp.ndarray
    crashed: jnp.ndarray
    reward_components: dict[str, jnp.ndarray]
