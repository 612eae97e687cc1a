"""Per-draw controller refinement by batched CEM on the TPU simulator.

The gain-scheduled LQR (``training/demos.py``) is near the physics ceiling
on the (mass, thrust) axes but collapses when the suite's cg-offset and
wind draws combine with an off-nominal plant (measured r4:
``scripts/suite_feasibility.py --scheduled`` → 0.6 % on feasible
robustness draws). Rather than hand-deriving wind/cg feedforward terms for
every corner of the 6-D draw box, this module *searches* the 14-parameter
linear-controller space per draw with the cross-entropy method, using the
batched simulator itself as the objective:

- the controller class is the measured r4 mechanism (per-plane linear
  state feedback + constant trim — position feedback IS the integral
  action that absorbs unknown constant torques, RESULTS.md r4);
- the objective is the TRUE strict-success criterion (longest consecutive
  in-window streak, via the env's own ``success_count``) — no
  differentiable surrogate, no BPTT through the stiff regularized-Coulomb
  contact (slope ~1700/s at stick makes unrolled gradients useless);
- everything is one jitted program: (draws × population) controllers roll
  in parallel, `lax.fori_loop` over CEM generations. A 256-draw × 32-pop
  × 500-step × 15-generation refinement is ~60M env steps — seconds on
  one chip.

Two consumers:

1. **Empirical feasibility oracle** (``scripts/suite_feasibility.py
   --cem``): "does ANY linear ground-balance controller win this exact
   suite episode?" — per-draw existence, a measured lower bound on each
   suite's attainable ceiling that replaces the r3 analytic estimate.
2. **DAgger teacher** (``scripts/dagger_distill.py``): the refined
   per-draw parameters define full feedback policies, valid on any state
   the student visits under that draw.

Reference contract this serves: the robustness/stress evaluation suites
(ref scripts/evaluate.py:338-391) and the 70-90 % disturbance-training
claim (ref GUIDE/STATE_OF_THE_ART_INTEGRATION.md:136-141).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tvc_ai_tpu.env import rocket_env
from tvc_ai_tpu.env.types import EnvParams, EnvState
from tvc_ai_tpu.physics import quaternion as quat
from tvc_ai_tpu.physics.types import RocketParams
from tvc_ai_tpu.training.demos import LQRDesign, LQRSchedule, interp_design

# theta layout: [gain_yaw(6), gain_pitch(6), trim_pitch, trim_yaw, z_eq]
THETA_DIM = 15


class CEMConfig(NamedTuple):
    pop: int = 32               # candidates per draw per generation
    elites: int = 8
    generations: int = 15
    horizon: int = 500          # rollout steps (window needs 100 in-window)
    sigma_gain: float = 0.25    # initial σ, relative to |init gain| (+floor)
    sigma_gain_floor: float = 0.05
    sigma_trim: float = 0.05    # initial σ on trim, action units
    sigma_floor: float = 1e-3   # σ never collapses below this
    streak_weight: float = 1.0  # score per in-window streak step
    success_bonus: float = 1000.0
    tilt_shaping: float = 10.0  # subtracts mean tilt (rad) × this
    # survival term (score per live step, default off). The tilt shaping
    # averages over LIVE steps only, so with zero streak a controller that
    # crashes instantly at low tilt outscores one that survives with
    # drifting tilt — harmless inside CEM refinement (elites have streaks)
    # but exactly backwards for the pilot's library SELECTION, where
    # "no member succeeds in the model" must resolve to the longest
    # survivor, not the fastest crasher.
    alive_weight: float = 0.0
    # execution-noise modeling (default off = the r4 in-model oracle).
    # When > 0, the controller inside rollout_score is fed a NOISY copy of
    # quat/ω (σ per channel, matching the suite's IMU sensor noise) while
    # the plant itself stays exact — the deployment condition. The r4
    # measurement that forced this: CEM-refined θ scoring ~11 % in-model
    # collapse to ~0.8 % when EXECUTED through the robustness suite's
    # σ=0.02 readings, even with the true draw and true state handed to
    # the planner — clean-feedback refinement selects knife-edge gains.
    obs_noise_std: float = 0.0
    # canonicalization: subtract anchor_weight·‖θ−θ0‖² from the score so
    # near-tie winners resolve toward the schedule init. Distinct CEM runs
    # then label similar plants with similar controllers — without this the
    # DAgger student regresses onto whichever of many equally-winning
    # controllers each iteration's search happened to find (multimodal
    # labels, irreducible BC loss). Zero preserves the pure oracle.
    anchor_weight: float = 0.0


def theta_from_design(design: LQRDesign) -> jnp.ndarray:
    """Pack an (optionally batched) LQRDesign into θ rows (..., 15):
    [gain_yaw(6), gain_pitch(6), trim_pitch, trim_yaw, z_eq]. z_eq rides
    along so every candidate regulates altitude error about its own
    plant's standing equilibrium (and CEM may fine-tune it)."""
    zeros = jnp.zeros(design.gain.shape[:-1] + (1,), design.gain.dtype)
    z = jnp.broadcast_to(design.z_eq[..., None], zeros.shape)
    return jnp.concatenate(
        [design.gain, design.gain_pitch, zeros, zeros, z], axis=-1
    )


def controller_action(
    theta: jnp.ndarray,
    body,
    rp: RocketParams,
) -> jnp.ndarray:
    """Linear ground-balance action from θ (batched; mirrors
    demos.lqr_action with d_known = 0 plus a learned constant trim)."""
    zhat = quat.rotate(body.quat, jnp.array([0.0, 0.0, 1.0]))
    theta_x = jnp.arctan2(zhat[..., 0], zhat[..., 2])
    phi = jnp.arctan2(-zhat[..., 1], zhat[..., 2])
    dz = body.pos[..., 2] - theta[..., 14]
    sx = jnp.stack(
        [body.pos[..., 0], dz, theta_x,
         body.vel[..., 0], body.vel[..., 2], body.omega[..., 1]], axis=-1
    )
    sy = jnp.stack(
        [body.pos[..., 1], dz, phi,
         body.vel[..., 1], body.vel[..., 2], body.omega[..., 0]], axis=-1
    )
    u_yaw = -jnp.sum(theta[..., 0:6] * sx, axis=-1)
    u_pitch = -jnp.sum(theta[..., 6:12] * sy, axis=-1)
    act = jnp.stack([u_pitch, u_yaw], axis=-1) / rp.max_gimbal
    act = act + theta[..., 12:14]
    return jnp.clip(act, -1.0, 1.0)


def rollout_score(
    theta: jnp.ndarray,
    states0: EnvState,
    params: EnvParams,
    cfg: CEMConfig,
    key: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Score each (row) controller on its (row) env draw: best in-window
    streak + success bonus − tilt shaping. Episodes freeze at their first
    termination (no autoreset — one draw, one episode, one score).
    With ``cfg.obs_noise_std > 0`` the controller sees IMU-noisy quat/ω
    (``key`` seeds the noise; defaults to PRNGKey(0))."""
    rp = params.rocket
    noisy = cfg.obs_noise_std > 0.0
    key0 = key if key is not None else jax.random.PRNGKey(0)

    def step_fn(carry, _):
        st, done, succ, best_streak, tilt_sum, steps, k = carry
        ctrl_body = st.body
        if noisy:
            k, kq, kw = jax.random.split(k, 3)
            ctrl_body = ctrl_body.replace(
                quat=quat.normalize(
                    ctrl_body.quat
                    + cfg.obs_noise_std
                    * jax.random.normal(kq, ctrl_body.quat.shape)
                ),
                omega=ctrl_body.omega
                + cfg.obs_noise_std
                * jax.random.normal(kw, ctrl_body.omega.shape),
            )
        act = controller_action(theta, ctrl_body, rp)
        nxt, out, _ = rocket_env.batched_step_autoreset(
            st, act, params, use_pallas=False
        )
        ep_done = out.terminated | out.truncated
        # capture success from the step OUTPUT: mission success terminates
        # the episode, and on that very step the autoreset has already
        # replaced the state (with mission_success cleared) — reading the
        # frozen final state would never see it
        succ = succ | (~done & out.mission_success)
        # freeze the carry once the (single) episode ends
        nxt = jax.tree.map(
            lambda new, old: jnp.where(
                done.reshape(done.shape + (1,) * (new.ndim - done.ndim)),
                old, new),
            nxt, st,
        )
        best_streak = jnp.maximum(
            best_streak, jnp.where(done, 0, nxt.success_count)
        )
        tilt_sum = tilt_sum + jnp.where(done, 0.0, out.tilt)
        steps = steps + jnp.where(done, 0, 1)
        return (
            nxt, done | ep_done, succ, best_streak, tilt_sum, steps, k
        ), None

    n = theta.shape[0]
    init = (
        states0,
        jnp.zeros(n, bool),
        jnp.zeros(n, bool),
        jnp.zeros(n, jnp.int32),
        jnp.zeros(n, jnp.float32),
        jnp.zeros(n, jnp.int32),
        key0,
    )
    (_, _, success, best_streak, tilt_sum, steps, _), _ = jax.lax.scan(
        step_fn, init, None, length=cfg.horizon
    )
    mean_tilt = tilt_sum / jnp.maximum(steps, 1)
    return (
        cfg.success_bonus * success.astype(jnp.float32)
        + cfg.streak_weight * best_streak.astype(jnp.float32)
        + cfg.alive_weight * steps.astype(jnp.float32)
        - cfg.tilt_shaping * mean_tilt
    )


def _replicate(tree, pop: int):
    """states (d, ...) → (d·pop, ...) by repeating each draw pop times."""
    return jax.tree.map(
        lambda x: jnp.repeat(x, pop, axis=0) if x is not None else None,
        tree,
    )


def refine_per_draw(
    key: jnp.ndarray,
    params: EnvParams,
    states0: EnvState,
    theta0: jnp.ndarray,
    cfg: CEMConfig = CEMConfig(),
    theta_mask: jnp.ndarray | None = None,
    freeze_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """CEM-refine one controller per draw.

    states0: batched EnvState (one env per draw, DR params already drawn).
    theta0:  (draws, 15) initial means (e.g. theta_from_design of the
             interpolated schedule).
    theta_mask: optional (15,) 0/1 mask applied to every candidate —
             restricts the search to a controller subspace (e.g. zeroing
             the dz/vz gain columns measures the ceiling of a controller
             that only sees what the blind student's observation carries).
    freeze_mask: optional (15,) 0/1 mask; components with 1 are PINNED to
             theta0 in every candidate (search only the rest — e.g.
             freezing all gains measures how much of the per-draw
             adaptation is carried by the two trim components alone).
    Returns (theta_best (draws, 15), score_best (draws,)) — best-ever
    candidate per draw across all generations (elitist).
    """
    draws = theta0.shape[0]
    pop = cfg.pop
    rep_states = _replicate(states0, pop)
    if theta_mask is not None:
        theta0 = theta0 * theta_mask

    sigma0 = jnp.concatenate(
        [
            jnp.abs(theta0[:, :12]) * cfg.sigma_gain + cfg.sigma_gain_floor,
            jnp.full((draws, 2), cfg.sigma_trim, theta0.dtype),
            jnp.full((draws, 1), 0.002, theta0.dtype),  # z_eq: ±mm scale
        ],
        axis=-1,
    )

    def generation(i, carry):
        mean, sigma, best_theta, best_score, key = carry
        key, k_noise, k_obs = jax.random.split(key, 3)
        noise = jax.random.normal(k_noise, (draws, pop, THETA_DIM))
        # candidate 0 is the current mean (elitist re-evaluation not
        # needed: best-ever tracking keeps the true best)
        noise = noise.at[:, 0, :].set(0.0)
        cand = mean[:, None, :] + sigma[:, None, :] * noise
        if theta_mask is not None:
            cand = cand * theta_mask
        if freeze_mask is not None:
            cand = jnp.where(
                freeze_mask.astype(bool), theta0[:, None, :], cand
            )
        scores = rollout_score(
            cand.reshape(draws * pop, THETA_DIM), rep_states, params, cfg,
            key=k_obs,
        ).reshape(draws, pop)
        if cfg.anchor_weight > 0.0:
            scores = scores - cfg.anchor_weight * jnp.sum(
                (cand - theta0[:, None, :]) ** 2, axis=-1
            )
        # elite update
        elite_idx = jnp.argsort(-scores, axis=1)[:, : cfg.elites]
        elite = jnp.take_along_axis(
            cand, elite_idx[..., None], axis=1
        )  # (draws, elites, 14)
        mean = elite.mean(1)
        sigma = jnp.maximum(elite.std(1), cfg.sigma_floor)
        # best-ever per draw
        gen_best = scores.argmax(1)
        gen_best_score = scores[jnp.arange(draws), gen_best]
        gen_best_theta = cand[jnp.arange(draws), gen_best]
        improved = gen_best_score > best_score
        best_score = jnp.where(improved, gen_best_score, best_score)
        best_theta = jnp.where(improved[:, None], gen_best_theta, best_theta)
        return mean, sigma, best_theta, best_score, key

    init = (
        theta0,
        sigma0,
        theta0,
        jnp.full((draws,), -jnp.inf, jnp.float32),
        key,
    )
    _, _, best_theta, best_score, _ = jax.lax.fori_loop(
        0, cfg.generations, generation, init
    )
    return best_theta, best_score


def theta_for_states(
    sched: LQRSchedule,
    states: EnvState,
) -> jnp.ndarray:
    """Schedule-interpolated initial θ for a batch of drawn envs."""
    design = interp_design(sched, states.dr.mass, states.dr.thrust_scale)
    return theta_from_design(design)
