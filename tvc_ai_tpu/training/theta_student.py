"""θ-student: identify the per-episode controller instead of imitating it.

Measured motivation (RESULTS.md r4): action-space DAgger against the
per-draw CEM teacher (training/dagger.py) plateaus at ~2 % strict on the
robustness suite vs the teacher's ~11 % ceiling, with the BC loss rising
as the teacher anneals away — the labels are multimodal (distinct CEM
runs pick different winning controllers for similar plants) and the
per-step action target varies over the whole trajectory.

This module restructures the problem around two measured facts:

1. the teacher IS a linear ground-balance controller — 15 numbers, and
   the student-view-constrained oracle (``suite_feasibility --student_view``,
   dz/vz columns zeroed) scores the same ~11 %: the 10 components the
   student's own observation can express lose nothing;
2. those 10 numbers are CONSTANT within an episode and depend only on the
   plant draw — so the regression target per visited state is the episode's
   constant θ, not a per-step action.

The student is therefore an MLP from the stacked (obs, action) history to
θ̂ ∈ R¹⁰ (per-plane [x, tilt, v, ω] gains + the two trims), and the action
is computed ANALYTICALLY from θ̂ and the newest observation frame — exact
structural generalization, implicit-system-ID learning target (the RMA
recipe, Kumar et al. 2021, with the adaptation module emitting controller
parameters instead of a latent).

Reference contract this targets: the robustness/stress evaluation suites
(ref scripts/evaluate.py:338-391) and the 70-90 % disturbance-training
claim (ref GUIDE/STATE_OF_THE_ART_INTEGRATION.md:136-141).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tvc_ai_tpu.env import rocket_env
from tvc_ai_tpu.env.types import EnvParams
from tvc_ai_tpu.physics import quaternion as quat
from tvc_ai_tpu.training import cem as cem_mod
from tvc_ai_tpu.training import demos

# free components of the cem.py θ layout (see controller_action):
# yaw-plane gains on [x, tilt_x, vx, ω_y], pitch-plane gains on
# [y, tilt_y, vy, ω_x], then [trim_pitch, trim_yaw]. The dz/vz columns
# (1, 4, 7, 10) and z_eq (14) are excluded: the observation carries no
# altitude channel, and the student-view oracle shows they cost nothing.
STUDENT_THETA_IDX = (0, 2, 3, 5, 6, 8, 9, 11, 12, 13)
STUDENT_THETA_DIM = len(STUDENT_THETA_IDX)


def student_view_mask() -> jnp.ndarray:
    """(15,) mask zeroing the θ components the student cannot express."""
    mask = jnp.zeros((cem_mod.THETA_DIM,), jnp.float32)
    return mask.at[jnp.array(STUDENT_THETA_IDX)].set(1.0)


def pack_student_theta(theta_full: jnp.ndarray) -> jnp.ndarray:
    """(…, 15) masked θ → (…, 10) student components."""
    return theta_full[..., jnp.array(STUDENT_THETA_IDX)]


def unpack_student_theta(theta10: jnp.ndarray) -> jnp.ndarray:
    """(…, 10) student components → (…, 15) full θ with masked zeros."""
    out = jnp.zeros(theta10.shape[:-1] + (cem_mod.THETA_DIM,), theta10.dtype)
    return out.at[..., jnp.array(STUDENT_THETA_IDX)].set(theta10)


def theta_scale(sched: demos.LQRSchedule) -> jnp.ndarray:
    """(10,) per-component regression scales from the schedule's own gain
    spread (std over grid cells + a floor covering the CEM search σ) — the
    raw components span orders of magnitude, and an unnormalized MSE would
    spend all capacity on the largest gain."""
    grid_design = demos.LQRDesign(
        gain=sched.gain.reshape(-1, 6),
        gain_pitch=sched.gain_pitch.reshape(-1, 6),
        z_eq=sched.z_eq.reshape(-1),
        trim_slope=sched.trim_slope.reshape(-1),
        trim_slope_pitch=sched.trim_slope_pitch.reshape(-1),
    )
    theta_grid = cem_mod.theta_from_design(grid_design)
    t10 = pack_student_theta(theta_grid)
    spread = jnp.std(t10, axis=0) + 0.25 * jnp.mean(jnp.abs(t10), axis=0)
    return jnp.maximum(spread, 0.05)


def theta_hat_action(
    theta10: jnp.ndarray, frame: jnp.ndarray, params: EnvParams
) -> jnp.ndarray:
    """Analytic controller action from predicted θ̂ and the newest
    observation frame (the deployable, obs-only mirror of
    cem.controller_action — same linear form applied to the PRESENTED
    readings instead of privileged true state).

    Frame layout (requires drift+action observations, no trim channels):
    [quat(4), ω(3), fuel, phase, progress, vx·s, vy·s, x·s, y·s, a_prev(2)].
    """
    assert params.drift_obs_enabled and params.action_obs_enabled, (
        "theta-student requires the drift and action observation channels"
    )
    assert not params.trim_obs_enabled, (
        "frame layout here assumes trim channels are off"
    )
    rp = params.rocket
    q = frame[..., 0:4]
    zhat = quat.rotate(q, jnp.array([0.0, 0.0, 1.0]))
    tilt_x = jnp.arctan2(zhat[..., 0], zhat[..., 2])
    tilt_y = jnp.arctan2(-zhat[..., 1], zhat[..., 2])
    wx = frame[..., 4]
    wy = frame[..., 5]
    vx = frame[..., 10] / params.drift_obs_vel_scale
    vy = frame[..., 11] / params.drift_obs_vel_scale
    x = frame[..., 12] / params.drift_obs_pos_scale
    y = frame[..., 13] / params.drift_obs_pos_scale
    u_yaw = -(
        theta10[..., 0] * x
        + theta10[..., 1] * tilt_x
        + theta10[..., 2] * vx
        + theta10[..., 3] * wy
    )
    u_pitch = -(
        theta10[..., 4] * y
        + theta10[..., 5] * tilt_y
        + theta10[..., 6] * vy
        + theta10[..., 7] * wx
    )
    act = jnp.stack([u_pitch, u_yaw], axis=-1) / rp.max_gimbal
    act = act + theta10[..., 8:10]
    return jnp.clip(act, -1.0, 1.0)


class ThetaNet(nn.Module):
    """View → θ̂ regressor (plain MLP trunk, linear head scaled by the
    per-component θ scales so the head starts near zero ≈ schedule-nominal
    behavior once the bias learns the mean)."""

    hidden_dims: tuple = (256, 256)
    out_dim: int = STUDENT_THETA_DIM

    @nn.compact
    def __call__(self, x):
        for h in self.hidden_dims:
            x = nn.relu(nn.Dense(h)(x))
        return nn.Dense(self.out_dim)(x)


@dataclasses.dataclass(frozen=True)
class ThetaDaggerConfig:
    num_envs: int = 512
    rollout_steps: int = 512
    capacity: int = 1 << 21
    batch_size: int = 4096
    train_steps: int = 1500
    lr: float = 3e-4
    history_len: int = 8
    hidden_dims: tuple = (256, 256)


class ThetaDaggerState(NamedTuple):
    net_params: dict
    opt_state: tuple
    data_obs: jnp.ndarray     # (capacity, view_dim)
    data_theta: jnp.ndarray   # (capacity, 10)
    data_w: jnp.ndarray       # (capacity,)
    ptr: jnp.ndarray
    size: jnp.ndarray


def init_theta_state(
    key: jnp.ndarray,
    opt: optax.GradientTransformation,
    cfg: ThetaDaggerConfig,
    obs_dim: int,
) -> ThetaDaggerState:
    view_dim = obs_dim * cfg.history_len
    net = ThetaNet(hidden_dims=cfg.hidden_dims)
    params = net.init(key, jnp.zeros((1, view_dim), jnp.float32))
    return ThetaDaggerState(
        net_params=params,
        opt_state=opt.init(params),
        data_obs=jnp.zeros((cfg.capacity, view_dim), jnp.float32),
        data_theta=jnp.zeros((cfg.capacity, STUDENT_THETA_DIM), jnp.float32),
        data_w=jnp.zeros((cfg.capacity,), jnp.float32),
        ptr=jnp.int32(0),
        size=jnp.int32(0),
    )


def make_theta_dagger_iteration(
    env_params: EnvParams,
    sched: demos.LQRSchedule,
    cfg: ThetaDaggerConfig,
    obs_dim: int,
    cem_cfg: cem_mod.CEMConfig = cem_mod.CEMConfig(),
    opt: optax.GradientTransformation | None = None,
):
    """CEM-teacher θ-DAgger step: (state, key, beta) -> (state, metrics).

    Identical shape to dagger.make_cem_dagger_iteration (fresh draws →
    student-view-masked per-draw CEM → draw recycling → one β-mixed episode
    per env) except the recorded label is the episode's CONSTANT θ (10
    student components) and training regresses θ̂ with per-component scale
    normalization.
    """
    net = ThetaNet(hidden_dims=cfg.hidden_dims)
    if opt is None:
        opt = optax.adam(cfg.lr)
    n_rows = cfg.num_envs * cfg.rollout_steps
    assert cfg.capacity % n_rows == 0, (
        "capacity must be a multiple of rollout rows so ring writes never "
        "straddle the wrap"
    )
    rp = env_params.rocket
    mask = student_view_mask()
    scale = theta_scale(sched)

    def collect(state: ThetaDaggerState, key, beta):
        k_reset, k_cem, k_recycle, k_roll = jax.random.split(key, 4)
        env_keys = jax.random.split(k_reset, cfg.num_envs)
        states0, obs0 = jax.vmap(rocket_env.reset, in_axes=(0, None))(
            env_keys, env_params
        )
        theta0 = cem_mod.theta_for_states(sched, states0)
        theta, score = cem_mod.refine_per_draw(
            k_cem, env_params, states0, theta0, cem_cfg, theta_mask=mask
        )
        solved = score >= 0.5 * cem_cfg.success_bonus
        solved_frac = jnp.mean(solved.astype(jnp.float32))
        any_solved = jnp.any(solved)
        p = solved.astype(jnp.float32)
        p = jnp.where(
            any_solved,
            p / jnp.maximum(jnp.sum(p), 1.0),
            jnp.full_like(p, 1.0 / cfg.num_envs),
        )
        src = jax.random.choice(
            k_recycle, cfg.num_envs, (cfg.num_envs,), p=p
        )

        def borrow(arr):
            keep = solved.reshape(
                solved.shape + (1,) * (arr.ndim - solved.ndim)
            )
            return jnp.where(keep, arr, arr[src])

        states0 = states0.replace(dr=jax.tree.map(borrow, states0.dr))
        theta = borrow(theta)
        teacher_ok = jnp.where(
            any_solved,
            jnp.ones(cfg.num_envs, jnp.float32),
            jnp.zeros(cfg.num_envs, jnp.float32),
        )
        label10 = pack_student_theta(theta)

        window0 = jnp.tile(obs0[:, None, :], (1, cfg.history_len, 1))

        def step_fn(carry, k):
            env_states, obs, window, done = carry
            view = window.reshape(cfg.num_envs, -1)
            teacher_act = cem_mod.controller_action(
                theta, env_states.body, rp
            )
            theta_hat = net.apply(state.net_params, view)
            student_act = theta_hat_action(
                theta_hat, obs, env_params
            )
            k_mix, _ = jax.random.split(k)
            drive_teacher = jax.random.bernoulli(
                k_mix, beta, (cfg.num_envs, 1)
            )
            action = jnp.where(drive_teacher, teacher_act, student_act)
            nxt, out, next_obs = rocket_env.batched_step_autoreset(
                env_states, action, env_params, use_pallas=False
            )
            ep_done = out.terminated | out.truncated
            nxt = jax.tree.map(
                lambda new, old: jnp.where(
                    done.reshape(
                        done.shape + (1,) * (new.ndim - done.ndim)
                    ),
                    old,
                    new,
                ),
                nxt,
                env_states,
            )
            next_obs = jnp.where(done[:, None], obs, next_obs)
            shifted = jnp.concatenate(
                [window[:, 1:], next_obs[:, None, :]], axis=1
            )
            nxt_window = jnp.where(done[:, None, None], window, shifted)
            weight = teacher_ok * (1.0 - done.astype(jnp.float32))
            succ = (~done) & ep_done & out.mission_success
            return (
                (nxt, next_obs, nxt_window, done | ep_done),
                (view, weight, succ.astype(jnp.int32)),
            )

        keys = jax.random.split(k_roll, cfg.rollout_steps)
        (_, _, _, done), (views, weights, succ) = jax.lax.scan(
            step_fn,
            (states0, obs0, window0, jnp.zeros(cfg.num_envs, bool)),
            keys,
        )
        views = views.reshape(n_rows, -1)
        weights = weights.reshape(n_rows)
        # each env's rows share the episode's constant θ label
        labels = jnp.tile(label10[None, :, :], (cfg.rollout_steps, 1, 1))
        labels = labels.reshape(n_rows, STUDENT_THETA_DIM)
        data_obs = jax.lax.dynamic_update_slice(
            state.data_obs, views, (state.ptr, 0)
        )
        data_theta = jax.lax.dynamic_update_slice(
            state.data_theta, labels, (state.ptr, 0)
        )
        data_w = jax.lax.dynamic_update_slice(
            state.data_w, weights, (state.ptr,)
        )
        stats = {
            "teacher_solved": solved_frac,
            "rollout_episodes": jnp.sum(done.astype(jnp.int32)),
            "rollout_success": jnp.sum(succ),
            "labeled_rows": jnp.sum(weights),
        }
        return (
            state._replace(
                data_obs=data_obs,
                data_theta=data_theta,
                data_w=data_w,
                ptr=(state.ptr + n_rows) % cfg.capacity,
                size=jnp.minimum(state.size + n_rows, cfg.capacity),
            ),
            stats,
        )

    def train(state: ThetaDaggerState, key):
        def sgd_step(carry, k):
            params, opt_state = carry
            idx = jax.random.randint(
                k, (cfg.batch_size,), 0, jnp.maximum(state.size, 1)
            )
            ob = state.data_obs[idx]
            la = state.data_theta[idx]
            w = state.data_w[idx]

            def loss_fn(p):
                pred = net.apply(p, ob)
                err = jnp.sum(((pred - la) / scale) ** 2, axis=-1)
                return jnp.sum(w * err) / jnp.maximum(jnp.sum(w), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, cfg.train_steps)
        (params, opt_state), losses = jax.lax.scan(
            sgd_step, (state.net_params, state.opt_state), keys
        )
        return (
            state._replace(net_params=params, opt_state=opt_state),
            {"theta_loss_first": losses[0], "theta_loss_last": losses[-1]},
        )

    @jax.jit
    def iteration(state: ThetaDaggerState, key, beta):
        k_collect, k_train = jax.random.split(key)
        state, roll_stats = collect(state, k_collect, beta)
        state, train_stats = train(state, k_train)
        return state, {**roll_stats, **train_stats}

    return iteration


def make_theta_policy_fn(env_params: EnvParams, cfg: ThetaDaggerConfig):
    """Deployable policy ``(net_params, view, key) -> action`` for
    eval.rollout.make_policy_eval_fn: predict θ̂ from the stacked view,
    apply the analytic controller to the newest frame."""
    net = ThetaNet(hidden_dims=cfg.hidden_dims)

    def policy_fn(net_params, view, key):
        del key
        obs_dim = view.shape[-1] // cfg.history_len
        frame = view[..., -obs_dim:]
        theta_hat = net.apply(net_params, view)
        return theta_hat_action(theta_hat, frame, env_params)

    return policy_fn
