"""DAgger distillation: privileged gain-scheduled LQR teacher → blind student.

Measured motivation (RESULTS.md r4):

- Offline imitation is not enough. The r4 replay-seeded + Q-filtered-BC
  campaign drove bc_loss to ~1e-3 on the demonstration distribution yet
  scored 0 % at cg 0.025 for 90M steps: the student matches the teacher on
  the TEACHER's state distribution while compounding error drives it off
  that distribution within an episode (the plant is marginally stable, so
  0.03 RMS action error is enough to diverge). DAgger closes the loop by
  labeling the STUDENT's own visited states with the teacher's action
  (Ross et al. 2011) — the regression target lives exactly where the
  student actually goes.

- A fixed controller is not enough either. The nominal-plant blind LQR
  scores 100 % under 3 N wind, ~77 % under mass ±30 % or thrust ±20 %
  ALONE, but 3 % on the full robustness suite (scripts/suite_feasibility
  + the per-axis ablation): off-nominal (mass, thrust) draws move the
  standing equilibrium and the thrust-to-weight ratio the gains assume.
  The teacher here is therefore the gain-SCHEDULED LQR
  (training/demos.py::design_lqr_schedule) — privileged, reading each
  episode's true mass/thrust draw — and the student is blind, inferring
  those parameters from a stacked (obs, action) history window
  (env/types.py ACTION_OBS_DIM). This is the RMA / teacher-student
  recipe (Kumar et al. 2021) in its simplest DAgger form.

TPU shape: one DAgger iteration = two fused XLA programs — a `lax.scan`
rollout that steps `num_envs` environments and records (view, label)
pairs into a device-resident ring dataset, and a `lax.scan` over Adam
minibatches regressing tanh(mu(view)) onto the teacher's action. No host
transfer except the scalar metrics.

The reference has no demonstration/distillation pipeline; this implements
the robust-flight capability its guides claim but never reach
(ref GUIDE/STATE_OF_THE_ART_INTEGRATION.md:136-141, scripts/evaluate.py:338-391).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from tvc_ai_tpu.agents import sac as sac_mod
from tvc_ai_tpu.env import rocket_env
from tvc_ai_tpu.env.types import EnvParams
from tvc_ai_tpu.training import cem as cem_mod
from tvc_ai_tpu.training import demos


@dataclasses.dataclass(frozen=True)
class DaggerConfig:
    num_envs: int = 512
    rollout_steps: int = 512          # env steps recorded per iteration
    capacity: int = 1 << 20           # aggregate ring dataset (pairs)
    batch_size: int = 4096
    train_steps: int = 1500           # Adam minibatches per iteration
    lr: float = 3e-4
    history_len: int = 1


class DaggerState(NamedTuple):
    actor_params: dict
    opt_state: tuple
    data_obs: jnp.ndarray      # (capacity, view_dim)
    data_act: jnp.ndarray      # (capacity, act_dim)
    ptr: jnp.ndarray           # i32 ring write pointer
    size: jnp.ndarray          # i32 valid rows
    env_states: rocket_env.EnvState
    obs: jnp.ndarray           # (num_envs, obs_dim) current observation
    window: jnp.ndarray | None  # (num_envs, history, obs_dim) when history>1


def init_state(
    key: jnp.ndarray,
    env_params: EnvParams,
    actor_params: dict,
    opt: optax.GradientTransformation,
    cfg: DaggerConfig,
    obs_dim: int,
    act_dim: int,
) -> DaggerState:
    env_keys = jax.random.split(key, cfg.num_envs)
    states, obs = jax.vmap(rocket_env.reset, in_axes=(0, None))(
        env_keys, env_params
    )
    window = None
    view_dim = obs_dim * cfg.history_len
    if cfg.history_len > 1:
        window = jnp.tile(obs[:, None, :], (1, cfg.history_len, 1))
    return DaggerState(
        actor_params=actor_params,
        opt_state=opt.init(actor_params),
        data_obs=jnp.zeros((cfg.capacity, view_dim), jnp.float32),
        data_act=jnp.zeros((cfg.capacity, act_dim), jnp.float32),
        ptr=jnp.int32(0),
        size=jnp.int32(0),
        env_states=states,
        obs=obs,
        window=window,
    )


def make_dagger_iteration(
    env_params: EnvParams,
    teacher_fn: Callable[[rocket_env.EnvState], jnp.ndarray],
    sac_cfg: sac_mod.SACConfig,
    cfg: DaggerConfig,
    obs_dim: int,
    act_dim: int,
    opt: optax.GradientTransformation | None = None,
):
    """Build the jitted (state, key, beta) -> (state, metrics) DAgger step.

    ``teacher_fn`` maps the batched EnvState to expert actions in [-1, 1]
    (e.g. the scheduled LQR reading ``state.dr``). ``beta`` is the
    probability that the TEACHER's action drives the env this iteration
    (per env-step Bernoulli): start at 1.0 (pure behavior cloning of the
    teacher's distribution), anneal toward 0.0 (pure student rollouts,
    teacher only labels).
    """
    actor, _ = sac_mod.make_networks(
        obs_dim * cfg.history_len, act_dim, sac_cfg
    )
    if opt is None:
        opt = optax.adam(cfg.lr)
    n_rows = cfg.num_envs * cfg.rollout_steps
    assert cfg.capacity % n_rows == 0, (
        "capacity must be a multiple of rollout rows so ring writes never "
        "straddle the wrap"
    )

    def collect(state: DaggerState, key, beta):
        def step_fn(carry, k):
            env_states, obs, window = carry
            view = (
                window.reshape(cfg.num_envs, -1)
                if window is not None
                else obs
            )
            label = teacher_fn(env_states)
            mean, _ = actor.apply(state.actor_params, view)
            student = jnp.tanh(mean)
            k_mix, k_step = jax.random.split(k)
            drive_teacher = jax.random.bernoulli(
                k_mix, beta, (cfg.num_envs, 1)
            )
            action = jnp.where(drive_teacher, label, student)
            nxt, out, next_obs = rocket_env.batched_step_autoreset(
                env_states, action, env_params, use_pallas=False
            )
            if window is not None:
                done = (out.terminated | out.truncated)[:, None, None]
                shifted = jnp.concatenate(
                    [window[:, 1:], out.obs[:, None, :]], axis=1
                )
                fresh = jnp.tile(
                    next_obs[:, None, :], (1, cfg.history_len, 1)
                )
                nxt_window = jnp.where(done, fresh, shifted)
            else:
                nxt_window = None
            ep_done = (out.terminated | out.truncated).astype(jnp.int32)
            ep_succ = (
                (out.terminated | out.truncated) & out.mission_success
            ).astype(jnp.int32)
            return (nxt, next_obs, nxt_window), (view, label, ep_done, ep_succ)

        keys = jax.random.split(key, cfg.rollout_steps)
        (env_states, obs, window), (views, labels, ep_done, ep_succ) = (
            jax.lax.scan(
                step_fn, (state.env_states, state.obs, state.window), keys
            )
        )
        views = views.reshape(n_rows, -1)
        labels = labels.reshape(n_rows, -1)
        data_obs = jax.lax.dynamic_update_slice(
            state.data_obs, views, (state.ptr, 0)
        )
        data_act = jax.lax.dynamic_update_slice(
            state.data_act, labels, (state.ptr, 0)
        )
        stats = {
            "rollout_episodes": jnp.sum(ep_done),
            "rollout_success": jnp.sum(ep_succ),
        }
        return (
            state._replace(
                data_obs=data_obs,
                data_act=data_act,
                ptr=(state.ptr + n_rows) % cfg.capacity,
                size=jnp.minimum(state.size + n_rows, cfg.capacity),
                env_states=env_states,
                obs=obs,
                window=window,
            ),
            stats,
        )

    def train(state: DaggerState, key):
        def sgd_step(carry, k):
            params, opt_state = carry
            idx = jax.random.randint(
                k, (cfg.batch_size,), 0, jnp.maximum(state.size, 1)
            )
            ob = state.data_obs[idx]
            la = state.data_act[idx]

            def loss_fn(p):
                mean, _ = actor.apply(p, ob)
                return jnp.mean((jnp.tanh(mean) - la) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, cfg.train_steps)
        (params, opt_state), losses = jax.lax.scan(
            sgd_step, (state.actor_params, state.opt_state), keys
        )
        return (
            state._replace(actor_params=params, opt_state=opt_state),
            {"bc_loss_first": losses[0], "bc_loss_last": losses[-1]},
        )

    @jax.jit
    def iteration(state: DaggerState, key, beta):
        k_collect, k_train = jax.random.split(key)
        state, roll_stats = collect(state, k_collect, beta)
        state, train_stats = train(state, k_train)
        return state, {**roll_stats, **train_stats}

    return iteration


class CemDaggerState(NamedTuple):
    """Ring dataset + student for the CEM-teacher DAgger variant. No
    persistent envs: every iteration draws a fresh plant batch, solves it,
    and rolls full episodes from reset."""

    actor_params: dict
    opt_state: tuple
    data_obs: jnp.ndarray      # (capacity, view_dim)
    data_act: jnp.ndarray      # (capacity, act_dim)
    data_w: jnp.ndarray        # (capacity,) label weight (0 = invalid row)
    ptr: jnp.ndarray
    size: jnp.ndarray


def init_cem_state(
    actor_params: dict,
    opt: optax.GradientTransformation,
    cfg: DaggerConfig,
    obs_dim: int,
    act_dim: int,
) -> CemDaggerState:
    view_dim = obs_dim * cfg.history_len
    return CemDaggerState(
        actor_params=actor_params,
        opt_state=opt.init(actor_params),
        data_obs=jnp.zeros((cfg.capacity, view_dim), jnp.float32),
        data_act=jnp.zeros((cfg.capacity, act_dim), jnp.float32),
        data_w=jnp.zeros((cfg.capacity,), jnp.float32),
        ptr=jnp.int32(0),
        size=jnp.int32(0),
    )


def make_cem_dagger_iteration(
    env_params: EnvParams,
    sched: demos.LQRSchedule,
    sac_cfg: sac_mod.SACConfig,
    cfg: DaggerConfig,
    obs_dim: int,
    act_dim: int,
    cem_cfg: cem_mod.CEMConfig = cem_mod.CEMConfig(),
    opt: optax.GradientTransformation | None = None,
):
    """CEM-teacher DAgger step: (state, key, beta) -> (state, metrics).

    Per iteration:
    1. reset ``num_envs`` fresh environments (fresh DR draws);
    2. CEM-solve each draw from the schedule init (training/cem.py) — the
       per-draw linear controller is the teacher for that env;
    3. roll ONE episode per env (no autoreset; frozen after done),
       beta-mixing teacher/student actions, labeling every visited state
       with the teacher's feedback action;
    4. weighted BC on the aggregated ring — rows from draws the teacher
       itself failed (CEM score below the success bonus) get weight 0:
       a failed teacher's labels are noise, and the draw is usually
       physically infeasible anyway (suite_feasibility r4).
    """
    actor, _ = sac_mod.make_networks(
        obs_dim * cfg.history_len, act_dim, sac_cfg
    )
    if opt is None:
        opt = optax.adam(cfg.lr)
    n_rows = cfg.num_envs * cfg.rollout_steps
    assert cfg.capacity % n_rows == 0, (
        "capacity must be a multiple of rollout rows so ring writes never "
        "straddle the wrap"
    )
    rp = env_params.rocket

    def collect(state: CemDaggerState, key, beta):
        k_reset, k_cem, k_recycle, k_roll = jax.random.split(key, 4)
        env_keys = jax.random.split(k_reset, cfg.num_envs)
        states0, obs0 = jax.vmap(rocket_env.reset, in_axes=(0, None))(
            env_keys, env_params
        )
        theta0 = cem_mod.theta_for_states(sched, states0)
        theta, score = cem_mod.refine_per_draw(
            k_cem, env_params, states0, theta0, cem_cfg
        )
        solved = score >= 0.5 * cem_cfg.success_bonus
        solved_frac = jnp.mean(solved.astype(jnp.float32))
        # draw recycling: rows from draws the teacher failed are pure
        # waste (weight 0), and only ~5-13% of suite draws are solvable —
        # so envs with an unsolved draw borrow a solved draw's plant AND
        # its controller, making ~every recorded row a labeled one. The
        # student trains exclusively on the solvable sub-distribution;
        # nothing is learnable on the rest anyway.
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

        window0 = (
            jnp.tile(obs0[:, None, :], (1, cfg.history_len, 1))
            if cfg.history_len > 1
            else None
        )

        def step_fn(carry, k):
            env_states, obs, window, done = carry
            view = (
                window.reshape(cfg.num_envs, -1)
                if window is not None
                else obs
            )
            label = cem_mod.controller_action(theta, env_states.body, rp)
            mean, _ = actor.apply(state.actor_params, view)
            student = jnp.tanh(mean)
            k_mix, _ = jax.random.split(k)
            drive_teacher = jax.random.bernoulli(
                k_mix, beta, (cfg.num_envs, 1)
            )
            action = jnp.where(drive_teacher, label, student)
            nxt, out, next_obs = rocket_env.batched_step_autoreset(
                env_states, action, env_params, use_pallas=False
            )
            ep_done = out.terminated | out.truncated
            # freeze finished episodes (their autoreset state is a NEW
            # draw the solved theta knows nothing about)
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
            if window is not None:
                shifted = jnp.concatenate(
                    [window[:, 1:], next_obs[:, None, :]], axis=1
                )
                nxt_window = jnp.where(done[:, None, None], window, shifted)
            else:
                nxt_window = None
            weight = teacher_ok * (1.0 - done.astype(jnp.float32))
            succ = (~done) & ep_done & out.mission_success
            return (
                (nxt, next_obs, nxt_window, done | ep_done),
                (view, label, weight, succ.astype(jnp.int32)),
            )

        keys = jax.random.split(k_roll, cfg.rollout_steps)
        (_, _, _, done), (views, labels, weights, succ) = jax.lax.scan(
            step_fn,
            (states0, obs0, window0, jnp.zeros(cfg.num_envs, bool)),
            keys,
        )
        views = views.reshape(n_rows, -1)
        labels = labels.reshape(n_rows, -1)
        weights = weights.reshape(n_rows)
        data_obs = jax.lax.dynamic_update_slice(
            state.data_obs, views, (state.ptr, 0)
        )
        data_act = jax.lax.dynamic_update_slice(
            state.data_act, labels, (state.ptr, 0)
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
                data_act=data_act,
                data_w=data_w,
                ptr=(state.ptr + n_rows) % cfg.capacity,
                size=jnp.minimum(state.size + n_rows, cfg.capacity),
            ),
            stats,
        )

    def train(state: CemDaggerState, key):
        def sgd_step(carry, k):
            params, opt_state = carry
            idx = jax.random.randint(
                k, (cfg.batch_size,), 0, jnp.maximum(state.size, 1)
            )
            ob = state.data_obs[idx]
            la = state.data_act[idx]
            w = state.data_w[idx]

            def loss_fn(p):
                mean, _ = actor.apply(p, ob)
                err = jnp.sum((jnp.tanh(mean) - la) ** 2, axis=-1)
                return jnp.sum(w * err) / jnp.maximum(jnp.sum(w), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, cfg.train_steps)
        (params, opt_state), losses = jax.lax.scan(
            sgd_step, (state.actor_params, state.opt_state), keys
        )
        return (
            state._replace(actor_params=params, opt_state=opt_state),
            {"bc_loss_first": losses[0], "bc_loss_last": losses[-1]},
        )

    @jax.jit
    def iteration(state: CemDaggerState, key, beta):
        k_collect, k_train = jax.random.split(key)
        state, roll_stats = collect(state, k_collect, beta)
        state, train_stats = train(state, k_train)
        return state, {**roll_stats, **train_stats}

    return iteration
