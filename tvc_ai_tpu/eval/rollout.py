"""Batched deterministic evaluation — N episodes as one XLA program.

The reference evaluates by looping Python episodes one at a time
(scripts/train.py:645-700, scripts/evaluate.py:235-309). Here all episodes
run simultaneously as a vmapped batch scanned to the horizon with
done-freezing, so a 20-episode eval costs one device call. Per-episode
statistics (return, length, success, crash, max tilt, mean control effort,
final altitude) are returned as arrays; suite-level aggregation (means,
percentiles) happens host-side in ``eval.evaluate``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tvc_ai_tpu.agents import sac as sac_mod
from tvc_ai_tpu.env import rocket_env
from tvc_ai_tpu.env.types import EnvParams


class EpisodeStats(NamedTuple):
    returns: jnp.ndarray        # (E,)
    lengths: jnp.ndarray        # (E,) i32
    success: jnp.ndarray        # (E,) bool
    crashed: jnp.ndarray        # (E,) bool
    max_tilt: jnp.ndarray       # (E,) rad
    max_angular_velocity: jnp.ndarray  # (E,)
    mean_effort: jnp.ndarray    # (E,)
    final_altitude: jnp.ndarray  # (E,)
    fuel_used: jnp.ndarray      # (E,)


def make_policy_eval_fn(policy_fn, num_episodes: int, history_len: int = 1):
    """Build jittable ``(agent_state, key, env_params) -> EpisodeStats`` for an
    arbitrary deterministic policy ``policy_fn(agent, obs, key) -> actions``.

    ``history_len`` > 1 feeds the policy a flattened [oldest..newest] window
    of observations (matching ``training.loop``'s history conditioning) —
    episodes never auto-reset here, so the window only shifts.
    """

    batched_step = jax.vmap(rocket_env.step, in_axes=(0, 0, None))

    def eval_fn(agent, key, env_params: EnvParams) -> EpisodeStats:
        k_reset, k_act = jax.random.split(key)
        keys = jax.random.split(k_reset, num_episodes)
        states, obs = jax.vmap(rocket_env.reset, in_axes=(0, None))(
            keys, env_params
        )
        if history_len > 1:
            obs = jnp.tile(obs[:, None, :], (1, history_len, 1))
        zero = jnp.zeros(num_episodes, jnp.float32)
        init = (
            states, obs,
            jnp.zeros(num_episodes, bool),   # done
            zero,                            # return
            jnp.zeros(num_episodes, jnp.int32),  # length
            jnp.zeros(num_episodes, bool),   # success
            jnp.zeros(num_episodes, bool),   # crashed
            zero,                            # max tilt
            zero,                            # max |ω|
            zero,                            # effort sum
            zero,                            # final altitude
        )

        def step_fn(carry, _):
            (states, obs, done, ret, length, success, crashed,
             max_tilt, max_w, effort_sum, final_alt) = carry
            policy_view = (
                obs.reshape(num_episodes, -1) if history_len > 1 else obs
            )
            actions = policy_fn(agent, policy_view, k_act)
            new_states, out = batched_step(states, actions, env_params)
            live = ~done
            ret = ret + jnp.where(live, out.reward, 0.0)
            length = length + live.astype(jnp.int32)
            success = success | (live & out.mission_success)
            crashed = crashed | (live & out.crashed)
            max_tilt = jnp.maximum(max_tilt, jnp.where(live, out.tilt, 0.0))
            max_w = jnp.maximum(
                max_w, jnp.where(live, out.angular_velocity_mag, 0.0)
            )
            effort_sum = effort_sum + jnp.where(
                live, jnp.linalg.norm(actions, axis=-1), 0.0
            )
            final_alt = jnp.where(live, out.altitude, final_alt)
            new_done = done | out.terminated | out.truncated
            # freeze finished episodes (carry old state where done)
            states = jax.tree.map(
                lambda new, old: jnp.where(
                    jnp.reshape(
                        done, done.shape + (1,) * (jnp.ndim(new) - 1)
                    ),
                    old,
                    new,
                ),
                new_states,
                states,
            )
            if history_len > 1:
                shifted = jnp.concatenate(
                    [obs[:, 1:], out.obs[:, None, :]], axis=1
                )
                obs = jnp.where(done[:, None, None], obs, shifted)
            else:
                obs = jnp.where(done[:, None], obs, out.obs)
            return (
                states, obs, new_done, ret, length, success, crashed,
                max_tilt, max_w, effort_sum, final_alt,
            ), None

        (states, obs, done, ret, length, success, crashed, max_tilt, max_w,
         effort_sum, final_alt), _ = jax.lax.scan(
            step_fn, init, None, length=env_params.max_episode_steps
        )
        return EpisodeStats(
            returns=ret,
            lengths=length,
            success=success,
            crashed=crashed,
            max_tilt=max_tilt,
            max_angular_velocity=max_w,
            mean_effort=effort_sum / jnp.maximum(length.astype(jnp.float32), 1.0),
            final_altitude=final_alt,
            fuel_used=1.0 - states.fuel,
        )

    return eval_fn


def make_eval_fn(
    sac_cfg: sac_mod.SACConfig,
    num_episodes: int,
    action_dim: int = 2,
    obs_dim: int | None = None,
    history_len: int = 1,
):
    """SAC-policy specialization of ``make_policy_eval_fn``.

    ``obs_dim`` truncates the env's 10-D observation for agents trained on
    the legacy 8-D [quat, ω, fuel] layout (SURVEY §0.1) — the first 8 dims
    are identical across generations. ``history_len`` must match the value
    the agent was trained with; with history the truncation applies PER
    FRAME (the policy view is the flattened (E, H·obs_dim) window, so a
    trailing slice would grab the first obs_dim dims of the stacked window
    instead).
    """
    def policy_fn(agent, obs, key):
        if obs_dim is not None:
            if history_len > 1:
                # frame size inferred (-1): env frames can be 10 or 14 (trim)
                frames = obs.reshape(obs.shape[0], history_len, -1)
                obs = frames[..., :obs_dim].reshape(obs.shape[0], -1)
            else:
                obs = obs[..., :obs_dim]
        return sac_mod.select_action(
            agent, obs, key, sac_cfg, action_dim, deterministic=True
        )

    return make_policy_eval_fn(policy_fn, num_episodes, history_len=history_len)


def make_hier_eval_fn(
    sac_cfg: sac_mod.SACConfig,
    hier_cfg,
    num_episodes: int,
    action_dim: int = 2,
    history_len: int = 1,
):
    """Hierarchical-mode evaluation: per-step deterministic (argmax) goal
    selection — the reference's per-call ``select_goal``
    (agent/multi_algorithm_agent.py:751-753) made deterministic — feeding the
    goal-conditioned SAC low level. ``agent`` is ``(sac_state, high_state)``.
    """
    import jax.nn

    from tvc_ai_tpu.models import hierarchical as hier_mod

    def policy_fn(agent, obs, key):
        sac_state, high_state = agent
        # newest frame of the flattened window (frame size inferred: 10 or 14)
        frame = (
            obs.reshape(obs.shape[0], history_len, -1)[:, -1, :]
            if history_len > 1
            else obs
        )
        goal = hier_mod.sample_goal(
            high_state, frame, key, hier_cfg, deterministic=True
        )
        onehot = jax.nn.one_hot(goal, hier_cfg.num_goals, dtype=obs.dtype)
        policy_view = jnp.concatenate([obs, onehot], axis=-1)
        return sac_mod.select_action(
            sac_state, policy_view, key, sac_cfg, action_dim, deterministic=True
        )

    return make_policy_eval_fn(policy_fn, num_episodes, history_len=history_len)


def make_trajectory_fn(
    sac_cfg: sac_mod.SACConfig,
    num_episodes: int,
    action_dim: int = 2,
    obs_dim: int | None = None,
    history_len: int = 1,
):
    """Jittable full-trajectory recorder (ref evaluate.py's optional
    per-episode trajectory capture, scripts/evaluate.py:235-309): returns
    ``(agent, key, env_params) -> dict`` of (T, E)-shaped time series
    [altitude, tilt, angular_velocity, reward, live] plus (T, E, A) actions.
    Memory: T×E×~7 floats — fine for suite-sized episode counts."""

    batched_step = jax.vmap(rocket_env.step, in_axes=(0, 0, None))

    def policy_fn(agent, obs, key):
        view = obs
        if obs_dim is not None:
            if history_len > 1:  # truncate per frame (see make_eval_fn)
                frames = view.reshape(view.shape[0], history_len, -1)
                view = frames[..., :obs_dim].reshape(view.shape[0], -1)
            else:
                view = view[..., :obs_dim]
        return sac_mod.select_action(
            agent, view, key, sac_cfg, action_dim, deterministic=True
        )

    def traj_fn(agent, key, env_params: EnvParams):
        k_reset, k_act = jax.random.split(key)
        keys = jax.random.split(k_reset, num_episodes)
        states, obs = jax.vmap(rocket_env.reset, in_axes=(0, None))(
            keys, env_params
        )
        if history_len > 1:
            obs = jnp.tile(obs[:, None, :], (1, history_len, 1))
        done0 = jnp.zeros(num_episodes, bool)

        def step_fn(carry, _):
            states, obs, done = carry
            view = obs.reshape(num_episodes, -1) if history_len > 1 else obs
            actions = policy_fn(agent, view, k_act)
            new_states, out = batched_step(states, actions, env_params)
            record = {
                "altitude": out.altitude,
                "tilt": out.tilt,
                "angular_velocity": out.angular_velocity_mag,
                "reward": out.reward,
                "live": (~done).astype(jnp.float32),
                "action": actions,
            }
            new_done = done | out.terminated | out.truncated
            states = jax.tree.map(
                lambda new, old: jnp.where(
                    jnp.reshape(done, done.shape + (1,) * (jnp.ndim(new) - 1)),
                    old, new,
                ),
                new_states, states,
            )
            if history_len > 1:
                shifted = jnp.concatenate([obs[:, 1:], out.obs[:, None, :]], axis=1)
                obs = jnp.where(done[:, None, None], obs, shifted)
            else:
                obs = jnp.where(done[:, None], obs, out.obs)
            return (states, obs, new_done), record

        _, series = jax.lax.scan(
            step_fn, (states, obs, done0), None,
            length=env_params.max_episode_steps,
        )
        return series

    return traj_fn


def plot_trajectories(series: dict, path, max_episodes: int = 8) -> None:
    """4-panel per-episode trajectory figure (ref trajectory plots,
    scripts/evaluate.py:394-539): altitude, tilt, |ω|, and gimbal commands
    over time; finished-episode tails are masked out."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    live = np.asarray(series["live"])  # (T, E)
    T, E = live.shape
    n = min(max_episodes, E)
    t = np.arange(T) * 0.02  # 50 Hz control steps → seconds
    fig, axes = plt.subplots(2, 2, figsize=(14, 8))

    def masked(name, ep):
        vals = np.asarray(series[name])[:, ep].astype(float)
        m = live[:, ep] > 0.5
        vals[~m] = np.nan
        return vals

    for ep in range(n):
        axes[0, 0].plot(t, masked("altitude", ep), alpha=0.7, lw=1)
        axes[0, 1].plot(t, np.degrees(masked("tilt", ep)), alpha=0.7, lw=1)
        axes[1, 0].plot(t, masked("angular_velocity", ep), alpha=0.7, lw=1)
    axes[0, 0].set_title(f"Altitude (m) — first {n} episodes")
    axes[0, 1].set_title("Tilt (deg)")
    axes[0, 1].axhline(30, color="k", ls="--", lw=0.8, label="termination 30°")
    axes[0, 1].legend()
    axes[1, 0].set_title("|ω| (rad/s)")
    acts = np.asarray(series["action"])[:, 0, :]
    m0 = live[:, 0] > 0.5
    acts = np.where(m0[:, None], acts, np.nan)
    axes[1, 1].plot(t, acts[:, 0], label="gimbal pitch", lw=1)
    axes[1, 1].plot(t, acts[:, 1], label="gimbal yaw", lw=1)
    axes[1, 1].set_title("Actions (episode 0)")
    axes[1, 1].set_ylim(-1.05, 1.05)
    axes[1, 1].legend()
    for ax in axes.flat:
        ax.grid(alpha=0.3)
        ax.set_xlabel("t (s)")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def summarize_stats(stats: EpisodeStats) -> dict[str, float]:
    """Host-side aggregation with the reference's percentile set
    (scripts/evaluate.py:75-116: p25/p50/p75/p90/p95)."""
    import numpy as np

    returns = np.asarray(stats.returns)
    out = {
        "eval_reward_mean": float(returns.mean()),
        "eval_reward_std": float(returns.std()),
        "eval_success_rate": float(np.asarray(stats.success).mean()),
        "eval_crash_rate": float(np.asarray(stats.crashed).mean()),
        "eval_length_mean": float(np.asarray(stats.lengths).mean()),
        "eval_max_tilt_mean": float(np.asarray(stats.max_tilt).mean()),
        "eval_max_angular_velocity_mean": float(
            np.asarray(stats.max_angular_velocity).mean()
        ),
        "eval_effort_mean": float(np.asarray(stats.mean_effort).mean()),
        "eval_fuel_used_mean": float(np.asarray(stats.fuel_used).mean()),
    }
    for p in (25, 50, 75, 90, 95):
        out[f"eval_reward_p{p}"] = float(np.percentile(returns, p))
    # the reference's own (weaker) success criterion
    # (scripts/evaluate.py:290-292): tilt stayed under 20°, episode outlived
    # 200 steps, ended above 0.5 m — max_tilt is a conservative stand-in for
    # its final-tilt check
    legacy = (
        (np.asarray(stats.max_tilt) < np.radians(20.0))
        & (np.asarray(stats.lengths) > 200)
        & (np.asarray(stats.final_altitude) >= 0.5)
    )
    out["eval_legacy_success_rate"] = float(legacy.mean())
    return out
