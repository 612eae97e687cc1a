"""Multi-algorithm ensemble (PPO + SAC + TD3 sharing one batched sim).

Reimplements ``MultiAlgorithmAgent`` (agent/multi_algorithm_agent.py:419-1179)
the TPU way — BASELINE config #4: all three algorithms live in ONE carry, the
simulator batch is shared, and each training iteration runs as a single
compiled program. What stays on the host is exactly what the reference kept
there: per-algorithm performance windows (deque len 100, :445-452) and the
selection policy (dynamic = argmax of last-10 mean, best = argmax of full
window, voting = performance-weighted action blend, :693-733).

Per-iteration flow (one XLA program per acting algorithm — three cached
compilations):

1. rollout ``rollout_steps`` env steps with the acting algorithm's policy
   (or the weighted blend under "voting"), writing transitions to the shared
   HBM replay ring;
2. SAC and TD3 update from replay every step (off-policy members learn from
   whoever acted);
3. when PPO acted, its on-policy segment (pre-tanh actions, log-probs,
   values) is kept and PPO does its GAE + clipped-epoch updates after the
   rollout. PPO never trains on other actors' data (the reference "trained"
   it on arbitrary batches — a bug this design removes).
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tvc_ai_tpu.agents import ppo as ppo_mod
from tvc_ai_tpu.agents import replay as replay_mod
from tvc_ai_tpu.agents import sac as sac_mod
from tvc_ai_tpu.agents import td3 as td3_mod
from tvc_ai_tpu.env import rocket_env
from tvc_ai_tpu.env.types import ACTION_DIM, OBS_DIM, EnvParams
from tvc_ai_tpu.models import distributions as dist

ALGORITHMS = ("ppo", "sac", "td3")


@dataclasses.dataclass(frozen=True)
class EnsembleConfig:
    algorithms: tuple[str, ...] = ALGORITHMS
    selection_strategy: str = "dynamic"  # dynamic | best | voting
    performance_window: int = 100
    recent_window: int = 10  # "last 10 episodes" (ref :705)
    # probability of picking a member uniformly instead of the greedy argmax
    # (0.0 = reference parity; see config.schema.EnsembleConfig rationale)
    selection_epsilon: float = 0.0
    sac: sac_mod.SACConfig = dataclasses.field(default_factory=sac_mod.SACConfig)
    td3: td3_mod.TD3Config = dataclasses.field(default_factory=td3_mod.TD3Config)
    ppo: ppo_mod.PPOConfig = dataclasses.field(default_factory=ppo_mod.PPOConfig)

    def __post_init__(self):
        object.__setattr__(self, "algorithms", tuple(self.algorithms))


@struct.dataclass
class EnsembleCarry:
    """Device-resident state for fused ensemble training."""

    env_states: Any
    obs: jnp.ndarray
    sac: sac_mod.SACState
    td3: td3_mod.TD3State
    ppo: ppo_mod.PPOState
    buffer: replay_mod.ReplayBuffer
    key: jnp.ndarray
    env_steps: jnp.ndarray   # (N,)
    episodes: jnp.ndarray    # (N,)
    successes: jnp.ndarray   # (N,)
    ep_return: jnp.ndarray   # (N,)
    return_sum: jnp.ndarray  # (N,)
    length_sum: jnp.ndarray  # (N,)
    ep_length: jnp.ndarray   # (N,)


def _policy_action(
    algo: str,
    carry: EnsembleCarry,
    obs: jnp.ndarray,
    key: jnp.ndarray,
    cfg: EnsembleConfig,
    weights: jnp.ndarray,
    deterministic: bool = False,
):
    """Action from one member or the weighted blend ("ensemble")."""
    if algo == "sac":
        return sac_mod.select_action(
            carry.sac, obs, key, cfg.sac, ACTION_DIM, deterministic
        )
    if algo == "td3":
        return td3_mod.select_action(
            carry.td3, obs, key, cfg.td3, ACTION_DIM, deterministic
        )
    if algo == "ppo":
        return ppo_mod.select_action(
            carry.ppo, obs, key, cfg.ppo, ACTION_DIM, deterministic
        )
    # voting: performance-weighted blend (ref _get_ensemble_action :812-848)
    ks = jax.random.split(key, 3)
    a_ppo = ppo_mod.select_action(
        carry.ppo, obs, ks[0], cfg.ppo, ACTION_DIM, deterministic
    )
    a_sac = sac_mod.select_action(
        carry.sac, obs, ks[1], cfg.sac, ACTION_DIM, deterministic
    )
    a_td3 = td3_mod.select_action(
        carry.td3, obs, ks[2], cfg.td3, ACTION_DIM, deterministic
    )
    w = weights / jnp.sum(weights)
    blended = w[0] * a_ppo + w[1] * a_sac + w[2] * a_td3
    return jnp.clip(blended, -1.0, 1.0)


def init_carry(
    key: jnp.ndarray, env_params: EnvParams, cfg: EnsembleConfig, num_envs: int
) -> EnsembleCarry:
    k_env, k_sac, k_td3, k_ppo, k_loop = jax.random.split(key, 5)
    env_keys = jax.random.split(k_env, num_envs)
    env_states, obs = jax.vmap(rocket_env.reset, in_axes=(0, None))(
        env_keys, env_params
    )
    example = {
        "obs": jnp.zeros(OBS_DIM, jnp.float32),
        "action": jnp.zeros(ACTION_DIM, jnp.float32),
        "reward": jnp.float32(0.0),
        "next_obs": jnp.zeros(OBS_DIM, jnp.float32),
        "done": jnp.float32(0.0),
    }
    capacity = max(
        cfg.sac.buffer_size - (cfg.sac.buffer_size % num_envs), num_envs
    )
    # distinct zero buffers per field — shared buffers break jit donation
    def zeros_f():
        return jnp.zeros(num_envs, jnp.float32)

    def zeros_i():
        return jnp.zeros(num_envs, jnp.int32)

    return EnsembleCarry(
        env_states=env_states,
        obs=obs,
        sac=sac_mod.init(k_sac, OBS_DIM, ACTION_DIM, cfg.sac),
        td3=td3_mod.init(k_td3, OBS_DIM, ACTION_DIM, cfg.td3),
        ppo=ppo_mod.init(k_ppo, OBS_DIM, ACTION_DIM, cfg.ppo),
        buffer=replay_mod.ReplayBuffer.create(capacity, example),
        key=k_loop,
        env_steps=zeros_i(),
        episodes=zeros_i(),
        successes=zeros_i(),
        ep_return=zeros_f(),
        return_sum=zeros_f(),
        length_sum=zeros_f(),
        ep_length=zeros_i(),
    )


def make_ensemble_iteration(
    actor_algo: str,
    cfg: EnsembleConfig,
    num_envs: int,
    rollout_steps: int,
    updates_per_step: int = 1,
    axis_name: str | None = None,
):
    """Fused iteration with ``actor_algo`` ∈ {ppo,sac,td3,ensemble} acting.

    Returns ``(carry, weights, env_params) -> (carry, metrics)``; ``weights``
    are the (3,) performance weights used only by the "ensemble" actor.
    """
    batched_step = jax.vmap(rocket_env.step_autoreset, in_axes=(0, 0, None))
    actor_net, value_net = ppo_mod.make_networks(OBS_DIM, ACTION_DIM, cfg.ppo)

    def env_and_learn_step(carry: EnsembleCarry, _, weights, env_params):
        key = carry.key
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        k_act, k_s1, k_u1, k_s2, k_u2, _k_next = jax.random.split(key, 6)
        (k_next,) = jax.random.split(carry.key, 1)

        # --- act
        if actor_algo == "ppo":
            mean, log_std = actor_net.apply(carry.ppo.actor_params, carry.obs)
            log_std = dist.clamp_log_std(log_std)
            noise = jax.random.normal(k_act, mean.shape)
            pre_tanh = mean + jnp.exp(log_std) * noise
            actions = jnp.tanh(pre_tanh)
            logp = dist.log_prob(mean, log_std, pre_tanh)
            value = value_net.apply(carry.ppo.value_params, carry.obs)
        else:
            actions = _policy_action(
                actor_algo, carry, carry.obs, k_act, cfg, weights
            )
            pre_tanh = jnp.zeros_like(actions)
            logp = jnp.zeros(actions.shape[0])
            value = jnp.zeros(actions.shape[0])

        env_states, out, next_obs = batched_step(
            carry.env_states, actions, env_params
        )
        buffer = replay_mod.add_batch(
            carry.buffer,
            {
                "obs": carry.obs,
                "action": actions,
                "reward": out.reward,
                "next_obs": out.obs,
                "done": out.terminated.astype(jnp.float32),
            },
        )

        # --- off-policy members learn every step
        def run_updates(args):
            sac_state, td3_state = args

            def sac_once(carry_in, _):
                st, k = carry_in
                k_s, k_u, k = jax.random.split(k, 3)
                batch = replay_mod.sample(buffer, k_s, cfg.sac.batch_size)
                st, m = sac_mod.update(
                    st, batch, k_u, cfg.sac, OBS_DIM, ACTION_DIM, axis_name
                )
                return (st, k), m

            (sac_state, _), sac_m = jax.lax.scan(
                sac_once, (sac_state, k_u1), None, length=updates_per_step
            )

            def td3_once(carry_in, _):
                st, k = carry_in
                k_s, k_u, k = jax.random.split(k, 3)
                batch = replay_mod.sample(buffer, k_s, cfg.td3.batch_size)
                st, m = td3_mod.update(
                    st, batch, k_u, cfg.td3, OBS_DIM, ACTION_DIM, axis_name
                )
                return (st, k), m

            (td3_state, _), td3_m = jax.lax.scan(
                td3_once, (td3_state, k_u2), None, length=updates_per_step
            )
            metrics = {
                "sac_critic_loss": jnp.mean(sac_m["critic_loss"]),
                "sac_actor_loss": jnp.mean(sac_m["actor_loss"]),
                "alpha": jnp.mean(sac_m["alpha"]),
                "td3_critic_loss": jnp.mean(td3_m["critic_loss"]),
                "td3_actor_loss": jnp.mean(td3_m["actor_loss"]),
            }
            if axis_name is not None:
                metrics = jax.lax.pmean(metrics, axis_name)
            return sac_state, td3_state, metrics

        def skip_updates(args):
            sac_state, td3_state = args
            zero = jnp.float32(0.0)
            return sac_state, td3_state, {
                "sac_critic_loss": zero, "sac_actor_loss": zero,
                "alpha": jnp.exp(sac_state.log_alpha),
                "td3_critic_loss": zero, "td3_actor_loss": zero,
            }

        sac_state, td3_state, upd_metrics = jax.lax.cond(
            buffer.size >= max(cfg.sac.learning_starts, cfg.sac.batch_size),
            run_updates,
            skip_updates,
            (carry.sac, carry.td3),
        )

        # --- bookkeeping
        done = out.terminated | out.truncated
        ep_return = carry.ep_return + out.reward
        ep_length = carry.ep_length + 1
        new_carry = carry.replace(
            env_states=env_states,
            obs=next_obs,
            sac=sac_state,
            td3=td3_state,
            buffer=buffer,
            key=k_next,
            env_steps=carry.env_steps + 1,
            episodes=carry.episodes + done.astype(jnp.int32),
            successes=carry.successes
            + (done & out.mission_success).astype(jnp.int32),
            return_sum=carry.return_sum + jnp.where(done, ep_return, 0.0),
            length_sum=carry.length_sum
            + jnp.where(done, ep_length.astype(jnp.float32), 0.0),
            ep_return=jnp.where(done, 0.0, ep_return),
            ep_length=jnp.where(done, 0, ep_length),
        )
        traj = {
            "obs": carry.obs,
            "pre_tanh": pre_tanh,
            "log_prob": logp,
            "value": value,
            "reward": out.reward,
            "done": out.terminated.astype(jnp.float32),
        }
        reward_mean = jnp.mean(out.reward)
        if axis_name is not None:
            reward_mean = jax.lax.pmean(reward_mean, axis_name)
        return new_carry, (traj, dict(upd_metrics, reward_mean=reward_mean))

    def iteration(carry: EnsembleCarry, weights: jnp.ndarray, env_params):
        carry, (traj, metrics) = jax.lax.scan(
            lambda c, x: env_and_learn_step(c, x, weights, env_params),
            carry,
            None,
            length=rollout_steps,
        )
        metrics = jax.tree.map(jnp.mean, metrics)

        if actor_algo == "ppo":
            last_value = value_net.apply(carry.ppo.value_params, carry.obs)
            advantages, returns = ppo_mod.compute_gae(
                traj["reward"], traj["value"], traj["done"], last_value,
                cfg.ppo.gamma, cfg.ppo.gae_lambda,
            )
            batch_size = rollout_steps * num_envs
            flat = {
                "obs": traj["obs"].reshape(batch_size, OBS_DIM),
                "pre_tanh": traj["pre_tanh"].reshape(batch_size, ACTION_DIM),
                "log_prob": traj["log_prob"].reshape(batch_size),
                "advantage": advantages.reshape(batch_size),
                "return": returns.reshape(batch_size),
            }
            mb_size = max(batch_size // cfg.ppo.num_minibatches, 1)

            def epoch(carry_in, _):
                ppo_state, key = carry_in
                key, k_perm, k_up = jax.random.split(key, 3)
                perm = jax.random.permutation(k_perm, batch_size)
                mb_idx = perm[: mb_size * cfg.ppo.num_minibatches].reshape(
                    cfg.ppo.num_minibatches, mb_size
                )

                def minibatch(c, idx):
                    st, k = c
                    mb = {k2: v[idx] for k2, v in flat.items()}
                    st, m = ppo_mod.update(
                        st, mb, cfg.ppo, k, ACTION_DIM, axis_name
                    )
                    return (st, k), m

                (ppo_state, _), m = jax.lax.scan(
                    minibatch, (ppo_state, k_up), mb_idx
                )
                return (ppo_state, key), jax.tree.map(jnp.mean, m)

            (ppo_state, _), ppo_metrics = jax.lax.scan(
                epoch, (carry.ppo, carry.key), None, length=cfg.ppo.n_epochs
            )
            carry = carry.replace(ppo=ppo_state)
            ppo_metrics = jax.tree.map(jnp.mean, ppo_metrics)
            if axis_name is not None:
                ppo_metrics = jax.lax.pmean(ppo_metrics, axis_name)
            metrics.update(
                {f"ppo_{k}": v for k, v in ppo_metrics.items()}
            )
        return carry, metrics

    return iteration


class MultiAlgorithmAgent:
    """Host orchestrator with the reference's public surface:
    ``select_algorithm`` / ``get_action`` / ``update_performance`` /
    ``save_checkpoint`` / ``load_checkpoint`` (agent/multi_algorithm_agent.py
    :419-1179), driving the fused iterations above."""

    def __init__(
        self,
        obs_dim: int = OBS_DIM,
        action_dim: int = ACTION_DIM,
        config: EnsembleConfig | None = None,
        seed: int = 0,
    ):
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.config = config or EnsembleConfig()
        self._key = jax.random.PRNGKey(seed)
        self.performance_history: dict[str, deque] = {
            a: deque(maxlen=self.config.performance_window)
            for a in self.config.algorithms
        }
        self.algorithm_weights = {a: 1.0 for a in self.config.algorithms}
        self._current_algorithm: str | None = None
        self.carry: EnsembleCarry | None = None
        self._select_fns: dict[tuple[str, bool], Any] = {}
        import random as _random

        self._rng = _random.Random(seed ^ 0x5E1EC7)  # selection-epsilon draws

    # ---------------------------------------------------------------- setup
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def attach_carry(self, carry: EnsembleCarry) -> None:
        self.carry = carry

    # ------------------------------------------------------------- selection
    def select_algorithm(self) -> str:
        """Performance-window selection (ref :693-733), plus an optional
        epsilon exploration floor (selection_epsilon > 0) so trailing
        members keep acting, refreshing their windows, and seeing their own
        data — greedy starves them (r3 measurement in the config schema)."""
        strategy = self.config.selection_strategy
        if (
            strategy != "voting"
            and self.config.selection_epsilon > 0
            and self._rng.random() < self.config.selection_epsilon
        ):
            selected = self._rng.choice(list(self.config.algorithms))
            self._current_algorithm = selected
            return selected
        if strategy == "voting":
            selected = "ensemble"
        else:
            window = (
                self.config.recent_window if strategy == "dynamic" else None
            )
            best, best_perf = None, -float("inf")
            for name, hist in self.performance_history.items():
                if len(hist) == 0:
                    continue
                vals = list(hist)[-window:] if window else list(hist)
                perf = float(np.mean(vals))
                if perf > best_perf:
                    best, best_perf = name, perf
            selected = best or "ppo"
        self._current_algorithm = selected
        return selected

    def update_performance(self, algorithm: str, episode_reward: float) -> None:
        if algorithm in self.performance_history:
            self.performance_history[algorithm].append(float(episode_reward))
        # performance-proportional weights for the voting blend
        means = {
            a: (np.mean(h) if len(h) else 0.0)
            for a, h in self.performance_history.items()
        }
        vals = np.array(list(means.values()), dtype=np.float64)
        if vals.std() > 0:
            w = np.exp((vals - vals.max()) / (vals.std() + 1e-8))
        else:
            w = np.ones_like(vals)
        for a, wi in zip(means, w / w.sum()):
            self.algorithm_weights[a] = float(wi)

    def weights_array(self) -> jnp.ndarray:
        return jnp.asarray(
            [self.algorithm_weights.get(a, 1.0) for a in ALGORITHMS],
            jnp.float32,
        )

    # ---------------------------------------------------------------- action
    def get_action(self, obs, deterministic: bool = False, algorithm=None):
        """Single/batch action + info dict (ref :736-809)."""
        assert self.carry is not None, "attach_carry() first"
        algo = algorithm or self.select_algorithm()
        obs_arr = jnp.asarray(np.asarray(obs, np.float32))
        squeeze = obs_arr.ndim == 1
        if squeeze:
            obs_arr = obs_arr[None]
        cache_key = (algo, deterministic)
        if cache_key not in self._select_fns:
            cfg = self.config

            def fn(carry, o, k, w, _algo=algo, _det=deterministic):
                return _policy_action(_algo, carry, o, k, cfg, w, _det)

            self._select_fns[cache_key] = jax.jit(fn)
        action = self._select_fns[cache_key](
            self.carry, obs_arr, self._next_key(), self.weights_array()
        )
        action = np.asarray(jnp.clip(action, -1.0, 1.0))
        if squeeze:
            action = action[0]
        return action, {"algorithm": algo}

    # ------------------------------------------------------------ checkpoint
    def save_checkpoint(self, path) -> None:
        from pathlib import Path

        from flax import serialization

        payload = {
            "carry": serialization.to_state_dict(
                self.carry.replace(env_states=None, obs=None, buffer=None)
                if self.carry
                else None
            ),
            "performance_history": {
                a: list(h) for a, h in self.performance_history.items()
            },
            "algorithm_weights": dict(self.algorithm_weights),
        }
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_bytes(serialization.msgpack_serialize(payload))

    def load_checkpoint(self, path) -> None:
        from pathlib import Path

        from flax import serialization

        payload = serialization.msgpack_restore(Path(path).read_bytes())
        if self.carry is not None and payload.get("carry"):
            stripped = self.carry.replace(env_states=None, obs=None, buffer=None)
            restored = serialization.from_state_dict(stripped, payload["carry"])
            self.carry = self.carry.replace(
                sac=restored.sac, td3=restored.td3, ppo=restored.ppo
            )
        for a, h in payload.get("performance_history", {}).items():
            self.performance_history[a] = deque(
                h, maxlen=self.config.performance_window
            )
        self.algorithm_weights.update(payload.get("algorithm_weights", {}))
