"""Ensemble trainer: PPO+SAC+TD3 on one shared batched sim.

The reference's live trainer drives ``MultiAlgorithmAgent`` per episode on a
single env (scripts/train.py:535-591); here each host iteration (a) asks the
host-side selector which algorithm acts (the reference's per-episode
``select_algorithm``, mirrored exactly), (b) runs the corresponding fused
device program for ``rollout_steps`` × N envs (SAC+TD3 learn from the shared
replay every step; PPO additionally does its on-policy epochs when it was
the actor), then (c) feeds finished-episode returns back into the
performance windows. BASELINE config #4.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path

import jax
import jax.numpy as jnp

from tvc_ai_tpu.agents import ensemble as ens
from tvc_ai_tpu.agents import ppo as ppo_mod
from tvc_ai_tpu.agents import sac as sac_mod
from tvc_ai_tpu.agents import td3 as td3_mod
from tvc_ai_tpu.config.build import build_env_params, build_sac_config
from tvc_ai_tpu.config.schema import FrameworkConfig
from tvc_ai_tpu.env.types import ACTION_DIM
from tvc_ai_tpu.eval.rollout import make_policy_eval_fn, summarize_stats
from tvc_ai_tpu.training.curriculum import CurriculumManager
from tvc_ai_tpu.training.hacking import RewardHackingDetector
from tvc_ai_tpu.utils.checkpoint import save_json
from tvc_ai_tpu.utils.logging import TrainingLogger, make_output_dir


def build_ensemble_config(cfg: FrameworkConfig) -> ens.EnsembleConfig:
    a = cfg.algorithms
    return ens.EnsembleConfig(
        algorithms=tuple(a.ensemble.algorithms),
        selection_strategy=a.ensemble.selection_strategy,
        performance_window=a.ensemble.performance_window,
        selection_epsilon=a.ensemble.selection_epsilon,
        # the FULL solo-path SAC config (an earlier inline copy dropped
        # ent_coef/auto-entropy, ema_decay, reward_scale and compute_dtype —
        # the member ran auto-alpha which exploded to 27 within 6M steps,
        # the exact precision-killer RESULTS.md r2 item 8 documents)
        sac=build_sac_config(cfg),
        td3=td3_mod.TD3Config(
            hidden_dims=tuple(a.td3.hidden_dims),
            lr=a.td3.learning_rate,
            gamma=a.td3.gamma,
            tau=a.td3.tau,
            batch_size=a.td3.batch_size,
            policy_delay=a.td3.policy_delay,
            target_policy_noise=a.td3.target_policy_noise,
            target_noise_clip=a.td3.target_noise_clip,
            exploration_noise=a.td3.exploration_noise,
        ),
        ppo=ppo_mod.PPOConfig(
            hidden_dims=tuple(a.sac.hidden_dims),
            learning_rate=a.ppo.learning_rate,
            gamma=0.99,
            gae_lambda=a.ppo.gae_lambda,
            clip_range=a.ppo.clip_range,
            ent_coef=a.ppo.ent_coef,
            vf_coef=a.ppo.vf_coef,
            max_grad_norm=a.ppo.max_grad_norm,
            n_epochs=a.ppo.n_epochs,
        ),
    )


class EnsembleTrainer:
    def __init__(
        self,
        cfg: FrameworkConfig,
        output_dir: str | Path | None = None,
        resume: str | Path | None = None,
        forced_actor: str | None = None,
    ):
        self.cfg = cfg
        self._resume_path = resume
        # pin the acting algorithm (standalone PPO/TD3 training mode);
        # off-policy members still co-train from the shared replay
        self.forced_actor = forced_actor
        self.ens_cfg = build_ensemble_config(cfg)
        self.output_dir = (
            Path(output_dir)
            if output_dir
            else make_output_dir(
                cfg.globals.output_dir, cfg.globals.experiment_name + "_ensemble"
            )
        )
        self.logger = TrainingLogger(
            self.output_dir, level=cfg.logging.level,
            tensorboard=cfg.logging.tensorboard, csv_enabled=cfg.logging.csv,
        )
        self.key = jax.random.PRNGKey(cfg.globals.seed)
        self.curriculum = CurriculumManager(cfg)
        self.hacking = RewardHackingDetector()
        self.agent = ens.MultiAlgorithmAgent(config=self.ens_cfg)
        self.env_params = build_env_params(cfg, self.curriculum.get_environment_config())
        # eval on the nominal task without randomization (reference default)
        import copy

        eval_cfg = copy.deepcopy(cfg)
        eval_cfg.env.domain_randomization.enabled = False
        eval_cfg.env.domain_randomization.sensor_noise_enabled = False
        self.eval_env_params = build_env_params(eval_cfg)

        n = cfg.training.num_envs
        t = cfg.training.rollout_steps
        # data-parallel over the device mesh when >1 device (members
        # replicated, env batch + replay sharded — like the SAC trainer)
        self.mesh = None
        if len(jax.devices()) > 1:
            from tvc_ai_tpu.parallel import mesh as mesh_mod

            n_dev = cfg.hardware.mesh_devices or len(jax.devices())
            self.mesh = mesh_mod.make_mesh(n_dev)
            init_fn, self._iterations = mesh_mod.make_sharded_ensemble_train(
                self.mesh, self.env_params, self.ens_cfg, n, t,
                cfg.training.updates_per_step,
            )
            self.carry = init_fn(self._next_key())
            self.logger.info("ensemble mesh: %d devices (data-parallel)", n_dev)
        else:
            self.carry = ens.init_carry(
                self._next_key(), self.env_params, self.ens_cfg, n
            )
            self._iterations = {
                actor: jax.jit(
                    ens.make_ensemble_iteration(
                        actor, self.ens_cfg, n, t, cfg.training.updates_per_step
                    ),
                    donate_argnums=(0,),
                )
                for actor in ("ppo", "sac", "td3", "ensemble")
            }
        self.agent.attach_carry(self.carry)
        self._eval_fns = {
            "sac": jax.jit(make_policy_eval_fn(
                lambda a, o, k: sac_mod.select_action(
                    a, o, k, self.ens_cfg.sac, ACTION_DIM, True
                ),
                cfg.training.eval_episodes,
            )),
            "td3": jax.jit(make_policy_eval_fn(
                lambda a, o, k: td3_mod.select_action(
                    a, o, k, self.ens_cfg.td3, ACTION_DIM, True
                ),
                cfg.training.eval_episodes,
            )),
            "ppo": jax.jit(make_policy_eval_fn(
                lambda a, o, k: ppo_mod.select_action(
                    a, o, k, self.ens_cfg.ppo, ACTION_DIM, True
                ),
                cfg.training.eval_episodes,
            )),
        }
        self._last_episodes = 0
        self._last_successes = 0
        self._last_return_sum = 0.0
        self.iteration = 0
        if resume is not None:
            # ensemble checkpoints are msgpack (MultiAlgorithmAgent format)
            self.agent.load_checkpoint(resume)
            self.carry = self.agent.carry
            self.logger.info("resumed ensemble members from %s", resume)

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    @property
    def env_steps(self) -> int:
        return int(jnp.sum(self.carry.env_steps))

    def train(self) -> dict:
        cfg = self.cfg.training
        steps_per_iter = cfg.num_envs * cfg.rollout_steps
        eval_every = max(cfg.eval_freq // steps_per_iter, 1)
        t_start = time.perf_counter()
        self.logger.info(
            "ensemble training: %s steps, strategy=%s",
            f"{cfg.total_timesteps:,}",
            self.ens_cfg.selection_strategy,
        )
        while self.env_steps < cfg.total_timesteps:
            actor = self.forced_actor or self.agent.select_algorithm()
            self.carry, metrics = self._iterations[actor](
                self.carry, self.agent.weights_array(), self.env_params
            )
            self.agent.attach_carry(self.carry)
            self.iteration += 1

            episodes = int(jnp.sum(self.carry.episodes))
            successes = int(jnp.sum(self.carry.successes))
            return_sum = float(jnp.sum(self.carry.return_sum))
            ep_delta = episodes - self._last_episodes
            if ep_delta > 0:
                mean_ret = (return_sum - self._last_return_sum) / ep_delta
                rate = (successes - self._last_successes) / ep_delta
                # credit the acting algorithm; a blended ("ensemble") rollout
                # credits every member (they all contributed to the action)
                credited = (
                    self.ens_cfg.algorithms if actor == "ensemble" else (actor,)
                )
                for algo in credited:
                    self.agent.update_performance(algo, mean_ret)
                self.curriculum.update(ep_delta, rate)
                self.hacking.add_episode(mean_ret, rate > 0.5, 500)
            self._last_episodes = episodes
            self._last_successes = successes
            self._last_return_sum = return_sum

            metrics = {k: float(v) for k, v in metrics.items()}
            metrics["env_steps"] = self.env_steps
            metrics["actor_is_ppo"] = float(actor == "ppo")
            self.logger.log_metrics(self.env_steps, metrics)
            if self.iteration % self.cfg.logging.log_freq_iterations == 0:
                self.logger.progress_line(
                    self.env_steps, cfg.total_timesteps,
                    {"reward_mean": metrics.get("reward_mean", 0.0),
                     "alpha": metrics.get("alpha", 0.0)},
                )
                self.logger.info("acting algorithm: %s", actor)

            if self.iteration % eval_every == 0:
                eval_metrics = self.evaluate()
                self.logger.log_metrics(self.env_steps, eval_metrics)
                self.logger.info(
                    "eval: %s",
                    {k: round(v, 3) for k, v in eval_metrics.items()
                     if k.endswith(("success_rate", "reward_mean"))},
                )

        elapsed = time.perf_counter() - t_start
        final_eval = self.evaluate()
        result = {
            "env_steps": self.env_steps,
            "wallclock_sec": elapsed,
            "steps_per_sec": self.env_steps / max(elapsed, 1e-9),
            "algorithm_weights": dict(self.agent.algorithm_weights),
            **final_eval,
        }
        save_json(self.output_dir / "final_metrics.json", result)
        self.agent.save_checkpoint(self.output_dir / "ensemble_final.msgpack")
        self.logger.close()
        return result

    def evaluate(self) -> dict[str, float]:
        """Evaluate every member's deterministic policy (one call each)."""
        out: dict[str, float] = {}
        # the SAC member evaluates its EMA (Polyak) actor when enabled —
        # the same stable estimator the solo trainer uses
        members = {
            "sac": sac_mod.eval_actor_view(
                jax.device_get(self.carry.sac), self.ens_cfg.sac
            ),
            "td3": self.carry.td3,
            "ppo": self.carry.ppo,
        }
        for name, state in members.items():
            stats = self._eval_fns[name](
                jax.device_get(state), self._next_key(), self.eval_env_params
            )
            for k, v in summarize_stats(stats).items():
                out[f"{name}_{k}"] = v
        # headline = current best member
        best = self.agent.select_algorithm()
        best = best if best in members else "sac"
        out["eval_success_rate"] = out[f"{best}_eval_success_rate"]
        out["eval_reward_mean"] = out[f"{best}_eval_reward_mean"]
        return out
