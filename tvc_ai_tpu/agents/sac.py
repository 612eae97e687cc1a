"""Soft Actor-Critic — the north-star algorithm, as pure JAX functions.

Restores the *real* SAC the reference's legacy API promised (SURVEY §0.1:
``SACConfig``/``SACAgent`` with replay buffer, learning_starts, automatic
entropy tuning with target entropy −action_dim) rather than the live path's
degenerate batch-of-1 update with fixed α
(agent/multi_algorithm_agent.py:950-1016). Algorithmic constants match the
reference where both define them: γ=0.99, τ=0.005 soft target updates,
clipped double-Q targets.

Everything is a pure function over ``SACState`` so the update fuses with the
batched simulator into one XLA program (``training.loop``) and shards with
``pjit`` (params replicated, batch sharded, gradients psum-reduced).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tvc_ai_tpu.models import distributions as dist
from tvc_ai_tpu.models.mlp import GaussianActor, TwinQ


@dataclasses.dataclass(frozen=True)
class SACConfig:
    """Static hyperparameters (hashable → usable as a jit static arg).

    Field set mirrors the legacy ``SACConfig`` the reference's eval/HPO
    construct (scripts/evaluate.py:168-182, scripts/tune_hyperparameters.py:65-75).
    """

    hidden_dims: tuple[int, ...] = (256, 256)
    lr_actor: float = 3e-4
    lr_critic: float = 3e-4
    lr_alpha: float = 3e-4
    gamma: float = 0.99
    tau: float = 0.005
    alpha: float = 0.2
    automatic_entropy_tuning: bool = True
    target_entropy: float | None = None  # defaults to -action_dim
    batch_size: int = 256
    buffer_size: int = 1_000_000
    learning_starts: int = 1000
    gradient_clip_norm: float = 10.0
    action_noise: float = 0.0
    curriculum_learning: bool = False
    # TD-target reward scaling (SAC is scale-sensitive; this env's returns
    # reach thousands). Applied inside update() only — logged rewards stay raw.
    reward_scale: float = 1.0
    # training-stability wiring (utils/training_stability.py capabilities,
    # actually applied here unlike the reference — SURVEY §2.5)
    lr_schedule: str = "constant"  # constant|linear|exponential|cosine|warmup_cosine
    schedule_total_steps: int = 2_000_000
    warmup_steps: int = 10_000
    initial_lr_factor: float = 0.1
    adaptive_tau: bool = False
    tau_min: float = 0.001
    tau_max: float = 0.01
    tau_decay: float = 0.999
    # Polyak-averaged (EMA) shadow actor for evaluation/deployment (0 = off):
    # at training LR the live policy crosses the success knife edge between
    # adjacent evals (RESULTS.md r2); the EMA actor is a stable estimator of
    # the policy the optimizer is orbiting. Updated every gradient step:
    # ema ← ema·d + θ·(1−d).
    ema_decay: float = 0.0
    # compute dtype of the hidden matmul stack: "float32" (default) or
    # "bfloat16" (MXU-native; params stay fp32, output heads stay fp32)
    compute_dtype: str = "float32"
    # Q-filtered behavior cloning on demonstration samples (SACfD/TD3+BC
    # style): when > 0 and the batch carries a "demo_mask", the actor loss
    # adds bc_weight * MSE(tanh(mu(s)), a_demo) over demo entries whose
    # stored action the current critic scores HIGHER than the policy's own
    # (the Q-filter keeps the teacher from dragging the policy down where
    # the policy has surpassed it). Measured rationale (RESULTS.md r4): demo
    # transitions in replay alone moved the critic but not the actor — at
    # 34M steps the policy was 100% nominal and ~2% on the cg distribution
    # its persistent demo buffer demonstrates at ~50% success.
    bc_weight: float = 0.0
    # policy architecture: "mlp" (default) or "transformer" — the reference's
    # flagship TransformerPolicyNetwork (network.architecture_type in its
    # config); critics stay MLP in both cases (ref SAC member :592-612)
    architecture: str = "mlp"
    transformer_d_model: int = 256
    transformer_layers: int = 4
    transformer_heads: int = 8

    def __post_init__(self):
        # legacy call sites pass hidden_dims as a list
        # (tests/test_agent.py:49, scripts/tune_hyperparameters.py:65-75);
        # normalize so the config stays hashable for jit static args
        object.__setattr__(self, "hidden_dims", tuple(self.hidden_dims))

    def resolved_target_entropy(self, action_dim: int) -> float:
        return (
            float(self.target_entropy)
            if self.target_entropy is not None
            else -float(action_dim)
        )


@struct.dataclass
class SACState:
    """All learnable state — one pytree, donate-able, orbax-checkpointable."""

    actor_params: Any
    critic_params: Any
    target_critic_params: Any
    log_alpha: jnp.ndarray
    actor_opt: Any
    critic_opt: Any
    alpha_opt: Any
    step: jnp.ndarray  # i32 update counter
    # EMA shadow of actor_params (None when cfg.ema_decay == 0); read it
    # through eval_actor_view()
    ema_actor_params: Any = None


def _optim(lr: float, cfg: "SACConfig") -> optax.GradientTransformation:
    if cfg.lr_schedule == "constant":
        schedule: optax.ScalarOrSchedule = lr
    elif cfg.lr_schedule == "linear":
        schedule = optax.linear_schedule(lr, 0.0, cfg.schedule_total_steps)
    elif cfg.lr_schedule == "exponential":
        schedule = optax.exponential_decay(
            lr, max(cfg.schedule_total_steps // 10, 1), 0.5, staircase=True
        )
    elif cfg.lr_schedule == "cosine":
        schedule = optax.cosine_decay_schedule(lr, cfg.schedule_total_steps)
    elif cfg.lr_schedule == "warmup_cosine":
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=lr * cfg.initial_lr_factor,
            peak_value=lr,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(cfg.schedule_total_steps, cfg.warmup_steps + 1),
        )
    else:
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
    return optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip_norm), optax.adam(schedule)
    )


def effective_tau(cfg: "SACConfig", update_step: jnp.ndarray) -> jnp.ndarray:
    """τ, optionally decaying τ_max → τ_min per update (ref stability :55-58)."""
    if not cfg.adaptive_tau:
        return jnp.float32(cfg.tau)
    return jnp.maximum(
        cfg.tau_min,
        cfg.tau_max * cfg.tau_decay ** update_step.astype(jnp.float32),
    )


def make_networks(obs_dim: int, action_dim: int, cfg: SACConfig):
    dtype = (
        jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    )
    if cfg.architecture == "transformer":
        from tvc_ai_tpu.models.transformer import TransformerActor

        actor = TransformerActor(
            action_dim=action_dim,
            d_model=cfg.transformer_d_model,
            num_layers=cfg.transformer_layers,
            num_heads=cfg.transformer_heads,
        )
    else:
        actor = GaussianActor(
            action_dim=action_dim, hidden_dims=cfg.hidden_dims, dtype=dtype
        )
    critic = TwinQ(hidden_dims=cfg.hidden_dims, dtype=dtype)
    return actor, critic


def init(key: jnp.ndarray, obs_dim: int, action_dim: int, cfg: SACConfig) -> SACState:
    actor, critic = make_networks(obs_dim, action_dim, cfg)
    k_actor, k_critic = jax.random.split(key)
    dummy_obs = jnp.zeros((1, obs_dim), jnp.float32)
    dummy_act = jnp.zeros((1, action_dim), jnp.float32)
    actor_params = actor.init(k_actor, dummy_obs)
    critic_params = critic.init(k_critic, dummy_obs, dummy_act)
    log_alpha = jnp.asarray(jnp.log(cfg.alpha), jnp.float32)
    return SACState(
        actor_params=actor_params,
        critic_params=critic_params,
        target_critic_params=jax.tree.map(jnp.copy, critic_params),
        log_alpha=log_alpha,
        actor_opt=_optim(cfg.lr_actor, cfg).init(actor_params),
        critic_opt=_optim(cfg.lr_critic, cfg).init(critic_params),
        alpha_opt=optax.adam(cfg.lr_alpha).init(log_alpha),
        step=jnp.int32(0),
        ema_actor_params=(
            jax.tree.map(jnp.copy, actor_params) if cfg.ema_decay > 0 else None
        ),
    )


def eval_actor_view(state: SACState, cfg: SACConfig) -> SACState:
    """The state to evaluate/export: EMA actor when enabled, else the live one."""
    if cfg.ema_decay > 0 and state.ema_actor_params is not None:
        return state.replace(actor_params=state.ema_actor_params)
    return state


def select_action(
    state: SACState,
    obs: jnp.ndarray,
    key: jnp.ndarray,
    cfg: SACConfig,
    action_dim: int,
    deterministic: bool = False,
) -> jnp.ndarray:
    """Policy action in [-1, 1]; works on single obs or batches."""
    actor, _ = make_networks(obs.shape[-1], action_dim, cfg)
    mean, log_std = actor.apply(state.actor_params, obs)
    if deterministic:
        return dist.deterministic_action(mean)
    action, _ = dist.sample_and_log_prob(key, mean, log_std)
    return action


def update(
    state: SACState,
    batch: dict[str, jnp.ndarray],
    key: jnp.ndarray,
    cfg: SACConfig,
    obs_dim: int,
    action_dim: int,
    axis_name: str | None = None,
) -> tuple[SACState, dict[str, jnp.ndarray]]:
    """One SAC gradient step on a sampled batch.

    batch keys: obs, action, reward, next_obs, done (float 0/1 — terminated
    only, truncation bootstraps). ``axis_name`` psum-averages gradients for
    data-parallel pjit/shard_map training.
    """
    actor, critic = make_networks(obs_dim, action_dim, cfg)
    k_next, k_pi = jax.random.split(key)
    alpha = jnp.exp(state.log_alpha)
    target_entropy = cfg.resolved_target_entropy(action_dim)

    def maybe_pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name is not None else x

    # ---- critic: clipped double-Q target (ref SAC member :964-996)
    next_mean, next_log_std = actor.apply(state.actor_params, batch["next_obs"])
    next_action, next_logp = dist.sample_and_log_prob(k_next, next_mean, next_log_std)
    tq1, tq2 = critic.apply(state.target_critic_params, batch["next_obs"], next_action)
    target_v = jnp.minimum(tq1, tq2) - alpha * next_logp
    target_q = (
        batch["reward"] * cfg.reward_scale
        + cfg.gamma * (1.0 - batch["done"]) * target_v
    )
    target_q = jax.lax.stop_gradient(target_q)

    def critic_loss_fn(params):
        q1, q2 = critic.apply(params, batch["obs"], batch["action"])
        loss = jnp.mean((q1 - target_q) ** 2) + jnp.mean((q2 - target_q) ** 2)
        return loss, (jnp.mean(q1), jnp.mean(q2))

    (critic_loss, (q1_mean, q2_mean)), critic_grads = jax.value_and_grad(
        critic_loss_fn, has_aux=True
    )(state.critic_params)
    critic_grads = maybe_pmean(critic_grads)
    c_updates, critic_opt = _optim(cfg.lr_critic, cfg).update(
        critic_grads, state.critic_opt, state.critic_params
    )
    critic_params = optax.apply_updates(state.critic_params, c_updates)

    # ---- actor: reparameterized policy gradient (+ optional Q-filtered BC
    #      toward demonstration actions; see SACConfig.bc_weight)
    use_bc = cfg.bc_weight > 0 and "demo_mask" in batch

    def actor_loss_fn(params):
        mean, log_std = actor.apply(params, batch["obs"])
        action, logp = dist.sample_and_log_prob(k_pi, mean, log_std)
        q1, q2 = critic.apply(critic_params, batch["obs"], action)
        q = jnp.minimum(q1, q2)
        loss = jnp.mean(alpha * logp - q)
        bc_loss = jnp.float32(0.0)
        if use_bc:
            dq1, dq2 = critic.apply(
                critic_params, batch["obs"], batch["action"]
            )
            better = jnp.minimum(dq1, dq2) > q
            gate = batch["demo_mask"] * jax.lax.stop_gradient(
                better.astype(jnp.float32)
            )
            mu = jnp.tanh(mean)
            per = jnp.mean((mu - batch["action"]) ** 2, axis=-1)
            bc_loss = jnp.sum(gate * per) / jnp.maximum(jnp.sum(gate), 1.0)
            # scale-free weighting (TD3+BC): the policy-gradient term is
            # O(|Q|) (thousands here), the BC term O(1) — normalize by the
            # batch's |Q| so bc_weight is a dimensionless ~1-5 knob
            q_scale = jax.lax.stop_gradient(jnp.mean(jnp.abs(q))) + 1e-6
            loss = loss + cfg.bc_weight * q_scale * bc_loss
        return loss, (logp, bc_loss)

    (actor_loss, (logp, bc_loss)), actor_grads = jax.value_and_grad(
        actor_loss_fn, has_aux=True
    )(state.actor_params)
    actor_grads = maybe_pmean(actor_grads)
    a_updates, actor_opt = _optim(cfg.lr_actor, cfg).update(
        actor_grads, state.actor_opt, state.actor_params
    )
    actor_params = optax.apply_updates(state.actor_params, a_updates)

    # ---- temperature (automatic entropy tuning; legacy contract
    #      tests/test_agent.py:220-242 requires α>0 after training)
    if cfg.automatic_entropy_tuning:
        def alpha_loss_fn(log_alpha):
            return -jnp.mean(
                jnp.exp(log_alpha) * jax.lax.stop_gradient(logp + target_entropy)
            )

        alpha_loss, alpha_grad = jax.value_and_grad(alpha_loss_fn)(state.log_alpha)
        alpha_grad = maybe_pmean(alpha_grad)
        al_updates, alpha_opt = optax.adam(cfg.lr_alpha).update(
            alpha_grad, state.alpha_opt, state.log_alpha
        )
        log_alpha = optax.apply_updates(state.log_alpha, al_updates)
    else:
        alpha_loss = jnp.float32(0.0)
        alpha_opt = state.alpha_opt
        log_alpha = state.log_alpha

    # ---- soft target update, τ=0.005 (ref :1004-1009), optionally adaptive
    tau = effective_tau(cfg, state.step)
    target_critic_params = jax.tree.map(
        lambda t, o: t * (1.0 - tau) + o * tau,
        state.target_critic_params,
        critic_params,
    )

    # ---- EMA shadow actor (static-gated; see SACConfig.ema_decay)
    ema_actor_params = state.ema_actor_params
    if cfg.ema_decay > 0 and ema_actor_params is not None:
        d = jnp.float32(cfg.ema_decay)
        ema_actor_params = jax.tree.map(
            lambda e, p: e * d + p * (1.0 - d), ema_actor_params, actor_params
        )

    new_state = SACState(
        actor_params=actor_params,
        critic_params=critic_params,
        target_critic_params=target_critic_params,
        log_alpha=log_alpha,
        actor_opt=actor_opt,
        critic_opt=critic_opt,
        alpha_opt=alpha_opt,
        step=state.step + 1,
        ema_actor_params=ema_actor_params,
    )
    metrics = {
        "critic_loss": critic_loss,
        "actor_loss": actor_loss,
        "alpha_loss": alpha_loss,
        "alpha": jnp.exp(log_alpha),
        "q1_mean": q1_mean,
        "q2_mean": q2_mean,
        "entropy": -jnp.mean(logp),
    }
    if use_bc:
        metrics["bc_loss"] = bc_loss
    return new_state, metrics
