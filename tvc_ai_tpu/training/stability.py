"""Training-stability toolkit — LR schedules, adaptive τ, plasticity, primacy.

Reimplements utils/training_stability.py's capabilities, but functional and
actually wired into the trainer (the reference initialized the manager and
never called ``step()``, SURVEY §2.5). Constants mirror StabilityConfig
(utils/training_stability.py:33-73).

Design split:
- *schedules* are pure functions of the update step → folded into optax at
  build time (no per-step host work);
- *interventions* (primacy reset, dormant-neuron reinit) are jitted pure
  param transforms the trainer applies at interval boundaries;
- the host-side ``TrainingStabilityManager`` only decides WHEN.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax


@dataclass(frozen=True)
class StabilityConfig:
    enable_lr_scheduling: bool = True
    scheduler_type: str = "warmup_cosine"  # linear|exponential|cosine|warmup_cosine|plateau
    initial_lr_factor: float = 0.1
    warmup_steps: int = 10_000
    decay_factor: float = 0.5
    plateau_patience: int = 20_000

    enable_plasticity_preservation: bool = True
    dormant_threshold: float = 0.01
    dormant_check_interval: int = 5_000
    reinit_dormant_ratio: float = 0.1

    enable_primacy_mitigation: bool = True
    reset_interval: int = 50_000
    reset_ratio: float = 0.05

    adaptive_tau: bool = True
    tau_min: float = 0.001
    tau_max: float = 0.01
    tau_decay: float = 0.999

    hacking_stop_threshold: float = 0.9


def make_lr_schedule(
    cfg: StabilityConfig, base_lr: float, total_steps: int
) -> optax.Schedule:
    """Optax schedule mirroring LearningRateScheduler (ref :94-163)."""
    if not cfg.enable_lr_scheduling:
        return optax.constant_schedule(base_lr)
    t = cfg.scheduler_type
    if t == "linear":
        return optax.linear_schedule(base_lr, 0.0, total_steps)
    if t == "exponential":
        decay_steps = max(total_steps // 10, 1)
        return optax.exponential_decay(
            base_lr, decay_steps, cfg.decay_factor, staircase=True
        )
    if t == "cosine":
        return optax.cosine_decay_schedule(base_lr, total_steps)
    if t == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=base_lr * cfg.initial_lr_factor,
            peak_value=base_lr,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(total_steps, cfg.warmup_steps + 1),
        )
    if t == "plateau":
        # plateau needs a metric; handled host-side via scale_by_trust host knob —
        # approximate with a staircase decay at the patience interval
        return optax.exponential_decay(
            base_lr, cfg.plateau_patience, cfg.decay_factor, staircase=True
        )
    raise ValueError(f"unknown scheduler_type {t!r}")


def adaptive_tau(cfg: StabilityConfig, update_step: jnp.ndarray) -> jnp.ndarray:
    """τ decays τ_max → τ_min by ``tau_decay`` per update (ref :55-58)."""
    if not cfg.adaptive_tau:
        return jnp.float32(cfg.tau_min)
    return jnp.maximum(
        cfg.tau_min, cfg.tau_max * cfg.tau_decay ** update_step.astype(jnp.float32)
    )


def primacy_reset(
    params: Any, initial_params: Any, key: jnp.ndarray, ratio: float
) -> Any:
    """Reset a random ``ratio`` of weights to their initial values.

    The reference resets 5 % every 50k updates (PrimacyBiasMitigator,
    ref :248-286) to shed early-training bias; here it is one jitted
    tree_map with per-leaf bernoulli masks.
    """
    leaves, treedef = jax.tree.flatten(params)
    init_leaves = jax.tree.leaves(initial_params)
    keys = jax.random.split(key, len(leaves))
    out = []
    for leaf, init, k in zip(leaves, init_leaves, keys):
        mask = jax.random.bernoulli(k, ratio, leaf.shape)
        out.append(jnp.where(mask, init, leaf))
    return jax.tree.unflatten(treedef, out)


def dormant_neuron_fraction(
    apply_fn, params: Any, probe_obs: jnp.ndarray, threshold: float
) -> jnp.ndarray:
    """Fraction of first-hidden-layer units with mean |activation| < threshold.

    A functional stand-in for the reference's forward-hook telemetry
    (PlasticityPreserver.track_activations, ref :183-221): probe the network
    on a batch and measure per-unit activity directly.
    """
    dense0 = params["params"]["hidden_0"]
    pre = probe_obs @ dense0["kernel"] + dense0["bias"]
    act = jnp.abs(jax.nn.relu(pre)).mean(axis=0)
    return jnp.mean((act < threshold).astype(jnp.float32))


def reinit_dormant_units(
    apply_fn,
    params: Any,
    probe_obs: jnp.ndarray,
    key: jnp.ndarray,
    threshold: float,
    max_ratio: float,
) -> Any:
    """Reinitialize incoming weights of dormant first-layer units.

    Branch-free: a dormant mask scales fresh orthogonal-ish init into the
    kernel columns of units whose probe activity is below threshold, capped
    at ``max_ratio`` of units per invocation.
    """
    if "hidden_0" not in params.get("params", {}):
        # dormant-unit surgery targets the MLP trunk's first Dense layer;
        # other architectures (transformer policy) have no such layer —
        # no-op rather than guessing at module internals
        return params
    dense0 = params["params"]["hidden_0"]
    kernel, bias = dense0["kernel"], dense0["bias"]
    pre = probe_obs @ kernel + bias
    act = jnp.abs(jax.nn.relu(pre)).mean(axis=0)
    order = jnp.argsort(act)  # most dormant first
    n_max = int(kernel.shape[1] * max_ratio)
    rank = jnp.empty_like(order).at[order].set(jnp.arange(order.shape[0]))
    dormant = (act < threshold) & (rank < n_max)
    fresh = jax.random.normal(key, kernel.shape) * jnp.sqrt(2.0 / kernel.shape[0])
    new_kernel = jnp.where(dormant[None, :], fresh, kernel)
    new_bias = jnp.where(dormant, 0.0, bias)
    new_params = jax.tree.map(lambda x: x, params)  # shallow copy of the dict tree
    new_params["params"]["hidden_0"] = {"kernel": new_kernel, "bias": new_bias}
    return new_params


class TrainingStabilityManager:
    """Host-side cadence controller for the interventions above."""

    def __init__(self, cfg: StabilityConfig, total_steps: int):
        self.cfg = cfg
        self.total_steps = total_steps
        self.update_count = 0
        self._initial_params = None
        self._last_primacy = 0
        self._last_dormant = 0

    def register_initial_params(self, params: Any) -> None:
        self._initial_params = jax.tree.map(jnp.copy, params)

    def step(self, n_updates: int = 1) -> None:
        self.update_count += int(n_updates)

    def due_primacy_reset(self) -> bool:
        if not self.cfg.enable_primacy_mitigation or self._initial_params is None:
            return False
        if self.update_count - self._last_primacy >= self.cfg.reset_interval:
            self._last_primacy = self.update_count
            return True
        return False

    def due_dormant_check(self) -> bool:
        if not self.cfg.enable_plasticity_preservation:
            return False
        if self.update_count - self._last_dormant >= self.cfg.dormant_check_interval:
            self._last_dormant = self.update_count
            return True
        return False

    def apply_primacy_reset(self, params: Any, key: jnp.ndarray) -> Any:
        return primacy_reset(params, self._initial_params, key, self.cfg.reset_ratio)

    def should_stop_training(self, hacking_score: float) -> bool:
        """Abort on runaway hacking (ref :485-494 — never wired there)."""
        return hacking_score > self.cfg.hacking_stop_threshold

    def state_dict(self) -> dict:
        return {
            "update_count": self.update_count,
            "last_primacy": self._last_primacy,
            "last_dormant": self._last_dormant,
        }

    def load_state_dict(self, d: dict) -> None:
        self.update_count = int(d.get("update_count", 0))
        self._last_primacy = int(d.get("last_primacy", 0))
        self._last_dormant = int(d.get("last_dormant", 0))


def create_stability_manager(
    total_steps: int, conservative: bool = False
) -> TrainingStabilityManager:
    """Preset factory (ref create_stability_manager :497-533)."""
    cfg = StabilityConfig()
    if conservative:
        cfg = dataclasses.replace(
            cfg,
            initial_lr_factor=0.05,
            warmup_steps=20_000,
            reset_ratio=0.02,
            reinit_dormant_ratio=0.05,
        )
    return TrainingStabilityManager(cfg, total_steps)
