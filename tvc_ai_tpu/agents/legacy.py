"""Legacy ``SACAgent`` class API over the functional SAC core.

The reference's evaluate/export/HPO scripts and its whole test suite import a
class-based SAC API that vanished from its tree (SURVEY §0.1). This module
restores that surface, JAX-native: a host-side convenience shell whose
compute is the same jitted pure functions production training uses.

Contract served (call sites: tests/test_agent.py:44-242,
scripts/evaluate.py:186-227, scripts/export_tflm.py:92-168):

- ``SACAgent(obs_dim, action_dim, config=None)``
- members: actor / critic1 / critic2 / target_critic1 / target_critic2
  (module views with ``.parameters()``, ``.train()/.eval()``, ``.training``),
  ``log_alpha`` (supports ``.exp()`` and ``float()``), ``replay_buffer``
  (supports ``len()``), ``total_steps``, ``config``, ``obs_dim``, ``action_dim``
- methods: ``select_action(obs, deterministic=False)``,
  ``store_transition(s, a, r, s', done)``, ``train() -> dict``,
  ``save(path)`` / ``load(path)`` / ``load_state_dict(d)``, ``eval_mode()``
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from tvc_ai_tpu.agents import replay as replay_mod
from tvc_ai_tpu.agents import sac as sac_mod
from tvc_ai_tpu.agents.sac import SACConfig  # re-export for `from agents import SACConfig`

__all__ = ["SACAgent", "SACConfig"]


class _ModuleView:
    """Torch-module-flavored view over a flax param subtree."""

    def __init__(self, owner: "SACAgent", getter):
        self._owner = owner
        self._getter = getter
        self.training = True

    def parameters(self):
        return [np.asarray(x) for x in jax.tree.leaves(self._getter(self._owner))]

    def train(self):
        self.training = True

    def eval(self):
        self.training = False

    def forward(self, obs):
        raise NotImplementedError


class _ActorView(_ModuleView):
    def forward(self, obs):
        """(mean, log_std) like the legacy torch actor (export contract)."""
        mean, log_std = self._owner._actor_apply(
            self._owner.state.actor_params, jnp.asarray(obs, jnp.float32)
        )
        return np.asarray(mean), np.asarray(log_std)

    __call__ = forward


class _LogAlpha:
    """Scalar view supporting the ``float(agent.log_alpha.exp())`` idiom."""

    def __init__(self, owner: "SACAgent"):
        self._owner = owner

    @property
    def value(self) -> float:
        return float(self._owner.state.log_alpha)

    def exp(self) -> float:
        return float(np.exp(self.value))

    def __float__(self) -> float:
        return self.value

    def __repr__(self) -> str:
        return f"log_alpha({self.value:.4f})"


class _BufferView:
    def __init__(self, owner: "SACAgent"):
        self._owner = owner

    def __len__(self) -> int:
        return int(self._owner._buffer.size)


class SACAgent:
    """Single-env-friendly SAC agent (the legacy behavioral contract)."""

    def __init__(
        self,
        obs_dim: int,
        action_dim: int,
        config: Optional[SACConfig] = None,
        seed: int = 0,
    ):
        self.obs_dim = int(obs_dim)
        self.action_dim = int(action_dim)
        self.config = config or SACConfig()
        self.total_steps = 0
        self._key = jax.random.PRNGKey(seed)
        self.state = sac_mod.init(
            self._next_key(), self.obs_dim, self.action_dim, self.config
        )
        example = {
            "obs": jnp.zeros(self.obs_dim, jnp.float32),
            "action": jnp.zeros(self.action_dim, jnp.float32),
            "reward": jnp.float32(0.0),
            "next_obs": jnp.zeros(self.obs_dim, jnp.float32),
            "done": jnp.float32(0.0),
        }
        self._buffer = replay_mod.ReplayBuffer.create(
            int(self.config.buffer_size), example
        )

        actor_net, critic_net = sac_mod.make_networks(
            self.obs_dim, self.action_dim, self.config
        )
        self._actor_apply = jax.jit(actor_net.apply)
        self._select = jax.jit(
            partial(
                sac_mod.select_action,
                cfg=self.config,
                action_dim=self.action_dim,
            ),
            static_argnames=("deterministic",),
        )
        self._update = jax.jit(
            partial(
                sac_mod.update,
                cfg=self.config,
                obs_dim=self.obs_dim,
                action_dim=self.action_dim,
            )
        )
        self._add = jax.jit(replay_mod.add_batch)
        self._sample = jax.jit(
            partial(replay_mod.sample, batch_size=int(self.config.batch_size))
        )

        # torch-flavored views (legacy tests poke at these)
        self.actor = _ActorView(self, lambda a: a.state.actor_params)
        self.critic1 = _ModuleView(
            self, lambda a: a.state.critic_params["params"]["q1"]
        )
        self.critic2 = _ModuleView(
            self, lambda a: a.state.critic_params["params"]["q2"]
        )
        self.target_critic1 = _ModuleView(
            self, lambda a: a.state.target_critic_params["params"]["q1"]
        )
        self.target_critic2 = _ModuleView(
            self, lambda a: a.state.target_critic_params["params"]["q2"]
        )
        self.log_alpha = _LogAlpha(self)
        self.replay_buffer = _BufferView(self)

    # ------------------------------------------------------------- helpers
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # ------------------------------------------------------------------ API
    def select_action(self, obs, deterministic: bool = False) -> np.ndarray:
        obs = jnp.asarray(np.asarray(obs, dtype=np.float32))
        action = self._select(
            self.state, obs, self._next_key(), deterministic=deterministic
        )
        return np.asarray(action)

    def store_transition(self, obs, action, reward, next_obs, done) -> None:
        batch = {
            "obs": jnp.asarray(np.asarray(obs, np.float32))[None],
            "action": jnp.asarray(np.asarray(action, np.float32))[None],
            "reward": jnp.asarray([np.float32(reward)]),
            "next_obs": jnp.asarray(np.asarray(next_obs, np.float32))[None],
            "done": jnp.asarray([np.float32(bool(done))]),
        }
        self._buffer = self._add(self._buffer, batch)
        self.total_steps += 1

    def train(self) -> dict[str, float]:
        """One gradient step if warm enough, else {} (legacy semantics)."""
        if int(self._buffer.size) < int(self.config.learning_starts) or int(
            self._buffer.size
        ) < int(self.config.batch_size):
            return {}
        k_s, k_u = jax.random.split(self._next_key())
        batch = self._sample(self._buffer, k_s)
        self.state, metrics = self._update(self.state, batch, k_u)
        return {k: float(v) for k, v in metrics.items()}

    def eval_mode(self) -> None:
        for view in (self.actor, self.critic1, self.critic2):
            view.eval()

    # ------------------------------------------------------------ persistence
    def save(self, path) -> None:
        """Serialize learnable state (msgpack via flax.serialization)."""
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        payload = {
            "state": serialization.to_state_dict(self.state),
            "obs_dim": self.obs_dim,
            "action_dim": self.action_dim,
            "total_steps": self.total_steps,
        }
        path.write_bytes(serialization.msgpack_serialize(payload))

    def load(self, path) -> None:
        payload = serialization.msgpack_restore(Path(path).read_bytes())
        self.load_state_dict(payload["state"])
        self.total_steps = int(payload.get("total_steps", 0))

    def load_state_dict(self, state_dict) -> None:
        self.state = serialization.from_state_dict(self.state, state_dict)
