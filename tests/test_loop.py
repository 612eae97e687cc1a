"""Integration test: the fused rollout+update loop trains end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvc_ai_tpu.agents.sac import SACConfig
from tvc_ai_tpu.env.types import EnvParams
from tvc_ai_tpu.training import loop as loop_mod


@pytest.mark.integration
def test_fused_train_iteration():
    env_params = EnvParams()
    sac_cfg = SACConfig(
        hidden_dims=(32, 32), batch_size=32, buffer_size=2048, learning_starts=64
    )
    loop_cfg = loop_mod.TrainLoopConfig(
        num_envs=8, rollout_steps=16, updates_per_step=1
    )
    carry = loop_mod.init_carry(jax.random.PRNGKey(0), env_params, sac_cfg, loop_cfg)
    it = jax.jit(loop_mod.make_train_iteration(sac_cfg, loop_cfg))

    carry, metrics = it(carry, env_params)
    assert int(jnp.sum(carry.env_steps)) == 8 * 16
    assert np.isfinite(float(metrics["reward_mean"]))

    p0 = jax.tree.leaves(carry.agent.actor_params)
    carry, metrics = it(carry, env_params)
    # after learning_starts, updates actually happen and params move
    assert int(carry.buffer.size) >= 64
    p1 = jax.tree.leaves(carry.agent.actor_params)
    assert any(not np.allclose(a, b) for a, b in zip(p0, p1))
    for k in ("critic_loss", "actor_loss", "alpha"):
        assert np.isfinite(float(metrics[k])), k

    summary = loop_mod.summarize(carry)
    assert summary["env_steps"] == 8 * 32
    assert summary["buffer_size"] > 0


@pytest.mark.integration
def test_fused_loop_with_safety_and_curiosity():
    """Enhanced-env extensions fused into the train program."""
    env_params = EnvParams()
    sac_cfg = SACConfig(
        hidden_dims=(16, 16), batch_size=16, buffer_size=1024, learning_starts=64
    )
    loop_cfg = loop_mod.TrainLoopConfig(
        num_envs=4, rollout_steps=8, use_safety_layer=True, use_curiosity=True,
    )
    carry = loop_mod.init_carry(jax.random.PRNGKey(0), env_params, sac_cfg, loop_cfg)
    assert carry.icm is not None
    it = jax.jit(loop_mod.make_train_iteration(sac_cfg, loop_cfg))
    icm0 = jax.tree.leaves(carry.icm.params)[0]
    carry, metrics = it(carry, env_params)
    # ICM actually trained during the rollout
    icm1 = jax.tree.leaves(carry.icm.params)[0]
    assert not np.allclose(icm0, icm1)
    assert np.isfinite(float(metrics["reward_mean"]))
