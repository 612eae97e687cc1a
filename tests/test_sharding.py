"""Multi-device data-parallel training over an 8-virtual-CPU-device mesh."""

import jax
import numpy as np
import pytest

from tvc_ai_tpu.agents.sac import SACConfig
from tvc_ai_tpu.env.types import EnvParams
from tvc_ai_tpu.parallel import mesh as mesh_mod
from tvc_ai_tpu.training import loop as loop_mod


@pytest.mark.integration
def test_sharded_train_runs_and_replicates_params():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = mesh_mod.make_mesh()
    env_params = EnvParams()
    sac_cfg = SACConfig(
        hidden_dims=(32, 32), batch_size=16, buffer_size=8192, learning_starts=128
    )
    loop_cfg = loop_mod.TrainLoopConfig(
        num_envs=32, rollout_steps=8, updates_per_step=1
    )
    init_fn, train_fn = mesh_mod.make_sharded_train(
        mesh, env_params, sac_cfg, loop_cfg
    )
    carry = init_fn(jax.random.PRNGKey(0))
    assert carry.obs.shape == (32, loop_cfg.obs_dim)

    for _ in range(2):
        carry, metrics = train_fn(carry, env_params)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k

    # params must stay bit-identical across devices (replicated + pmean grads)
    leaf = jax.tree.leaves(carry.agent.actor_params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)

    summary = loop_mod.summarize(carry)
    assert summary["env_steps"] == 32 * 8 * 2

    # envs on different shards must have decorrelated trajectories
    alt = np.asarray(carry.env_states.body.pos[:, 2])
    assert np.std(alt) > 0.0


@pytest.mark.integration
def test_sharded_train_with_extension_stack():
    """ICM + RND + safety layer under shard_map: the replicated module params
    (pmean'd grads, pmean'd RND normalizer stats) stay bit-identical across
    shards while env streams stay decorrelated."""
    mesh = mesh_mod.make_mesh()
    env_params = EnvParams()
    sac_cfg = SACConfig(
        hidden_dims=(16, 16), batch_size=16, buffer_size=4096, learning_starts=64
    )
    loop_cfg = loop_mod.TrainLoopConfig(
        num_envs=16,
        rollout_steps=8,
        use_safety_layer=True,
        use_curiosity=True,
        use_rnd=True,
        use_physics_informed=True,
    )
    import dataclasses

    loop_cfg = dataclasses.replace(
        loop_cfg, rnd=dataclasses.replace(loop_cfg.rnd, update_frequency=2)
    )
    init_fn, train_fn = mesh_mod.make_sharded_train(
        mesh, env_params, sac_cfg, loop_cfg
    )
    carry = init_fn(jax.random.PRNGKey(0))
    for _ in range(2):
        carry, metrics = train_fn(carry, env_params)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(carry.icm.step.addressable_shards[0].data) > 0
    assert int(carry.rnd.step.addressable_shards[0].data) > 0
    for module_params in (
        carry.icm.params,
        carry.rnd.predictor_params,
        carry.agent.actor_params,
    ):
        leaf = jax.tree.leaves(module_params)[0]
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)
    # normalizer EMA state replicated too
    shards = [
        np.asarray(s.data) for s in carry.rnd.bonus_mean.addressable_shards
    ]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
