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


@pytest.mark.integration
@pytest.mark.slow
def test_sharded_ensemble_members_replicate():
    """BASELINE config #4 at scale: ensemble training over the mesh keeps
    all three members' params bit-identical across shards after updating
    from sharded replay + sharded PPO segments."""
    from tvc_ai_tpu.agents import ensemble as ens
    from tvc_ai_tpu.agents.td3 import TD3Config
    from tvc_ai_tpu.agents.ppo import PPOConfig

    mesh = mesh_mod.make_mesh()
    env_params = EnvParams()
    ens_cfg = ens.EnsembleConfig(
        sac=SACConfig(
            hidden_dims=(16, 16), batch_size=16, buffer_size=4096,
            learning_starts=32,
        ),
        td3=TD3Config(hidden_dims=(16, 16), batch_size=16),
        ppo=PPOConfig(hidden_dims=(16, 16), n_epochs=2, num_minibatches=2),
    )
    init_fn, train_fns = mesh_mod.make_sharded_ensemble_train(
        mesh, env_params, ens_cfg, num_envs=16, rollout_steps=8,
        updates_per_step=1,
    )
    carry = init_fn(jax.random.PRNGKey(0))
    weights = jax.numpy.ones(3, jax.numpy.float32) / 3

    # one iteration per acting algorithm, incl. the blended actor
    for actor in ("sac", "ppo", "ensemble"):
        carry, metrics = train_fns[actor](carry, weights, env_params)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (actor, k)

    for member in (carry.sac.actor_params, carry.td3.actor_params,
                   carry.ppo.actor_params, carry.sac.critic_params):
        leaf = jax.tree.leaves(member)[0]
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)

    # env streams decorrelated across shards
    alt = np.asarray(jax.device_get(carry.env_states.body.pos))[:, 2]
    assert np.std(alt) > 0.0
    summary_steps = int(np.sum(np.asarray(jax.device_get(carry.env_steps))))
    assert summary_steps == 16 * 8 * 3


@pytest.mark.integration
@pytest.mark.slow
def test_sharded_ensemble_replication_soak():
    """Replication SOAK: a few hundred sharded ensemble iterations (cycling
    every acting algorithm, incl. the blended actor) must keep all three
    members' params bit-identical across the 8 shards. One iteration can
    hide a drift source that only manifests once replay wraps, PPO
    re-segments, or optimizer state accumulates — this runs long enough for
    all three."""
    from tvc_ai_tpu.agents import ensemble as ens
    from tvc_ai_tpu.agents.td3 import TD3Config
    from tvc_ai_tpu.agents.ppo import PPOConfig

    mesh = mesh_mod.make_mesh()
    env_params = EnvParams()
    ens_cfg = ens.EnsembleConfig(
        sac=SACConfig(
            hidden_dims=(16, 16), batch_size=16, buffer_size=2048,
            learning_starts=32,
        ),
        td3=TD3Config(hidden_dims=(16, 16), batch_size=16),
        ppo=PPOConfig(hidden_dims=(16, 16), n_epochs=2, num_minibatches=2),
    )
    init_fn, train_fns = mesh_mod.make_sharded_ensemble_train(
        mesh, env_params, ens_cfg, num_envs=16, rollout_steps=8,
        updates_per_step=1,
    )
    carry = init_fn(jax.random.PRNGKey(7))
    weights = jax.numpy.asarray([0.5, 0.3, 0.2], jax.numpy.float32)

    actors = ("sac", "ppo", "td3", "ensemble")
    iters = 240  # replay (2048/8=256 per shard) wraps many times over
    for i in range(iters):
        carry, metrics = train_fns[actors[i % len(actors)]](
            carry, weights, env_params
        )
        if i % 60 == 59:  # periodic mid-soak replication checks
            for member in (carry.sac.actor_params, carry.td3.actor_params,
                           carry.ppo.actor_params):
                leaf = jax.tree.leaves(member)[0]
                shards = [np.asarray(s.data) for s in leaf.addressable_shards]
                for s in shards[1:]:
                    np.testing.assert_array_equal(shards[0], s)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k

    # final: EVERY leaf of every member (params + critics + opt state)
    for member in (carry.sac.actor_params, carry.sac.critic_params,
                   carry.td3.actor_params, carry.td3.critic_params,
                   carry.ppo.actor_params,
                   carry.sac.actor_opt, carry.td3.actor_opt):
        for leaf in jax.tree.leaves(member):
            shards = [np.asarray(s.data) for s in leaf.addressable_shards]
            for s in shards[1:]:
                np.testing.assert_array_equal(shards[0], s)
    summary_steps = int(np.sum(np.asarray(jax.device_get(carry.env_steps))))
    assert summary_steps == 16 * 8 * iters
