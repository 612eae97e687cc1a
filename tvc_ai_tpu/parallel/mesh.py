"""Device mesh + sharding specs for data-parallel fused training.

The reference has NO implemented distributed training — `hardware.distributed:
{enabled: false, backend: nccl}` is dead config (SURVEY §2.4). The TPU-native
scale-out axis is data parallelism over the env batch: env state, replay
shards and per-env counters are sharded along a 1-D ``data`` mesh axis; agent
params/optimizer state are replicated; gradients and metrics ride ICI via
``psum``/``pmean`` inside one ``shard_map``-wrapped XLA program.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tvc_ai_tpu.agents import ensemble as ens_mod
from tvc_ai_tpu.agents import sac as sac_mod
from tvc_ai_tpu.training import loop as loop_mod

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices).reshape(-1), (DATA_AXIS,))


def carry_specs(carry_like: loop_mod.TrainCarry) -> loop_mod.TrainCarry:
    """PartitionSpec pytree matching ``TrainCarry``:

    env-indexed leaves → P('data'); agent/key/buffer-pointers → replicated.
    """
    data = jax.tree.map(lambda _: P(DATA_AXIS), carry_like.env_states)
    buffer = carry_like.buffer.replace(
        data={k: P(DATA_AXIS) for k in carry_like.buffer.data},
        ptr=P(),
        size=P(),
    )
    agent = jax.tree.map(lambda _: P(), carry_like.agent)
    return loop_mod.TrainCarry(
        env_states=data,
        obs=P(DATA_AXIS),
        agent=agent,
        buffer=buffer,
        key=P(),
        icm=jax.tree.map(lambda _: P(), carry_like.icm),
        rnd=jax.tree.map(lambda _: P(), carry_like.rnd),
        hier=jax.tree.map(lambda _: P(), carry_like.hier),
        goal=P(DATA_AXIS) if carry_like.goal is not None else None,
        goal_obs=P(DATA_AXIS) if carry_like.goal_obs is not None else None,
        obs_window=(
            P(DATA_AXIS) if carry_like.obs_window is not None else None
        ),
        env_steps=P(DATA_AXIS),
        episodes=P(DATA_AXIS),
        successes=P(DATA_AXIS),
        ep_return=P(DATA_AXIS),
        ep_length=P(DATA_AXIS),
        return_sum=P(DATA_AXIS),
        length_sum=P(DATA_AXIS),
        # per-shard episode rings (each shard records its own envs' episodes;
        # the host drain concatenates across shards)
        ep_ring_return=P(DATA_AXIS),
        ep_ring_length=P(DATA_AXIS),
        ep_ring_success=P(DATA_AXIS),
        ep_ring_seq=P(DATA_AXIS),
        ep_ring_ptr=P(DATA_AXIS),
        ep_ring_goal=(
            P(DATA_AXIS) if carry_like.ep_ring_goal is not None else None
        ),
        ep_ring_goal_obs=(
            P(DATA_AXIS) if carry_like.ep_ring_goal_obs is not None else None
        ),
    )


def make_sharded_train(
    mesh: Mesh,
    env_params,
    sac_cfg: sac_mod.SACConfig,
    loop_cfg: loop_mod.TrainLoopConfig,
):
    """Build (init_fn, train_fn) that run the fused loop over the mesh.

    ``train_fn(carry, env_params)`` — env params ride along replicated so
    curriculum promotion swaps values without recompiling.
    ``loop_cfg.num_envs`` is the GLOBAL env count; each device runs
    num_envs/n_devices locally. Inside the sharded region all shapes are
    local, so the same ``training.loop`` code serves single-chip and
    multi-chip unchanged (gradient pmean enabled via ``axis_name``).
    """
    n_dev = mesh.devices.size
    if loop_cfg.num_envs % n_dev != 0:
        raise ValueError(
            f"num_envs {loop_cfg.num_envs} must divide over {n_dev} devices"
        )
    local_cfg = dataclasses.replace(
        loop_cfg, num_envs=loop_cfg.num_envs // n_dev
    )
    # per-device replay shard so the global capacity matches the config
    local_sac_cfg = dataclasses.replace(
        sac_cfg,
        buffer_size=max(sac_cfg.buffer_size // n_dev, local_cfg.num_envs),
        learning_starts=max(sac_cfg.learning_starts // n_dev, 1),
    )

    iteration = loop_mod.make_train_iteration(
        local_sac_cfg, local_cfg, axis_name=DATA_AXIS
    )

    def init_local(key):
        # identical replicated agent init on every device (same key);
        # env keys decorrelated by folding in the device index.
        local_key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        carry = loop_mod.init_carry(key, env_params, local_sac_cfg, local_cfg)
        env_keys = jax.random.split(local_key, local_cfg.num_envs)
        from tvc_ai_tpu.env import rocket_env

        env_states, obs = jax.vmap(rocket_env.reset, in_axes=(0, None))(
            env_keys, env_params
        )
        obs_window = carry.obs_window
        if local_cfg.history_len > 1:
            obs_window = jnp.tile(obs[:, None, :], (1, local_cfg.history_len, 1))
            obs = obs_window.reshape(local_cfg.num_envs, -1)
        return carry.replace(
            env_states=env_states, obs=obs, obs_window=obs_window
        )

    # build spec trees from an abstract carry
    abstract = jax.eval_shape(
        lambda k: loop_mod.init_carry(k, env_params, local_sac_cfg, local_cfg),
        jax.random.PRNGKey(0),
    )
    specs = carry_specs(abstract)
    metric_specs = {
        k: P()
        for k in (
            "critic_loss", "actor_loss", "alpha_loss", "alpha",
            "q1_mean", "q2_mean", "entropy", "reward_mean", "done_frac",
        )
    }

    env_param_specs = jax.tree.map(lambda _: P(), env_params)
    init_fn = jax.jit(
        jax.shard_map(init_local, mesh=mesh, in_specs=P(), out_specs=specs)
    )
    train_fn = jax.jit(
        jax.shard_map(
            iteration,
            mesh=mesh,
            in_specs=(specs, env_param_specs),
            out_specs=(specs, metric_specs),
        ),
        donate_argnums=(0,),
    )
    return init_fn, train_fn


def ensemble_carry_specs(carry_like: ens_mod.EnsembleCarry) -> ens_mod.EnsembleCarry:
    """PartitionSpec pytree for ``EnsembleCarry``: env batch + replay shards
    along 'data'; the three members' params/optimizers replicated."""
    return ens_mod.EnsembleCarry(
        env_states=jax.tree.map(lambda _: P(DATA_AXIS), carry_like.env_states),
        obs=P(DATA_AXIS),
        sac=jax.tree.map(lambda _: P(), carry_like.sac),
        td3=jax.tree.map(lambda _: P(), carry_like.td3),
        ppo=jax.tree.map(lambda _: P(), carry_like.ppo),
        buffer=carry_like.buffer.replace(
            data={k: P(DATA_AXIS) for k in carry_like.buffer.data},
            ptr=P(),
            size=P(),
        ),
        key=P(),
        env_steps=P(DATA_AXIS),
        episodes=P(DATA_AXIS),
        successes=P(DATA_AXIS),
        ep_return=P(DATA_AXIS),
        return_sum=P(DATA_AXIS),
        length_sum=P(DATA_AXIS),
        ep_length=P(DATA_AXIS),
    )


def make_sharded_ensemble_train(
    mesh: Mesh,
    env_params,
    ens_cfg: ens_mod.EnsembleConfig,
    num_envs: int,
    rollout_steps: int,
    updates_per_step: int = 1,
):
    """Data-parallel fused ensemble training over the mesh (BASELINE
    config #4 at scale): one ``(carry, weights, env_params) -> (carry,
    metrics)`` program per acting algorithm, members replicated with
    pmean-reduced gradients, env batch + replay sharded.

    Returns ``(init_fn, train_fns)`` with ``train_fns`` keyed by actor
    ('ppo' | 'sac' | 'td3' | 'ensemble'); ``num_envs`` is GLOBAL.
    """
    n_dev = mesh.devices.size
    if num_envs % n_dev != 0:
        raise ValueError(f"num_envs {num_envs} must divide over {n_dev} devices")
    local_envs = num_envs // n_dev
    local_cfg = dataclasses.replace(
        ens_cfg,
        sac=dataclasses.replace(
            ens_cfg.sac,
            buffer_size=max(ens_cfg.sac.buffer_size // n_dev, local_envs),
            learning_starts=max(ens_cfg.sac.learning_starts // n_dev, 1),
        ),
    )

    def init_local(key):
        carry = ens_mod.init_carry(key, env_params, local_cfg, local_envs)
        # identical member init on every device (same key); env streams
        # decorrelated by folding in the device index
        local_key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        env_keys = jax.random.split(local_key, local_envs)
        from tvc_ai_tpu.env import rocket_env

        env_states, obs = jax.vmap(rocket_env.reset, in_axes=(0, None))(
            env_keys, env_params
        )
        return carry.replace(env_states=env_states, obs=obs)

    abstract = jax.eval_shape(
        lambda k: ens_mod.init_carry(k, env_params, local_cfg, local_envs),
        jax.random.PRNGKey(0),
    )
    specs = ensemble_carry_specs(abstract)
    env_param_specs = jax.tree.map(lambda _: P(), env_params)
    init_fn = jax.jit(
        jax.shard_map(init_local, mesh=mesh, in_specs=P(), out_specs=specs)
    )

    train_fns = {}
    weights_abstract = jnp.zeros(3, jnp.float32)
    for actor in ("ppo", "sac", "td3", "ensemble"):
        iteration = ens_mod.make_ensemble_iteration(
            actor, local_cfg, local_envs, rollout_steps, updates_per_step,
            axis_name=DATA_AXIS,
        )
        # metric STRUCTURE from an axis-free twin (axis_index cannot be
        # traced outside shard_map; pmean never changes the tree structure)
        shape_only = ens_mod.make_ensemble_iteration(
            actor, local_cfg, local_envs, rollout_steps, updates_per_step,
            axis_name=None,
        )
        metrics_abstract = jax.eval_shape(
            shape_only, abstract, weights_abstract, env_params
        )[1]
        metric_specs = jax.tree.map(lambda _: P(), metrics_abstract)
        train_fns[actor] = jax.jit(
            jax.shard_map(
                iteration,
                mesh=mesh,
                in_specs=(specs, P(), env_param_specs),
                out_specs=(specs, metric_specs),
            ),
            donate_argnums=(0,),
        )
    return init_fn, train_fns
