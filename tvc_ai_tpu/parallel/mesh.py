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
