"""Fused rollout + update loop: sim and learning in ONE XLA program.

The reference's hot loop crosses the Python↔C++ boundary twice per env step
(PyBullet step + torch update, scripts/train.py:546-591, ~1.2k steps/s).
Here a whole training *iteration* — T env steps × N envs, replay writes,
samples, and SAC gradient steps — is a single ``lax.scan`` under ``jit``:
zero host round-trips, everything resident in HBM.

Layout choices for TPU:
- env state is a pytree with leading axis N (vmap) — elementwise physics on
  the VPU, policy/critic matmuls batched (N, obs_dim)×(obs_dim, H) on the MXU;
- the replay buffer is donated so XLA updates it in place;
- update cadence is a static Python int (``updates_per_step``) so the scan
  body has fixed shape; the learning_starts gate is a ``lax.cond``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from tvc_ai_tpu.agents import replay as replay_mod
from tvc_ai_tpu.agents import sac as sac_mod
from tvc_ai_tpu.agents.physics_informed import (
    PhysicsInformedConfig,
    make_icm_physics_loss,
)
from tvc_ai_tpu.env import rocket_env
from tvc_ai_tpu.env.types import ACTION_DIM, OBS_DIM, EnvParams, EnvState
from tvc_ai_tpu.models import curiosity as icm_mod
from tvc_ai_tpu.models import hierarchical as hier_mod
from tvc_ai_tpu.models import rnd as rnd_mod
from tvc_ai_tpu.models.safety import SafetyConstraints, apply_safety


@dataclasses.dataclass(frozen=True)
class TrainLoopConfig:
    """Static shape/cadence parameters of the fused loop."""

    num_envs: int = 4096
    rollout_steps: int = 100        # env steps per jitted iteration (scan length)
    updates_per_step: int = 1       # SAC gradient steps per update event
    # SAC updates fire every `update_interval` env steps (default 1 = every
    # step, the reference's cadence). Raising it with a proportionally
    # larger batch_size keeps the sample budget while replacing many small
    # matmuls with few large ones — the MXU-utilization lever (VPU physics
    # can't saturate the chip; big-batch critic/actor matmuls can). The
    # rollout scan becomes rollout_steps/K chunks of K-1 sim-only steps + 1
    # learning step; ICM/RND keep their per-step cadence.
    update_interval: int = 1
    obs_dim: int = OBS_DIM
    action_dim: int = ACTION_DIM
    # enhanced-env extensions (ref live path: SafetyLayer at act time,
    # agent/multi_algorithm_agent.py:784-786; ICM intrinsic reward added in
    # env.step, env/enhanced_rocket_tvc_env.py:496-502 — here both fuse into
    # the same XLA program and the ICM actually trains)
    use_safety_layer: bool = False
    use_curiosity: bool = False
    # RND novelty bonus (config/config.yaml random_network_distillation —
    # spec'd by the reference, implemented here; sibling of use_curiosity)
    use_rnd: bool = False
    # physics-informed consistency loss regularizing the ICM forward model
    # (the reference computed PhysicsInformedLoss and never backpropagated
    # it, agent/multi_algorithm_agent.py:882-907); requires use_curiosity
    use_physics_informed: bool = False
    # hierarchical RL as a TRAINING mode (ref HierarchicalAgent
    # :353-417 selected goals at act time but trained nothing): the SAC low
    # level consumes [obs ‖ goal-onehot]; goals are sampled per EPISODE by a
    # high-level policy trained by REINFORCE on finished-episode returns at
    # iteration boundaries (per-episode goals give clean credit assignment —
    # a documented deviation from the ref's per-call resampling, which with
    # its never-trained high level was uniform noise)
    use_hierarchical: bool = False
    # history conditioning: the policy consumes the last `history_len`
    # observations (flattened [oldest..newest]); 1 = memoryless (default).
    # The transformer policy's sequence mode (SURVEY §5: PosEnc supports
    # 5000, forward(obs, sequence_length) hints an unused history mode)
    # becomes trainable through this.
    history_len: int = 1
    # physics backend for the batched env step: None = auto (SoA Pallas
    # kernel on TPU when no extra physics term is on, vmapped XLA path
    # otherwise — see env.rocket_env.batched_step_autoreset)
    use_pallas_physics: bool | None = None
    # capacity of the on-device finished-episode ring (most recent episodes'
    # (return, length, success) for the host-side reward-hacking detector,
    # restoring the reference's per-episode 100-window semantics
    # (scripts/train.py:101-171) instead of iteration aggregates)
    episode_ring_size: int = 256
    # fraction of every SAC batch drawn from the PERSISTENT demonstration
    # buffer (TrainCarry.demo_buffer) instead of the online ring — DQfD-style
    # mixed sampling. Seeding demos into the online ring alone decays: at
    # 512 envs x 128 steps/iter the ring wraps in ~1M env steps and the
    # demonstrations are gone for the remaining 99% of a campaign. 0 = off.
    demo_fraction: float = 0.0
    # hoisted-bookkeeping chunk path (r5): None = auto (on when
    # update_interval>1, plain-SAC features, and the replay capacity is a
    # multiple of update_interval*num_envs), True/False force it — the
    # forced switch exists for interleaved A/B benchmarking on the shared
    # TPU tunnel, whose between-process variance (±40% measured) swamps
    # any cross-process comparison
    hoist_bookkeeping: bool | None = None
    curiosity: icm_mod.CuriosityConfig = dataclasses.field(
        default_factory=icm_mod.CuriosityConfig
    )
    rnd: rnd_mod.RNDConfig = dataclasses.field(
        default_factory=rnd_mod.RNDConfig
    )
    physics_informed: PhysicsInformedConfig = dataclasses.field(
        default_factory=PhysicsInformedConfig
    )
    hierarchical: hier_mod.HierarchicalConfig = dataclasses.field(
        default_factory=hier_mod.HierarchicalConfig
    )
    safety: SafetyConstraints = dataclasses.field(
        default_factory=SafetyConstraints
    )


@struct.dataclass
class TrainCarry:
    """Everything the fused loop threads through scan iterations."""

    env_states: EnvState            # batched (N, ...)
    obs: jnp.ndarray                # (N, obs_dim) current policy observations
    agent: sac_mod.SACState
    buffer: replay_mod.ReplayBuffer
    key: jnp.ndarray
    icm: Any                        # CuriosityState or None (curiosity off)
    rnd: Any                        # RNDState or None (RND off)
    hier: Any                       # HighLevelState or None (hierarchical off)
    goal: Any                       # (N,) i32 per-episode goal or None
    goal_obs: Any                   # (N, obs_dim) obs at goal selection or None
    obs_window: Any                 # (N, history_len, obs_dim) or None
    # Per-env counters — kept as (N,) arrays (not scalars) so every
    # env-indexed leaf shards uniformly along the data axis under shard_map.
    env_steps: jnp.ndarray          # (N,) i32 steps taken by each env slot
    episodes: jnp.ndarray           # (N,) i32 finished episodes per slot
    successes: jnp.ndarray          # (N,) i32 successful episodes per slot
    ep_return: jnp.ndarray          # (N,) running per-env episode return
    ep_length: jnp.ndarray          # (N,) running per-env episode length
    return_sum: jnp.ndarray         # (N,) sum of finished-episode returns
    length_sum: jnp.ndarray         # (N,) sum of finished-episode lengths
    # ring of the most recent finished episodes (K = episode_ring_size);
    # seq = env-step counter at completion (-1 = empty slot) lets the host
    # drain only new entries in completion order
    ep_ring_return: jnp.ndarray     # (K,) f32
    ep_ring_length: jnp.ndarray     # (K,) f32
    ep_ring_success: jnp.ndarray    # (K,) f32
    ep_ring_seq: jnp.ndarray        # (K,) i32
    ep_ring_ptr: jnp.ndarray        # (1,) i32 next write slot (sharded shape)
    # hierarchical-mode extensions of the episode ring (None when off)
    ep_ring_goal: Any               # (K,) i32 episode goal
    ep_ring_goal_obs: Any           # (K, obs_dim) obs at goal selection
    # persistent LQR-demonstration buffer (None unless demo_fraction > 0):
    # never written during training, sampled into every update batch
    demo_buffer: Any = None


def policy_obs_dim(loop_cfg: TrainLoopConfig) -> int:
    """Dimensionality the agent actually sees (env obs × history
    [‖ goal-onehot under hierarchical mode])."""
    dim = loop_cfg.obs_dim * loop_cfg.history_len
    if loop_cfg.use_hierarchical:
        dim += loop_cfg.hierarchical.num_goals
    return dim


def _augment_with_goal(
    obs: jnp.ndarray, goal: jnp.ndarray, loop_cfg: TrainLoopConfig
) -> jnp.ndarray:
    """[obs ‖ goal-onehot] — the low-level conditioning (ref :405-417)."""
    onehot = jax.nn.one_hot(
        goal, loop_cfg.hierarchical.num_goals, dtype=obs.dtype
    )
    return jnp.concatenate([obs, onehot], axis=-1)


def init_carry(
    key: jnp.ndarray,
    env_params: EnvParams,
    sac_cfg: sac_mod.SACConfig,
    loop_cfg: TrainLoopConfig,
) -> TrainCarry:
    k_env, k_agent, k_loop = jax.random.split(key, 3)
    env_keys = jax.random.split(k_env, loop_cfg.num_envs)
    env_states, obs = jax.vmap(rocket_env.reset, in_axes=(0, None))(
        env_keys, env_params
    )
    obs_window = None
    if loop_cfg.history_len > 1:
        obs_window = jnp.tile(obs[:, None, :], (1, loop_cfg.history_len, 1))
        obs = obs_window.reshape(loop_cfg.num_envs, -1)
    agent = sac_mod.init(
        k_agent, policy_obs_dim(loop_cfg), loop_cfg.action_dim, sac_cfg
    )
    example = {
        "obs": jnp.zeros(policy_obs_dim(loop_cfg), jnp.float32),
        "action": jnp.zeros(loop_cfg.action_dim, jnp.float32),
        "reward": jnp.float32(0.0),
        "next_obs": jnp.zeros(policy_obs_dim(loop_cfg), jnp.float32),
        "done": jnp.float32(0.0),
    }
    capacity = sac_cfg.buffer_size - (sac_cfg.buffer_size % loop_cfg.num_envs)
    capacity = max(capacity, loop_cfg.num_envs)
    buffer = replay_mod.ReplayBuffer.create(capacity, example)
    icm_state = (
        icm_mod.init(jax.random.fold_in(k_agent, 7), loop_cfg.curiosity)
        if loop_cfg.use_curiosity
        else None
    )
    rnd_state = (
        rnd_mod.init(jax.random.fold_in(k_agent, 11), loop_cfg.rnd)
        if loop_cfg.use_rnd
        else None
    )
    hier_state = goal = goal_obs = None
    ep_ring_goal = ep_ring_goal_obs = None
    if loop_cfg.use_hierarchical:
        k_hier, k_goal = jax.random.split(jax.random.fold_in(k_agent, 13))
        hier_state = hier_mod.init_high(
            k_hier, loop_cfg.obs_dim, loop_cfg.hierarchical
        )
        goal_obs = (
            obs_window[:, -1, :] if loop_cfg.history_len > 1 else obs
        )
        goal = hier_mod.sample_goal(
            hier_state, goal_obs, k_goal, loop_cfg.hierarchical
        )
        ep_ring_goal = jnp.zeros(loop_cfg.episode_ring_size, jnp.int32)
        ep_ring_goal_obs = jnp.zeros(
            (loop_cfg.episode_ring_size, loop_cfg.obs_dim), jnp.float32
        )
    # NOTE: each counter gets its OWN zero array — sharing one buffer across
    # fields breaks donation ("attempt to donate the same buffer twice")
    # when the carry is built eagerly.
    def zeros_f():
        return jnp.zeros(loop_cfg.num_envs, jnp.float32)

    def zeros_i():
        return jnp.zeros(loop_cfg.num_envs, jnp.int32)

    return TrainCarry(
        env_states=env_states,
        obs=obs,
        agent=agent,
        buffer=buffer,
        key=k_loop,
        icm=icm_state,
        rnd=rnd_state,
        hier=hier_state,
        goal=goal,
        goal_obs=goal_obs,
        obs_window=obs_window,
        env_steps=zeros_i(),
        episodes=zeros_i(),
        successes=zeros_i(),
        ep_return=zeros_f(),
        ep_length=zeros_i(),
        return_sum=zeros_f(),
        length_sum=zeros_f(),
        ep_ring_return=jnp.zeros(loop_cfg.episode_ring_size, jnp.float32),
        ep_ring_length=jnp.zeros(loop_cfg.episode_ring_size, jnp.float32),
        ep_ring_success=jnp.zeros(loop_cfg.episode_ring_size, jnp.float32),
        ep_ring_seq=jnp.full(loop_cfg.episode_ring_size, -1, jnp.int32),
        ep_ring_ptr=jnp.zeros(1, jnp.int32),
        ep_ring_goal=ep_ring_goal,
        ep_ring_goal_obs=ep_ring_goal_obs,
    )


def make_train_iteration(
    sac_cfg: sac_mod.SACConfig,
    loop_cfg: TrainLoopConfig,
    axis_name: str | None = None,
    act_fn=None,
):
    """Build the jittable ``(carry, env_params) -> (carry, metrics)`` iteration.

    ``env_params`` is a runtime argument (not a closure) so curriculum stage
    promotion — which only changes parameter *values*, never shapes — reuses
    the cached compilation. ``axis_name`` enables data-parallel gradient
    pmean when the iteration is wrapped in ``shard_map`` over a device mesh
    (see ``parallel``).

    ``act_fn(agent, policy_input, key) -> actions`` overrides the rollout's
    act path (default: ``sac.select_action``). The per-step actor forward
    inside the sequential scan is the measured bound on learning-on
    throughput (RESULTS r4 MFU sweep: 21.0M steps/s rollout ceiling vs 84M
    env-only), so ``scripts/bench_act_path.py`` uses this hook to isolate
    its cost, and a cheaper production act path can slot in here without
    touching the loop.
    """
    if act_fn is None:
        def act_fn(agent, policy_input, key):
            return sac_mod.select_action(
                agent, policy_input, key, sac_cfg, loop_cfg.action_dim
            )
    def batched_step(states, actions, env_params):
        return rocket_env.batched_step_autoreset(
            states, actions, env_params,
            use_pallas=loop_cfg.use_pallas_physics,
        )

    n_demo = (
        int(round(sac_cfg.batch_size * loop_cfg.demo_fraction))
        if loop_cfg.demo_fraction > 0
        else 0
    )

    def make_update_fns(buffer, demo_buffer):
        """(agent, key) -> (agent, metrics) update branches over a given
        buffer snapshot — shared by the per-step path and the hoisted
        chunk path (both run them under the same learning_starts cond)."""

        def do_updates(args):
            agent, key = args

            def one_update(agent_key, _):
                agent, key = agent_key
                k_s, k_d, k_u, key = jax.random.split(key, 4)
                if n_demo > 0:
                    # DQfD-style mixed batch: the demo buffer is static, so
                    # the teacher's success trajectories stay in the batch
                    # distribution for the whole campaign. demo_mask marks
                    # the demo rows for the actor's Q-filtered BC term
                    # (sac.SACConfig.bc_weight).
                    on = replay_mod.sample(
                        buffer, k_s, sac_cfg.batch_size - n_demo
                    )
                    demo = replay_mod.sample(demo_buffer, k_d, n_demo)
                    batch = {
                        k: jnp.concatenate([on[k], demo[k]]) for k in on
                    }
                    batch["demo_mask"] = jnp.concatenate(
                        [
                            jnp.zeros(sac_cfg.batch_size - n_demo, jnp.float32),
                            jnp.ones(n_demo, jnp.float32),
                        ]
                    )
                else:
                    batch = replay_mod.sample(buffer, k_s, sac_cfg.batch_size)
                agent, metrics = sac_mod.update(
                    agent, batch, k_u, sac_cfg,
                    policy_obs_dim(loop_cfg), loop_cfg.action_dim, axis_name,
                )
                return (agent, key), metrics

            (agent, _), metrics = jax.lax.scan(
                one_update, (agent, key), None, length=loop_cfg.updates_per_step
            )
            metrics = jax.tree.map(jnp.mean, metrics)
            if axis_name is not None:
                # device-mean inside the branch so both cond branches produce
                # invariant (replicated) metric types under shard_map
                metrics = jax.lax.pmean(metrics, axis_name)
            return agent, metrics

        def no_updates(args):
            agent, _ = args
            zero = jnp.float32(0.0)
            out = {
                "critic_loss": zero, "actor_loss": zero, "alpha_loss": zero,
                "alpha": jnp.exp(agent.log_alpha), "q1_mean": zero,
                "q2_mean": zero, "entropy": zero,
            }
            if n_demo > 0 and sac_cfg.bc_weight > 0:
                out["bc_loss"] = zero  # match do_updates' metric pytree
            return agent, out

        return do_updates, no_updates

    def env_and_learn_step(
        carry: TrainCarry, _: Any, env_params: EnvParams, learn: bool = True
    ):
        key = carry.key
        if axis_name is not None:
            # decorrelate action noise / replay sampling across shards
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        k_act, k_sample, k_update, k_next = jax.random.split(key, 4)
        if axis_name is not None:
            # carry forward the *shared* chain so all shards stay in lockstep
            (k_next,) = jax.random.split(carry.key, 1)

        # --- act & simulate (N envs, one fused step)
        policy_input = (
            _augment_with_goal(carry.obs, carry.goal, loop_cfg)
            if loop_cfg.use_hierarchical
            else carry.obs
        )
        actions = act_fn(carry.agent, policy_input, k_act)
        # the CURRENT physical frame (with history stacking the newest obs
        # sits at the END of the [oldest..newest] window)
        cur_frame = (
            carry.obs[:, -loop_cfg.obs_dim:]
            if loop_cfg.history_len > 1
            else carry.obs
        )
        if loop_cfg.use_safety_layer:
            # CBF-style projection at act time (ref :784-786)
            actions, _ = apply_safety(cur_frame, actions, loop_cfg.safety)
        env_states, out, next_obs = batched_step(
            carry.env_states, actions, env_params
        )

        # --- history window: shift in the true next obs; on done, refill the
        # whole window with the fresh episode's first obs
        obs_window = carry.obs_window
        if loop_cfg.history_len > 1:
            done_now = (out.terminated | out.truncated)[:, None, None]
            shifted = jnp.concatenate(
                [carry.obs_window[:, 1:], out.obs[:, None, :]], axis=1
            )
            fresh = jnp.tile(next_obs[:, None, :], (1, loop_cfg.history_len, 1))
            obs_window = jnp.where(done_now, fresh, shifted)
            # stacked views for the policy/replay
            stacked_next_true = shifted.reshape(shifted.shape[0], -1)
            stacked_next_policy = obs_window.reshape(obs_window.shape[0], -1)
        else:
            stacked_next_true = out.obs
            stacked_next_policy = next_obs

        # --- intrinsic curiosity reward + ICM training (ref env :496-502,
        # but the forward/inverse models actually take gradient steps here)
        icm_state = carry.icm
        reward = out.reward
        if loop_cfg.use_curiosity:
            intrinsic = icm_mod.intrinsic_reward(
                icm_state, cur_frame, actions, out.obs, loop_cfg.curiosity
            )
            reward = reward + intrinsic
            # physics-informed consistency regularizes the forward model
            # (gradients actually flow, unlike ref :882-907)
            phys_fn = (
                make_icm_physics_loss(loop_cfg.physics_informed)
                if loop_cfg.use_physics_informed
                else None
            )
            icm_state, _ = icm_mod.update(
                icm_state, cur_frame, actions, out.obs, loop_cfg.curiosity,
                physics_loss_fn=phys_fn, axis_name=axis_name,
            )

        # --- RND novelty bonus; predictor trains every `update_frequency`
        # env steps (the reference's spec'd cadence), via lax.cond so the
        # program stays shape-static
        rnd_state = carry.rnd
        if loop_cfg.use_rnd:
            reward = reward + rnd_mod.intrinsic_reward(
                rnd_state, out.obs, loop_cfg.rnd
            )
            due = (
                carry.env_steps[0] % loop_cfg.rnd.update_frequency == 0
            )
            rnd_state = jax.lax.cond(
                due,
                lambda s: rnd_mod.update(
                    s, out.obs, loop_cfg.rnd, axis_name=axis_name
                )[0],
                lambda s: s,
                rnd_state,
            )

        # --- replay write (terminated-only done: truncation bootstraps);
        # hierarchical mode stores the goal-augmented views (same episode →
        # same goal on both sides of the transition)
        stored_obs, stored_next = carry.obs, stacked_next_true
        if loop_cfg.use_hierarchical:
            stored_obs = policy_input
            stored_next = _augment_with_goal(
                stacked_next_true, carry.goal, loop_cfg
            )
        transitions = {
            "obs": stored_obs,
            "action": actions,
            "reward": reward,
            "next_obs": stored_next,
            "done": out.terminated.astype(jnp.float32),
        }
        buffer = replay_mod.add_batch(carry.buffer, transitions)

        # --- learn (static number of updates; gated on learning_starts)
        do_updates, no_updates = make_update_fns(buffer, carry.demo_buffer)

        if learn:
            agent, upd_metrics = jax.lax.cond(
                buffer.size >= sac_cfg.learning_starts,
                do_updates,
                no_updates,
                (carry.agent, k_update),
            )
        else:
            # sim-only step of an update_interval>1 chunk: same metric
            # pytree (zeros), no SAC update compiled in
            agent, upd_metrics = no_updates((carry.agent, k_update))

        # --- episode bookkeeping (all on-device, per-env arrays)
        done = out.terminated | out.truncated
        ep_return = carry.ep_return + out.reward
        ep_length = carry.ep_length + 1
        episodes = carry.episodes + done.astype(jnp.int32)
        successes = carry.successes + (done & out.mission_success).astype(jnp.int32)
        return_sum = carry.return_sum + jnp.where(done, ep_return, 0.0)
        length_sum = carry.length_sum + jnp.where(
            done, ep_length.astype(jnp.float32), 0.0
        )
        # finished-episode ring writes: each done env scatters its episode
        # stats into consecutive ring slots (not-done envs target an
        # out-of-bounds slot and are dropped — branch-free under vmap/scan)
        K = loop_cfg.episode_ring_size
        finished_before = jnp.cumsum(done.astype(jnp.int32)) - 1
        slot = (carry.ep_ring_ptr[0] + finished_before) % K
        slot = jnp.where(done, slot, K)  # K = out of bounds → mode="drop"
        seq_now = carry.env_steps[0]  # monotonic across iterations
        ep_ring_return = carry.ep_ring_return.at[slot].set(
            ep_return, mode="drop"
        )
        ep_ring_length = carry.ep_ring_length.at[slot].set(
            ep_length.astype(jnp.float32), mode="drop"
        )
        ep_ring_success = carry.ep_ring_success.at[slot].set(
            (done & out.mission_success).astype(jnp.float32), mode="drop"
        )
        ep_ring_seq = carry.ep_ring_seq.at[slot].set(seq_now, mode="drop")
        ep_ring_ptr = (
            carry.ep_ring_ptr + jnp.sum(done.astype(jnp.int32))
        ) % K

        # hierarchical: log (goal, obs-at-selection) with the episode stats;
        # finished envs sample a fresh goal for the new episode
        hier_state = carry.hier
        goal, goal_obs = carry.goal, carry.goal_obs
        ep_ring_goal, ep_ring_goal_obs = carry.ep_ring_goal, carry.ep_ring_goal_obs
        if loop_cfg.use_hierarchical:
            ep_ring_goal = ep_ring_goal.at[slot].set(goal, mode="drop")
            ep_ring_goal_obs = ep_ring_goal_obs.at[slot].set(
                goal_obs, mode="drop"
            )
            fresh_frame = (
                obs_window[:, -1, :]
                if loop_cfg.history_len > 1
                else stacked_next_policy
            )
            k_goal = jax.random.fold_in(k_act, 17)
            fresh_goal = hier_mod.sample_goal(
                hier_state, fresh_frame, k_goal, loop_cfg.hierarchical
            )
            goal = jnp.where(done, fresh_goal, goal)
            goal_obs = jnp.where(done[:, None], fresh_frame, goal_obs)

        ep_return = jnp.where(done, 0.0, ep_return)
        ep_length = jnp.where(done, 0, ep_length)

        new_carry = TrainCarry(
            env_states=env_states,
            obs=stacked_next_policy,
            agent=agent,
            buffer=buffer,
            key=k_next,
            icm=icm_state,
            rnd=rnd_state,
            hier=hier_state,
            goal=goal,
            goal_obs=goal_obs,
            obs_window=obs_window,
            env_steps=carry.env_steps + 1,
            episodes=episodes,
            successes=successes,
            ep_return=ep_return,
            ep_length=ep_length,
            return_sum=return_sum,
            length_sum=length_sum,
            ep_ring_return=ep_ring_return,
            ep_ring_length=ep_ring_length,
            ep_ring_success=ep_ring_success,
            ep_ring_seq=ep_ring_seq,
            ep_ring_ptr=ep_ring_ptr,
            ep_ring_goal=ep_ring_goal,
            ep_ring_goal_obs=ep_ring_goal_obs,
            demo_buffer=carry.demo_buffer,
        )
        reward_mean = jnp.mean(out.reward)
        done_frac = jnp.mean(done.astype(jnp.float32))
        if axis_name is not None:
            reward_mean = jax.lax.pmean(reward_mean, axis_name)
            done_frac = jax.lax.pmean(done_frac, axis_name)
        step_metrics = dict(
            upd_metrics, reward_mean=reward_mean, done_frac=done_frac
        )
        return new_carry, step_metrics

    K = loop_cfg.update_interval
    if loop_cfg.rollout_steps % max(K, 1) != 0:
        raise ValueError(
            f"rollout_steps ({loop_cfg.rollout_steps}) must be a multiple "
            f"of update_interval ({K})"
        )

    # ---- hoisted-bookkeeping fast path (r5 perf result). The act-path
    # probe (scripts/bench_act_path.py) measured the per-step scan BODY —
    # replay ring writes, episode bookkeeping, full-carry threading — as
    # the rollout bound, NOT the actor forward (const-action ablation:
    # 21.1M vs full 20.5M steps/s, while the lean act+env+stack scan runs
    # 43.0M). Here the K-step chunk scans ONLY (env_states, obs, window)
    # through the lean body, stacks per-step outputs, and does replay
    # writes + episode accounting VECTORIZED once per chunk; buffer
    # content at every update point is identical to the per-step path
    # (the chunk's K·N rows land before its update samples, exactly like
    # the sequential writes did), so training semantics are preserved up
    # to PRNG stream layout. Applies to the plain-SAC path; per-step
    # learners (ICM/RND) and hierarchical mode keep the per-step body.
    hoistable = (
        K > 1
        and not loop_cfg.use_hierarchical
        and not loop_cfg.use_curiosity
        and not loop_cfg.use_rnd
        and sac_cfg.buffer_size % (K * loop_cfg.num_envs) == 0
    )
    # default OFF: interleaved same-process A/B on the real chip measured
    # the hoisted program consistently ~9-17% SLOWER than the per-step
    # body (rollout-only 16.4M vs 19.7M, learning-on 11.4M vs 12.4M
    # median steps/s) — XLA already handles the per-step carry/ring writes
    # well, and the stacked-ys materialization + outer chunk scan cost
    # more than the hoist saves (RESULTS r5 act-path section). The path
    # stays available (bit-exact parity-tested) as an opt-in instrument.
    hoisted = False
    if loop_cfg.hoist_bookkeeping:
        if not hoistable:
            raise ValueError(
                "hoist_bookkeeping=True requires update_interval>1, plain "
                "SAC features, and buffer_size divisible by "
                "update_interval*num_envs"
            )
        hoisted = True

    def hoisted_chunk(carry: TrainCarry, _: Any, env_params: EnvParams):
        key = carry.key
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        k_act_all, k_sample_update, k_chain = jax.random.split(key, 3)
        act_keys = jax.random.split(k_act_all, K)
        if axis_name is not None:
            # carry forward the *shared* chain so all shards stay in lockstep
            (k_next,) = jax.random.split(carry.key, 1)
        else:
            k_next = k_chain
        agent = carry.agent

        def sim_step(sc, k_act):
            env_states, obs, window = sc
            actions = act_fn(agent, obs, k_act)
            cur_frame = (
                obs[:, -loop_cfg.obs_dim:]
                if loop_cfg.history_len > 1
                else obs
            )
            if loop_cfg.use_safety_layer:
                actions, _ = apply_safety(
                    cur_frame, actions, loop_cfg.safety
                )
            env_states, out, next_obs = batched_step(
                env_states, actions, env_params
            )
            if loop_cfg.history_len > 1:
                done_now = (out.terminated | out.truncated)[:, None, None]
                shifted = jnp.concatenate(
                    [window[:, 1:], out.obs[:, None, :]], axis=1
                )
                fresh = jnp.tile(
                    next_obs[:, None, :], (1, loop_cfg.history_len, 1)
                )
                window = jnp.where(done_now, fresh, shifted)
                stacked_next_true = shifted.reshape(shifted.shape[0], -1)
                next_policy = window.reshape(window.shape[0], -1)
            else:
                stacked_next_true = out.obs
                next_policy = next_obs
            ys = (
                obs,
                actions,
                out.reward,
                stacked_next_true,
                out.terminated,
                out.truncated,
                out.mission_success,
            )
            return (env_states, next_policy, window), ys

        (env_states, obs, window), ys = jax.lax.scan(
            sim_step,
            (carry.env_states, carry.obs, carry.obs_window),
            act_keys,
        )
        (s_obs, s_act, s_rew, s_next, s_term, s_trunc, s_succ) = ys
        N = loop_cfg.num_envs

        # --- replay: one (K·N)-row time-major block write (identical rows
        # in identical order to K sequential N-row writes)
        transitions = {
            "obs": s_obs.reshape(K * N, -1),
            "action": s_act.reshape(K * N, -1),
            "reward": s_rew.reshape(K * N),
            "next_obs": s_next.reshape(K * N, -1),
            "done": s_term.reshape(K * N).astype(jnp.float32),
        }
        buffer = replay_mod.add_batch(carry.buffer, transitions)

        # --- one update event per chunk (the chunked-cadence contract)
        do_updates, no_updates = make_update_fns(buffer, carry.demo_buffer)
        agent, upd_metrics = jax.lax.cond(
            buffer.size >= sac_cfg.learning_starts,
            do_updates,
            no_updates,
            (agent, k_sample_update),
        )

        # --- episode accounting, fully vectorized over the chunk: the
        # reset-accumulate recurrence ep_t = [reset at done] + reward is a
        # segmented cumsum — computed with cumsum/cummax + one tiny gather
        # along the K axis instead of a sequential scan (the per-step
        # (N,)-array recurrences ARE the measured rollout overhead)
        done_kn = s_term | s_trunc
        succ_kn = done_kn & s_succ
        t_idx = jnp.arange(K, dtype=jnp.int32)[:, None]
        # index of the last done strictly BEFORE step t (-1 = none in chunk)
        done_t = jnp.where(done_kn, t_idx, jnp.int32(-1))
        ldb = jnp.concatenate(
            [
                jnp.full((1, N), -1, jnp.int32),
                jax.lax.cummax(done_t, axis=0)[:-1],
            ],
            axis=0,
        )
        fresh_seg = ldb < 0  # episode started before the chunk
        cum_rew = jnp.cumsum(s_rew, axis=0)
        cum_at_ldb = jnp.take_along_axis(
            cum_rew, jnp.maximum(ldb, 0), axis=0
        )
        # running return INCLUDING step t, before any reset at t
        ring_ret = (
            jnp.where(fresh_seg, carry.ep_return[None, :], 0.0)
            + cum_rew
            - jnp.where(fresh_seg, 0.0, cum_at_ldb)
        )
        # running length: ep0·[no done yet] + (t - ldb)
        ring_len = (
            jnp.where(fresh_seg, carry.ep_length[None, :], 0)
            + (t_idx - ldb)
        ).astype(jnp.float32)
        ep_return = jnp.where(done_kn[-1], 0.0, ring_ret[-1])
        ep_length = jnp.where(
            done_kn[-1], 0, ring_len[-1].astype(jnp.int32)
        )
        episodes = carry.episodes + jnp.sum(done_kn.astype(jnp.int32), 0)
        successes = carry.successes + jnp.sum(succ_kn.astype(jnp.int32), 0)
        return_sum = carry.return_sum + jnp.sum(
            jnp.where(done_kn, ring_ret, 0.0), 0
        )
        length_sum = carry.length_sum + jnp.sum(
            jnp.where(done_kn, ring_len, 0.0), 0
        )

        # --- finished-episode ring: one flat time-major scatter per chunk
        RK = loop_cfg.episode_ring_size
        done_flat = done_kn.reshape(K * N)
        finished_before = jnp.cumsum(done_flat.astype(jnp.int32)) - 1
        slot = (carry.ep_ring_ptr[0] + finished_before) % RK
        slot = jnp.where(done_flat, slot, RK)  # RK = OOB → mode="drop"
        seq = jnp.broadcast_to(
            carry.env_steps[0] + jnp.arange(K)[:, None], (K, N)
        ).reshape(K * N)
        ep_ring_return = carry.ep_ring_return.at[slot].set(
            ring_ret.reshape(K * N), mode="drop"
        )
        ep_ring_length = carry.ep_ring_length.at[slot].set(
            ring_len.reshape(K * N), mode="drop"
        )
        ep_ring_success = carry.ep_ring_success.at[slot].set(
            succ_kn.reshape(K * N).astype(jnp.float32), mode="drop"
        )
        ep_ring_seq = carry.ep_ring_seq.at[slot].set(seq, mode="drop")
        ep_ring_ptr = (
            carry.ep_ring_ptr + jnp.sum(done_flat.astype(jnp.int32))
        ) % RK

        new_carry = carry.replace(
            env_states=env_states,
            obs=obs,
            agent=agent,
            buffer=buffer,
            key=k_next,
            obs_window=window,
            env_steps=carry.env_steps + K,
            episodes=episodes,
            successes=successes,
            ep_return=ep_return,
            ep_length=ep_length,
            return_sum=return_sum,
            length_sum=length_sum,
            ep_ring_return=ep_ring_return,
            ep_ring_length=ep_ring_length,
            ep_ring_success=ep_ring_success,
            ep_ring_seq=ep_ring_seq,
            ep_ring_ptr=ep_ring_ptr,
        )
        reward_mean = jnp.mean(s_rew)
        done_frac = jnp.mean(done_kn.astype(jnp.float32))
        if axis_name is not None:
            reward_mean = jax.lax.pmean(reward_mean, axis_name)
            done_frac = jax.lax.pmean(done_frac, axis_name)
        metrics = dict(
            upd_metrics, reward_mean=reward_mean, done_frac=done_frac
        )
        return new_carry, metrics

    def train_iteration(carry: TrainCarry, env_params: EnvParams):
        iter_start = carry.env_steps[0]
        if hoisted:
            carry, metrics = jax.lax.scan(
                lambda c, x: hoisted_chunk(c, x, env_params),
                carry,
                None,
                length=loop_cfg.rollout_steps // K,
            )
            metrics = jax.tree.map(jnp.mean, metrics)
        elif K <= 1:
            carry, metrics = jax.lax.scan(
                lambda c, x: env_and_learn_step(c, x, env_params),
                carry,
                None,
                length=loop_cfg.rollout_steps,
            )
            metrics = jax.tree.map(jnp.mean, metrics)
        else:
            # chunked cadence: K-1 sim-only steps, then one learning step —
            # update metrics come from the learning step alone (zeros from
            # sim-only steps would dilute them), env metrics average over
            # the whole chunk
            def chunk(c, _):
                c, sim_metrics = jax.lax.scan(
                    lambda cc, x: env_and_learn_step(
                        cc, x, env_params, learn=False
                    ),
                    c,
                    None,
                    length=K - 1,
                )
                c, learn_metrics = env_and_learn_step(c, None, env_params)
                merged = dict(learn_metrics)
                for name in ("reward_mean", "done_frac"):
                    merged[name] = (
                        jnp.sum(sim_metrics[name]) + learn_metrics[name]
                    ) / K
                return c, merged

            carry, metrics = jax.lax.scan(
                chunk, carry, None, length=loop_cfg.rollout_steps // K
            )
            metrics = jax.tree.map(jnp.mean, metrics)
        if loop_cfg.use_hierarchical:
            # REINFORCE on THIS iteration's finished episodes (on-policy for
            # the goal policy; older ring entries are masked out)
            mask = (carry.ep_ring_seq >= iter_start).astype(jnp.float32)
            hier_state, hier_metrics = hier_mod.update_high_masked(
                carry.hier,
                carry.ep_ring_goal_obs,
                carry.ep_ring_goal,
                carry.ep_ring_return,
                mask,
                loop_cfg.hierarchical,
                axis_name=axis_name,
            )
            carry = carry.replace(hier=hier_state)
            metrics = dict(metrics, **hier_metrics)
        return carry, metrics

    train_iteration.hoisted = hoisted  # introspection for tests/benchmarks
    return train_iteration


def drain_episodes(
    carry: TrainCarry, last_seq: int
) -> tuple[list[tuple[float, int, bool]], int]:
    """Pull finished episodes newer than ``last_seq`` from the on-device ring.

    Returns ``(episodes, new_last_seq)`` with episodes as
    ``(return, length, success)`` in completion order — the per-episode feed
    the reward-hacking detector's window statistics need
    (ref scripts/train.py:101-171 windows 100 *episodes*, not iteration
    means). Works on sharded carries: ring leaves are concatenated across
    shards by the device→host gather.

    Ring overflow (more episodes finished since the last drain than the ring
    holds) silently keeps only the most recent ``episode_ring_size`` per
    shard — acceptable for a rolling-window detector.
    """
    import numpy as np

    rets = np.asarray(jax.device_get(carry.ep_ring_return)).ravel()
    lens = np.asarray(jax.device_get(carry.ep_ring_length)).ravel()
    succ = np.asarray(jax.device_get(carry.ep_ring_success)).ravel()
    seq = np.asarray(jax.device_get(carry.ep_ring_seq)).ravel()
    new = seq > last_seq
    if not new.any():
        return [], last_seq
    order = np.argsort(seq[new], kind="stable")
    episodes = [
        (float(r), int(l), bool(s > 0.5))
        for r, l, s in zip(rets[new][order], lens[new][order], succ[new][order])
    ]
    return episodes, int(seq.max())


def summarize(carry: TrainCarry) -> dict[str, float]:
    """Host-side snapshot of the on-device counters (one transfer).

    Works on both single-host and mesh-sharded carries: counters are (N,)
    per-env arrays, so summing pulls the global totals regardless of layout.
    """
    eps = max(int(jnp.sum(carry.episodes)), 1)
    return {
        "env_steps": int(jnp.sum(carry.env_steps)),
        "episodes": int(jnp.sum(carry.episodes)),
        "success_rate": float(jnp.sum(carry.successes)) / eps,
        "mean_episode_return": float(jnp.sum(carry.return_sum)) / eps,
        "mean_episode_length": float(jnp.sum(carry.length_sum)) / eps,
        "buffer_size": int(carry.buffer.size),
    }
