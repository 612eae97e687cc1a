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
@pytest.mark.slow
def test_update_interval_chunked_cadence():
    """update_interval=K fires exactly rollout/K update events (each of
    updates_per_step gradient steps) and still learns; K must divide
    rollout_steps."""
    env_params = EnvParams()
    sac_cfg = SACConfig(
        hidden_dims=(32, 32), batch_size=64, buffer_size=2048, learning_starts=32
    )
    loop_cfg = loop_mod.TrainLoopConfig(
        num_envs=8, rollout_steps=16, updates_per_step=2, update_interval=4
    )
    carry = loop_mod.init_carry(jax.random.PRNGKey(0), env_params, sac_cfg, loop_cfg)
    it = jax.jit(loop_mod.make_train_iteration(sac_cfg, loop_cfg))

    carry, _ = it(carry, env_params)  # fills the buffer past learning_starts
    steps_after_first = int(carry.agent.step)
    p0 = jax.tree.leaves(carry.agent.actor_params)
    carry, metrics = it(carry, env_params)
    # one full iteration past learning_starts: (16/4) events × 2 updates
    assert int(carry.agent.step) - steps_after_first == (16 // 4) * 2
    assert int(jnp.sum(carry.env_steps)) == 8 * 32
    p1 = jax.tree.leaves(carry.agent.actor_params)
    assert any(not np.allclose(a, b) for a, b in zip(p0, p1))
    for k in ("critic_loss", "actor_loss", "reward_mean", "done_frac"):
        assert np.isfinite(float(metrics[k])), k

    with pytest.raises(ValueError, match="multiple"):
        loop_mod.make_train_iteration(
            sac_cfg,
            loop_mod.TrainLoopConfig(
                num_envs=8, rollout_steps=16, update_interval=5
            ),
        )


@pytest.mark.integration
@pytest.mark.slow
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


@pytest.mark.integration
@pytest.mark.slow
def test_history_conditioned_loop():
    """history_len=3: the policy sees stacked observations; the window
    shifts each step and refills on episode reset."""
    env_params = EnvParams(max_episode_steps=5)
    sac_cfg = SACConfig(
        hidden_dims=(16, 16), batch_size=8, buffer_size=512, learning_starts=32
    )
    loop_cfg = loop_mod.TrainLoopConfig(
        num_envs=4, rollout_steps=12, history_len=3
    )
    carry = loop_mod.init_carry(jax.random.PRNGKey(0), env_params, sac_cfg, loop_cfg)
    assert carry.obs.shape == (4, 30)  # 3 × 10-D obs flattened
    assert carry.obs_window.shape == (4, 3, 10)
    # initial window = first obs tiled
    assert np.allclose(carry.obs_window[:, 0], carry.obs_window[:, 2])
    it = jax.jit(loop_mod.make_train_iteration(sac_cfg, loop_cfg))
    carry, metrics = it(carry, env_params)
    assert np.isfinite(float(metrics["reward_mean"]))
    # with 5-step episodes and 12 steps rolled, every env reset at least once;
    # windows hold 3 DIFFERENT frames mid-episode (progress dim differs)
    w = np.asarray(carry.obs_window)
    assert w.shape == (4, 3, 10)
    # replay stores stacked obs
    assert carry.buffer.data["obs"].shape[-1] == 30
    # agent params sized for stacked input
    kernel = jax.tree.leaves(carry.agent.actor_params)[0]
    # (find the hidden_0 kernel: input dim 30)
    from flax import traverse_util

    flat = traverse_util.flatten_dict(carry.agent.actor_params["params"])
    assert flat[("hidden_0", "kernel")].shape[0] == 30


@pytest.mark.integration
def test_episode_ring_collects_per_episode_stats():
    """The on-device finished-episode ring feeds the hacking detector real
    per-episode samples (ref scripts/train.py:101-171 window semantics)."""
    env_params = EnvParams(max_episode_steps=5)
    sac_cfg = SACConfig(
        hidden_dims=(16, 16), batch_size=8, buffer_size=512, learning_starts=1024
    )
    loop_cfg = loop_mod.TrainLoopConfig(
        num_envs=4, rollout_steps=11, episode_ring_size=32
    )
    carry = loop_mod.init_carry(jax.random.PRNGKey(0), env_params, sac_cfg, loop_cfg)
    it = jax.jit(loop_mod.make_train_iteration(sac_cfg, loop_cfg))
    carry, _ = it(carry, env_params)

    episodes, last_seq = loop_mod.drain_episodes(carry, -1)
    # 11 steps of 5-step episodes over 4 envs → 2 completions per env = 8
    assert len(episodes) == 8
    assert all(length == 5 for _, length, _ in episodes)
    assert all(np.isfinite(ret) for ret, _, _ in episodes)
    # per-episode returns are NOT one aggregate: they differ across envs
    rets = [ret for ret, _, _ in episodes]
    assert len(set(np.round(rets, 6))) > 1
    assert last_seq == 9  # last completion at env-step counter 9 (0-based)

    # drain is incremental: nothing new until more episodes finish
    again, seq2 = loop_mod.drain_episodes(carry, last_seq)
    assert again == [] and seq2 == last_seq
    carry, _ = it(carry, env_params)
    more, seq3 = loop_mod.drain_episodes(carry, last_seq)
    assert len(more) == 8 and seq3 > last_seq

    # detector consumes the drained stream directly
    from tvc_ai_tpu.training.hacking import RewardHackingDetector

    det = RewardHackingDetector(window_size=16)
    for ret, length, success in episodes + more:
        det.add_episode(reward=ret, success=success, length=length)
    report = det.detect_hacking()
    assert 0.0 <= report.score <= 1.0


@pytest.mark.integration
def test_survival_normalized_success_bonus():
    """The opt-in incentive fix pays (recent per-step reward) x (remaining
    steps) on the FIRST success step, making success dominate edge-hovering."""
    import dataclasses as dc

    from tvc_ai_tpu.env import rocket_env
    from tvc_ai_tpu.env.types import RewardConfig, SuccessConfig

    # success window trivially satisfiable from the nominal reset pose
    easy_success = SuccessConfig(
        max_tilt_angle=jnp.float32(1.0),
        max_angular_velocity=jnp.float32(10.0),
        max_horizontal_velocity=jnp.float32(10.0),
        max_vertical_velocity=jnp.float32(10.0),
        min_altitude=jnp.float32(0.0),
        max_altitude=jnp.float32(10.0),
        success_duration=1,
    )
    params_off = EnvParams(success=easy_success, max_episode_steps=1000)
    params_on = dc.replace(
        params_off, reward=RewardConfig(survival_normalized_success=True)
    )
    state_off, _ = rocket_env.reset(jax.random.PRNGKey(0), params_off)
    # seed the rolling reward window with a known per-step level
    state_off = state_off.replace(
        reward_window=jnp.full(10, 50.0, jnp.float32),
        reward_window_len=jnp.int32(10),
    )
    action = jnp.zeros(2, jnp.float32)
    new_state_off, out_off = rocket_env.step(state_off, action, params_off)
    _, out_on = rocket_env.step(state_off, action, params_on)
    assert bool(out_on.mission_success) and bool(out_on.terminated)
    bonus = float(out_on.reward) - float(out_off.reward)
    # payout = mean of the updated rolling window x remaining 999 steps
    # (the window tracks the base step reward — read it from the off run,
    # whose window update is identical)
    window_mean = float(jnp.sum(new_state_off.reward_window)) / 10.0
    assert window_mean > 0.0
    assert bonus == pytest.approx(max(window_mean, 0.0) * 999.0, rel=1e-4)
    # paid exactly once: an already-successful state gets no further bonus
    state_succ = state_off.replace(mission_success=jnp.bool_(True))
    _, out_again = rocket_env.step(state_succ, action, params_on)
    _, out_again_off = rocket_env.step(state_succ, action, params_off)
    assert float(out_again.reward) == pytest.approx(
        float(out_again_off.reward), rel=1e-6
    )
    # survival_success_scale multiplies the payout (the window covers the
    # reward-depressed descent phase, so >1 keeps success strictly dominant)
    params_scaled = dc.replace(
        params_off,
        reward=RewardConfig(
            survival_normalized_success=True,
            survival_success_scale=jnp.float32(2.0),
        ),
    )
    _, out_scaled = rocket_env.step(state_off, action, params_scaled)
    bonus_scaled = float(out_scaled.reward) - float(out_off.reward)
    assert bonus_scaled == pytest.approx(2.0 * bonus, rel=1e-4)


def test_hoisted_chunk_parity_with_per_step_path():
    """The hoisted-bookkeeping chunk path (update_interval K>1, r5 perf
    restructure) must produce EXACTLY the per-step path's env trajectory,
    replay rows (same order), episode counters, and finished-episode ring
    when the act path is deterministic and updates are gated off — the
    two programs differ only in where bookkeeping runs, never in what it
    computes. (PRNG layout differs, so the comparison pins everything
    except carry.key.)"""
    import dataclasses

    env_params = EnvParams()
    sac_cfg = SACConfig(
        hidden_dims=(16, 16),
        buffer_size=8 * 8 * 4,      # multiple of K*N and of N
        learning_starts=10**9,      # updates never execute
        batch_size=16,
    )
    base = loop_mod.TrainLoopConfig(
        num_envs=8,
        rollout_steps=8,
        updates_per_step=1,
        episode_ring_size=16,
    )

    def det_act(agent, obs, key):
        del agent, key
        # constant non-trivial gimbal so episodes actually evolve/terminate
        return jnp.tile(jnp.array([[0.3, -0.1]]), (obs.shape[0], 1))

    cfg_k4 = dataclasses.replace(
        base, update_interval=4, hoist_bookkeeping=True
    )
    cfg_k1 = dataclasses.replace(base, update_interval=1)
    it4 = loop_mod.make_train_iteration(sac_cfg, cfg_k4, act_fn=det_act)
    it1 = loop_mod.make_train_iteration(sac_cfg, cfg_k1, act_fn=det_act)
    assert it4.hoisted and not it1.hoisted

    key = jax.random.PRNGKey(3)
    carry0 = loop_mod.init_carry(key, env_params, sac_cfg, base)
    c4, m4 = jax.jit(it4)(carry0, env_params)
    c1, m1 = jax.jit(it1)(carry0, env_params)

    def cmp(a, b, name):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6), name

    cmp(c4.obs, c1.obs, "obs")
    for leaf_a, leaf_b in zip(
        jax.tree.leaves(c4.env_states.body), jax.tree.leaves(c1.env_states.body)
    ):
        cmp(leaf_a, leaf_b, "env body state")
    for k in c4.buffer.data:
        cmp(c4.buffer.data[k], c1.buffer.data[k], f"buffer[{k}]")
    assert int(c4.buffer.size) == int(c1.buffer.size) == 8 * 8
    assert int(c4.buffer.ptr) == int(c1.buffer.ptr)
    for name in (
        "episodes", "successes", "ep_return", "ep_length",
        "return_sum", "length_sum", "ep_ring_return", "ep_ring_length",
        "ep_ring_success", "ep_ring_seq", "ep_ring_ptr", "env_steps",
    ):
        cmp(getattr(c4, name), getattr(c1, name), name)
    cmp(m4["reward_mean"], m1["reward_mean"], "reward_mean")
    cmp(m4["done_frac"], m1["done_frac"], "done_frac")


@pytest.mark.integration
@pytest.mark.slow
def test_hierarchical_training_mode():
    """use_hierarchical: SAC low level on [obs || goal-onehot]; high level
    takes REINFORCE steps from finished-episode returns (the training path
    the reference's HierarchicalAgent never had, ref :353-417)."""
    env_params = EnvParams(max_episode_steps=6)
    sac_cfg = SACConfig(
        hidden_dims=(16, 16), batch_size=8, buffer_size=512, learning_starts=16
    )
    loop_cfg = loop_mod.TrainLoopConfig(
        num_envs=4, rollout_steps=14, use_hierarchical=True
    )
    carry = loop_mod.init_carry(jax.random.PRNGKey(0), env_params, sac_cfg, loop_cfg)
    assert carry.hier is not None
    assert carry.goal.shape == (4,)
    # low level sized for obs + 4-goal onehot
    assert loop_mod.policy_obs_dim(loop_cfg) == 14
    assert carry.buffer.data["obs"].shape[-1] == 14

    it = jax.jit(loop_mod.make_train_iteration(sac_cfg, loop_cfg))
    h0 = jax.tree.leaves(carry.hier.params)[0].copy()
    carry, metrics = it(carry, env_params)
    assert np.isfinite(float(metrics["reward_mean"]))
    assert "high_level_loss" in metrics
    # episodes finished (6-step cap, 14 steps rolled) -> high level stepped
    assert int(carry.hier.step) == 1
    h1 = jax.tree.leaves(carry.hier.params)[0]
    assert not np.allclose(h0, h1)
    # goals live in [0, num_goals)
    g = np.asarray(carry.goal)
    assert ((g >= 0) & (g < 4)).all()
    # goal ring recorded finished episodes
    assert (np.asarray(carry.ep_ring_seq) >= 0).sum() == 8

    # hierarchical evaluation runs end-to-end
    from tvc_ai_tpu.eval.rollout import make_hier_eval_fn, summarize_stats

    eval_fn = jax.jit(
        make_hier_eval_fn(sac_cfg, loop_cfg.hierarchical, 4)
    )
    stats = eval_fn(
        (carry.agent, carry.hier), jax.random.PRNGKey(1), env_params
    )
    out = summarize_stats(stats)
    assert np.isfinite(out["eval_reward_mean"])
