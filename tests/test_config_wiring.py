"""Config → behavior wiring: every documented YAML toggle provably changes
what the compiled training program does.

This is the gap class SURVEY §2.5 diagnosed in the reference (features
configured but dormant: stability manager initialized and never stepped,
curriculum stage conditions never applied, `ent_coef: auto` describing absent
code). Each test here builds a FrameworkConfig from a plain dict — exactly
what the YAML front-end produces — and asserts the flag reaches the fused
loop / SAC update and changes its behavior.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvc_ai_tpu.agents import sac as sac_mod
from tvc_ai_tpu.config.build import (
    build_env_params,
    build_loop_config,
    build_sac_config,
)
from tvc_ai_tpu.config.schema import FrameworkConfig
from tvc_ai_tpu.training import loop as loop_mod

SMALL = {
    "training": {"num_envs": 4, "rollout_steps": 8, "total_timesteps": 100},
    "algorithms": {
        "sac": {
            "batch_size": 8,
            "buffer_size": 256,
            "learning_starts": 8,
            "hidden_dims": [16, 16],
        }
    },
    # keep the baseline deterministic-ish: extensions off unless a test
    # turns one on
    "safety": {"enabled": False},
}


def _cfg(**overrides) -> FrameworkConfig:
    data = {**{k: dict(v) for k, v in SMALL.items()}}
    for key, val in overrides.items():
        cur = data.setdefault(key, {})
        if isinstance(val, dict):
            cur.update(val)
        else:
            data[key] = val
    return FrameworkConfig.from_dict(data)


def _run_one_iteration(cfg: FrameworkConfig, seed: int = 0):
    lc = build_loop_config(cfg)
    sc = build_sac_config(cfg)
    ep = build_env_params(cfg)
    carry = loop_mod.init_carry(jax.random.PRNGKey(seed), ep, sc, lc)
    it = jax.jit(loop_mod.make_train_iteration(sc, lc))
    carry, metrics = it(carry, ep)
    return carry, metrics


def test_build_loop_config_maps_extension_flags():
    cfg = _cfg(
        exploration={
            "curiosity": {"enabled": True, "reward_scale": 0.02, "lr": 2e-4},
            "random_network_distillation": {
                "enabled": True,
                "network_size": [64, 32],
                "update_frequency": 50,
            },
        },
        safety={"enabled": True, "constraints": {"max_tilt": 0.4}},
        physics_informed={"enabled": True, "physics_loss_weight": 0.2},
        network={"history_len": 4},
    )
    lc = build_loop_config(cfg)
    assert lc.use_curiosity and lc.curiosity.reward_scale == 0.02
    assert lc.curiosity.lr == 2e-4
    assert lc.use_rnd and lc.rnd.hidden_dims == (64, 32)
    assert lc.rnd.update_frequency == 50
    assert lc.use_safety_layer and lc.safety.max_tilt == 0.4
    assert lc.use_physics_informed
    assert lc.physics_informed.physics_weight == 0.2
    assert lc.history_len == 4


def test_defaults_match_reference_live_path():
    """Default config = reference live behavior: safety layer ON at act time
    (agent/multi_algorithm_agent.py:784-786 runs it unconditionally in the
    live loop), curiosity/RND opt-in (config default false)."""
    cfg = FrameworkConfig()
    lc = build_loop_config(cfg)
    assert lc.use_safety_layer          # safety.enabled: true in ref config
    assert not lc.use_curiosity
    assert not lc.use_rnd
    assert lc.history_len == 1


@pytest.mark.integration
def test_curiosity_flag_changes_training_reward():
    """ICM on adds an intrinsic bonus to every step's reward."""
    cfg_off = _cfg()
    cfg_on = _cfg(exploration={"curiosity": {"enabled": True}})
    carry_off, m_off = _run_one_iteration(cfg_off)
    carry_on, m_on = _run_one_iteration(cfg_on)
    assert carry_off.icm is None and carry_on.icm is not None
    assert int(carry_on.icm.step) > 0  # ICM actually trained
    # identical seed/env stream; only the intrinsic bonus separates rewards
    # in the replay buffer (loop metrics report the raw env reward)
    assert not np.allclose(
        np.asarray(carry_on.buffer.data["reward"][:32]),
        np.asarray(carry_off.buffer.data["reward"][:32]),
    )


@pytest.mark.integration
@pytest.mark.slow
def test_rnd_flag_trains_predictor_and_shapes_reward():
    cfg_off = _cfg()
    cfg_on = _cfg(
        exploration={
            "random_network_distillation": {"enabled": True, "update_frequency": 4}
        }
    )
    carry_off, _ = _run_one_iteration(cfg_off)
    carry_on, _ = _run_one_iteration(cfg_on)
    assert carry_off.rnd is None and carry_on.rnd is not None
    # 8 rollout steps / update_frequency 4 → predictor stepped (env_steps 0,4)
    assert int(carry_on.rnd.step) == 2
    assert not np.allclose(
        np.asarray(carry_on.buffer.data["reward"][:32]),
        np.asarray(carry_off.buffer.data["reward"][:32]),
    )


@pytest.mark.integration
@pytest.mark.slow
def test_safety_flag_projects_unsafe_actions():
    """With envs initialized beyond max_tilt, the CBF projection replaces
    policy actions → the stored replay actions differ from the unsafe run."""
    unsafe_init = {
        "env": {
            "domain_randomization": {
                "enabled": True,
                "init_tilt_max": 0.7,  # beyond the 0.52 rad constraint
            }
        }
    }
    cfg_off = _cfg(**unsafe_init)
    cfg_on = _cfg(safety={"enabled": True}, **unsafe_init)
    carry_off, _ = _run_one_iteration(cfg_off)
    carry_on, _ = _run_one_iteration(cfg_on)
    a_off = np.asarray(carry_off.buffer.data["action"][:32])
    a_on = np.asarray(carry_on.buffer.data["action"][:32])
    assert not np.allclose(a_on, a_off)


@pytest.mark.integration
@pytest.mark.slow
def test_physics_informed_flag_regularizes_icm():
    """physics_informed.enabled changes the ICM forward-model gradients."""
    base = {"exploration": {"curiosity": {"enabled": True}}}
    cfg_plain = _cfg(**base)
    cfg_phys = _cfg(physics_informed={"enabled": True}, **base)
    carry_plain, _ = _run_one_iteration(cfg_plain)
    carry_phys, _ = _run_one_iteration(cfg_phys)
    p0 = jax.tree.leaves(carry_plain.icm.params)
    p1 = jax.tree.leaves(carry_phys.icm.params)
    assert any(not np.allclose(a, b) for a, b in zip(p0, p1))


@pytest.mark.integration
@pytest.mark.slow
def test_history_flag_stacks_policy_input():
    cfg = _cfg(network={"history_len": 3})
    carry, metrics = _run_one_iteration(cfg)
    assert carry.obs.shape == (4, 30)
    assert carry.buffer.data["obs"].shape[-1] == 30
    assert np.isfinite(float(metrics["reward_mean"]))


def test_stability_lr_schedule_reaches_optimizer():
    """enable_lr_scheduling + scheduler_type drive the compiled update's LR:
    a linear schedule over 2 total steps decays the LR to 0, freezing the
    actor, while the constant default keeps moving it."""
    cfg_sched = _cfg(
        stability={"enable_lr_scheduling": True, "scheduler_type": "linear"}
    )
    sc = build_sac_config(cfg_sched)
    assert sc.lr_schedule == "linear"
    sc_off = build_sac_config(_cfg())
    assert sc_off.lr_schedule == "constant"

    sc = dataclasses.replace(sc, schedule_total_steps=2, hidden_dims=(16, 16))
    sc_off = dataclasses.replace(sc_off, hidden_dims=(16, 16))
    key = jax.random.PRNGKey(0)
    batch = {
        "obs": jax.random.normal(key, (8, 10)),
        "action": jnp.zeros((8, 2)),
        "reward": jnp.ones((8,)),
        "next_obs": jax.random.normal(key, (8, 10)),
        "done": jnp.zeros((8,)),
    }

    def run(cfg, n):
        st = sac_mod.init(jax.random.PRNGKey(1), 10, 2, cfg)
        deltas = []
        for i in range(n):
            prev = jax.tree.leaves(st.actor_params)
            st, _ = sac_mod.update(st, batch, jax.random.fold_in(key, i), cfg, 10, 2)
            cur = jax.tree.leaves(st.actor_params)
            deltas.append(
                max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                    for a, b in zip(prev, cur))
            )
        return deltas

    deltas_sched = run(sc, 4)
    deltas_const = run(sc_off, 4)
    # after the 2-step linear schedule hits zero, actor updates vanish
    assert deltas_sched[3] < 1e-7, deltas_sched
    assert deltas_const[3] > 1e-7, deltas_const


def test_stability_adaptive_tau_reaches_update():
    cfg = _cfg(stability={"adaptive_tau": True})
    sc = build_sac_config(cfg)
    assert sc.adaptive_tau
    t0 = float(sac_mod.effective_tau(sc, jnp.int32(0)))
    t1k = float(sac_mod.effective_tau(sc, jnp.int32(1000)))
    assert t0 == pytest.approx(sc.tau_max)
    assert t1k < t0
    sc_off = build_sac_config(_cfg())
    assert float(sac_mod.effective_tau(sc_off, jnp.int32(1000))) == pytest.approx(
        sc_off.tau
    )


@pytest.mark.integration
def test_eval_rollout_history_len():
    """Evaluation feeds the policy the same stacked window as training."""
    from tvc_ai_tpu.eval.rollout import make_eval_fn, summarize_stats

    cfg = _cfg(network={"history_len": 3})
    lc = build_loop_config(cfg)
    sc = build_sac_config(cfg)
    ep = build_env_params(cfg)
    agent = sac_mod.init(jax.random.PRNGKey(0), 30, 2, sc)
    eval_fn = jax.jit(make_eval_fn(sc, 4, history_len=lc.history_len))
    stats = eval_fn(agent, jax.random.PRNGKey(1), ep)
    out = summarize_stats(stats)
    assert np.isfinite(out["eval_reward_mean"])
    assert 0.0 <= out["eval_success_rate"] <= 1.0


def test_enhanced_env_curiosity_flag_honored():
    """enable_curiosity adds the reference's in-env intrinsic bonus
    (env/enhanced_rocket_tvc_env.py:496-502)."""
    from tvc_ai_tpu.env.wrappers import EnhancedRocketTVCEnv

    env_on = EnhancedRocketTVCEnv(enable_curiosity=True, seed=3)
    env_off = EnhancedRocketTVCEnv(enable_curiosity=False, seed=3)
    env_on.reset(seed=5)
    env_off.reset(seed=5)
    a = np.array([0.1, -0.1], np.float32)
    _, r_on, _, _, info_on = env_on.step(a)
    _, r_off, _, _, info_off = env_off.step(a)
    assert "intrinsic_reward" in info_on
    assert "intrinsic_reward" not in info_off
    assert r_on == pytest.approx(r_off + info_on["intrinsic_reward"], rel=1e-5)
    assert info_on["intrinsic_reward"] > 0.0


@pytest.mark.integration
@pytest.mark.slow
def test_hierarchical_flag_from_config():
    """hierarchical_rl.enabled reaches the fused loop: goal-conditioned low
    level + trainable high level."""
    cfg = _cfg(hierarchical_rl={"enabled": True, "num_goals": 4})
    lc = build_loop_config(cfg)
    assert lc.use_hierarchical and lc.hierarchical.num_goals == 4
    carry, metrics = _run_one_iteration(cfg)
    assert carry.hier is not None and carry.goal is not None
    assert "high_level_loss" in metrics
    assert carry.buffer.data["obs"].shape[-1] == 14  # 10-D obs + 4 goals
