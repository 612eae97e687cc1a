"""Tests for model extensions: transformer, safety, hierarchical, ICM, physics loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvc_ai_tpu.agents.physics_informed import (
    PhysicsInformedConfig,
    make_icm_physics_loss,
    physics_informed_loss,
)
from tvc_ai_tpu.env.types import OBS_DIM
from tvc_ai_tpu.models import curiosity as icm
from tvc_ai_tpu.models import hierarchical as hier
from tvc_ai_tpu.models.safety import (
    SafetyConstraints,
    SafetyCorrectionNet,
    apply_safety,
    correction_loss,
    violations,
)
from tvc_ai_tpu.models.transformer import TransformerPolicyNetwork


def upright_obs(batch=4):
    obs = np.zeros((batch, OBS_DIM), np.float32)
    obs[:, 3] = 1.0  # identity quat
    obs[:, 7] = 1.0  # fuel
    return jnp.asarray(obs)


def tilted_obs(batch=4, pitch=0.8):
    from tvc_ai_tpu.physics import quaternion as quat

    q = quat.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.asarray(pitch))
    obs = np.zeros((batch, OBS_DIM), np.float32)
    obs[:, :4] = np.asarray(q)
    obs[:, 7] = 1.0
    return jnp.asarray(obs)


# ------------------------------------------------------------- transformer


def test_transformer_forward_shapes():
    net = TransformerPolicyNetwork(action_dim=2, num_layers=2, d_model=64,
                                   head_hidden_dims=(64, 64))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((3, OBS_DIM)))
    mean, log_std, value = net.apply(params, jnp.ones((3, OBS_DIM)))
    assert mean.shape == (3, 2)
    assert log_std.shape == (3, 2)
    assert value.shape == (3,)
    assert np.all(np.asarray(log_std) >= -20) and np.all(np.asarray(log_std) <= 2)


def test_transformer_sequence_mode():
    net = TransformerPolicyNetwork(action_dim=2, num_layers=1, d_model=32,
                                   head_hidden_dims=(32,))
    seq_obs = jnp.ones((2, 5, OBS_DIM))
    params = net.init(jax.random.PRNGKey(0), seq_obs)
    mean, _, _ = net.apply(params, seq_obs)
    assert mean.shape == (2, 2)
    # history must influence the output (causally pooled last token)
    seq2 = seq_obs.at[:, 0, :].set(5.0)
    mean2, _, _ = net.apply(params, seq2)
    assert not np.allclose(mean, mean2)


# ------------------------------------------------------------------ safety


def test_safety_passthrough_when_safe():
    obs = upright_obs()
    action = jnp.full((4, 2), 0.3)
    safe, mask = apply_safety(obs, action, SafetyConstraints())
    assert not np.any(np.asarray(mask))
    assert np.allclose(safe, action)


def test_safety_intervenes_on_tilt():
    obs = tilted_obs(pitch=0.8)  # > 0.52 limit
    action = jnp.full((4, 2), 0.2)
    safe, mask = apply_safety(obs, action, SafetyConstraints())
    assert np.all(np.asarray(mask))
    assert not np.allclose(safe, action)
    # stabilizing command pushes against positive pitch → negative gimbal[0]
    assert np.all(np.asarray(safe)[:, 0] < 0)


def test_safety_rescales_effort():
    obs = upright_obs()
    action = jnp.full((4, 2), 1.0)  # ‖a‖ = √2 > 1
    safe, mask = apply_safety(obs, action, SafetyConstraints())
    assert np.all(np.asarray(mask))
    norms = np.linalg.norm(np.asarray(safe), axis=-1)
    assert np.all(norms <= 1.0 + 1e-5)


def test_safety_correction_net_trains():
    import optax

    net = SafetyCorrectionNet()
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, OBS_DIM)), jnp.zeros((1, 2))
    )
    obs = tilted_obs(batch=16)
    action = jax.random.uniform(jax.random.PRNGKey(1), (16, 2), minval=-1, maxval=1)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    loss0 = correction_loss(net, params, obs, action, SafetyConstraints())
    for _ in range(50):
        grads = jax.grad(
            lambda p: correction_loss(net, p, obs, action, SafetyConstraints())
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        import optax as _o

        params = _o.apply_updates(params, updates)
    loss1 = correction_loss(net, params, obs, action, SafetyConstraints())
    assert float(loss1) < float(loss0)


# ------------------------------------------------------------ hierarchical


@pytest.mark.slow
def test_hierarchical_goal_and_action():
    cfg = hier.HierarchicalConfig(d_model=32, num_layers=1)
    state = hier.init(jax.random.PRNGKey(0), OBS_DIM, 2, cfg)
    obs = upright_obs(8)
    goals = hier.select_goal(state, obs, jax.random.PRNGKey(1), cfg)
    assert goals.shape == (8,)
    assert np.all(np.asarray(goals) >= 0) and np.all(
        np.asarray(goals) < cfg.num_goals
    )
    mean, log_std, value = hier.get_action(state, obs, goals, cfg)
    assert mean.shape == (8, 2) and value.shape == (8,)


def test_hierarchical_high_level_trains():
    cfg = hier.HierarchicalConfig(d_model=32, num_layers=1)
    state = hier.init(jax.random.PRNGKey(0), OBS_DIM, 2, cfg)
    obs = upright_obs(16)
    goals = jnp.zeros(16, jnp.int32)
    returns = jnp.ones(16) * 10.0
    p0 = jax.tree.leaves(state.high_params)
    state, metrics = hier.update_high_level(state, obs, goals, returns, cfg)
    p1 = jax.tree.leaves(state.high_params)
    assert any(not np.allclose(a, b) for a, b in zip(p0, p1))
    assert np.isfinite(float(metrics["high_level_loss"]))
    assert float(state.baseline) > 0


# -------------------------------------------------------------------- ICM


def test_icm_reward_decays_with_training():
    cfg = icm.CuriosityConfig()
    state = icm.init(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    obs = jax.random.normal(key, (64, 8))
    action = jax.random.uniform(key, (64, 2), minval=-1, maxval=1)
    next_obs = obs + 0.01 * jnp.concatenate([action, action, action, action], -1)
    r0 = float(jnp.mean(icm.intrinsic_reward(state, obs, action, next_obs, cfg)))
    update = jax.jit(lambda s: icm.update(s, obs, action, next_obs, cfg)[0])
    for _ in range(100):
        state = update(state)
    r1 = float(jnp.mean(icm.intrinsic_reward(state, obs, action, next_obs, cfg)))
    assert r1 < r0  # familiar transitions become boring


def test_icm_with_physics_loss():
    cfg = icm.CuriosityConfig()
    state = icm.init(jax.random.PRNGKey(0), cfg)
    obs = jax.random.normal(jax.random.PRNGKey(1), (8, 8))
    action = jnp.zeros((8, 2))
    next_obs = obs
    state, metrics = icm.update(
        state, obs, action, next_obs, cfg,
        physics_loss_fn=make_icm_physics_loss(),
    )
    assert float(metrics["icm_physics_loss"]) >= 0.0
    assert np.isfinite(float(metrics["icm_loss"]))


# ---------------------------------------------------------- physics loss


def test_physics_loss_zero_for_consistent_transition():
    """A transition obeying the reference's consistency model scores ~0."""
    b = 4
    quat = jnp.tile(jnp.array([0.0, 0, 0, 1.0]), (b, 1))
    omega = jnp.ones((b, 3)) * 0.2
    action = jnp.zeros((b, 2))
    states = jnp.concatenate([quat, omega, jnp.ones((b, 3))], axis=-1)
    next_states = states  # zero action → ω unchanged, energy unchanged
    total, losses = physics_informed_loss(states, action, next_states)
    assert float(total) == pytest.approx(0.0, abs=1e-6)


def test_physics_loss_penalizes_violations():
    b = 4
    quat = jnp.tile(jnp.array([0.0, 0, 0, 2.0]), (b, 1))  # non-unit quat
    omega = jnp.zeros((b, 3))
    next_omega = jnp.ones((b, 3)) * 5.0  # momentum jump with zero action
    action = jnp.zeros((b, 2))
    states = jnp.concatenate([quat, omega, jnp.ones((b, 3))], axis=-1)
    next_states = jnp.concatenate([quat, next_omega, jnp.ones((b, 3))], axis=-1)
    total, losses = physics_informed_loss(states, action, next_states)
    assert float(total) > 0.1
    assert float(losses["momentum_conservation"]) > 0
    assert float(losses["quaternion_normalization"]) > 0


# -------------------------------------------------------------------- RND


def test_rnd_bonus_decays_on_familiar_states():
    from tvc_ai_tpu.models import rnd

    cfg = rnd.RNDConfig(hidden_dims=(64, 32), embed_dim=16)
    state = rnd.init(jax.random.PRNGKey(0), cfg)
    obs = jax.random.normal(jax.random.PRNGKey(1), (128, 8))
    raw0 = float(jnp.mean(rnd.raw_bonus(state, obs, cfg)))
    upd = jax.jit(lambda s: rnd.update(s, obs, cfg)[0])
    for _ in range(150):
        state = upd(state)
    raw1 = float(jnp.mean(rnd.raw_bonus(state, obs, cfg)))
    assert raw1 < raw0 * 0.5  # familiar states become boring

    # novel states still score higher than familiar ones
    novel = jax.random.normal(jax.random.PRNGKey(2), (128, 8)) * 3.0
    raw_novel = float(jnp.mean(rnd.raw_bonus(state, novel, cfg)))
    assert raw_novel > raw1


def test_rnd_target_is_frozen():
    from tvc_ai_tpu.models import rnd

    cfg = rnd.RNDConfig(hidden_dims=(32,), embed_dim=8)
    state = rnd.init(jax.random.PRNGKey(0), cfg)
    obs = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    t0 = jax.tree.leaves(state.target_params)
    state, metrics = rnd.update(state, obs, cfg)
    t1 = jax.tree.leaves(state.target_params)
    assert all(np.allclose(a, b) for a, b in zip(t0, t1))
    assert np.isfinite(float(metrics["rnd_loss"]))
