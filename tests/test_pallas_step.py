"""Pallas integrate kernel vs the XLA reference path — parity tests.

Runs in interpreter mode on CPU (pltpu interpret=True); the compiled path is
exercised on real hardware by bench/profile runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvc_ai_tpu.ops.pallas_step import step_pallas
from tvc_ai_tpu.physics import ThrustControl, RigidBodyState, RocketParams
from tvc_ai_tpu.physics.integrator import step as xla_step


def random_states(key, n):
    ks = jax.random.split(key, 4)
    quat = jax.random.normal(ks[1], (n, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    return RigidBodyState(
        pos=jax.random.uniform(ks[0], (n, 3), minval=-2.0, maxval=2.0)
        .at[:, 2]
        .set(jax.random.uniform(ks[0], (n,), minval=0.3, maxval=10.0)),
        quat=quat,
        vel=jax.random.normal(ks[2], (n, 3)) * 2.0,
        omega=jax.random.normal(ks[3], (n, 3)) * 1.0,
    )


@pytest.mark.parametrize("n", [4, 100])
def test_pallas_matches_xla(n):
    params = RocketParams()
    key = jax.random.PRNGKey(0)
    states = random_states(key, n)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    gimbal = jax.random.uniform(ks[0], (n, 2), minval=-0.3, maxval=0.3)
    active = jax.random.uniform(ks[1], (n,)) > 0.3
    mass = jax.random.uniform(ks[2], (n,), minval=1.5, maxval=2.5)
    thrust_scale = jax.random.uniform(ks[3], (n,), minval=0.8, maxval=1.2)
    cg = jax.random.normal(jax.random.PRNGKey(2), (n, 3)) * 0.02
    wind = jax.random.normal(jax.random.PRNGKey(3), (n, 3)) * 1.0

    ctrl = ThrustControl(gimbal=gimbal, thrust_active=active)
    ref = jax.vmap(
        lambda s, g, a, m, t, c, w: xla_step(
            s, ThrustControl(g, a), params, mass=m, thrust_scale=t,
            cg_offset=c, wind=w,
        )
    )(states, gimbal, active, mass, thrust_scale, cg, wind)

    out = step_pallas(
        states, ctrl, params, mass, thrust_scale, cg, wind,
        block_envs=128, interpret=True,
    )
    for name in ("pos", "quat", "vel", "omega"):
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(out, name))
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-4, err_msg=name)


def test_pallas_contact_parity():
    """On-ground states exercise the contact branch."""
    params = RocketParams()
    n = 32
    states = random_states(jax.random.PRNGKey(5), n)
    states = states.replace(
        pos=states.pos.at[:, 2].set(
            jax.random.uniform(jax.random.PRNGKey(6), (n,), minval=0.3, maxval=0.55)
        )
    )
    gimbal = jnp.zeros((n, 2))
    active = jnp.zeros(n, bool)
    mass = jnp.full((n,), 2.0)
    ones = jnp.ones(n)
    zeros3 = jnp.zeros((n, 3))
    ref = jax.vmap(
        lambda s: xla_step(
            s, ThrustControl(jnp.zeros(2), jnp.bool_(False)), params,
            mass=jnp.float32(2.0),
        )
    )(states)
    out = step_pallas(
        states, ThrustControl(gimbal, active), params, mass, ones, zeros3,
        zeros3, block_envs=128, interpret=True,
    )
    for name in ("pos", "vel", "omega"):
        np.testing.assert_allclose(
            np.asarray(getattr(ref, name)),
            np.asarray(getattr(out, name)),
            atol=5e-5, rtol=5e-4, err_msg=name,
        )


def test_pallas_pads_ragged_batch():
    params = RocketParams()
    n = 77  # not a multiple of block_envs
    states = random_states(jax.random.PRNGKey(7), n)
    out = step_pallas(
        states,
        ThrustControl(jnp.zeros((n, 2)), jnp.ones(n, bool)),
        params,
        jnp.full((n,), 2.0),
        jnp.ones(n),
        jnp.zeros((n, 3)),
        jnp.zeros((n, 3)),
        block_envs=128,
        interpret=True,
    )
    assert out.pos.shape == (n, 3)
    assert np.all(np.isfinite(np.asarray(out.pos)))


def test_batched_step_autoreset_full_path_parity():
    """The whole-app Pallas route (pre-physics vmap → whole-batch kernel →
    post-physics vmap → autoreset) is bit-compatible with the vmapped path
    — including PRNG consumption, reward, FSM, and the autoreset select."""
    from tvc_ai_tpu.env import rocket_env
    from tvc_ai_tpu.env.types import EnvParams, RandomizationConfig

    params = EnvParams(randomization=RandomizationConfig(enabled=True))
    n = 64
    keys = jax.random.split(jax.random.PRNGKey(11), n)
    states, obs = jax.vmap(rocket_env.reset, in_axes=(0, None))(keys, params)

    ref_states, ref_out = states, None
    pal_states = states
    k = jax.random.PRNGKey(12)
    for t in range(5):
        k, ka = jax.random.split(k)
        actions = jax.random.uniform(ka, (n, 2), minval=-1.0, maxval=1.0)
        ref_states, ref_out, ref_next = jax.vmap(
            rocket_env.step_autoreset, in_axes=(0, 0, None)
        )(ref_states, actions, params)
        pal_states, pal_out, pal_next = rocket_env.batched_step_autoreset(
            pal_states, actions, params,
            use_pallas=True, block_envs=64, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(ref_out.obs), np.asarray(pal_out.obs),
            atol=5e-5, rtol=5e-4, err_msg=f"obs step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(ref_out.reward), np.asarray(pal_out.reward),
            atol=1e-3, rtol=1e-3, err_msg=f"reward step {t}",
        )
        np.testing.assert_array_equal(
            np.asarray(ref_out.terminated), np.asarray(pal_out.terminated)
        )
        np.testing.assert_allclose(
            np.asarray(ref_next), np.asarray(pal_next),
            atol=5e-5, rtol=5e-4, err_msg=f"next_policy_obs step {t}",
        )
        # PRNG chains must stay identical so long rollouts don't diverge
        np.testing.assert_array_equal(
            np.asarray(ref_states.key), np.asarray(pal_states.key)
        )


def test_batched_step_autoreset_rejects_extra_physics():
    from tvc_ai_tpu.env import rocket_env
    from tvc_ai_tpu.env.types import EnvParams
    from tvc_ai_tpu.physics.types import RocketParams

    params = EnvParams(rocket=RocketParams(magnus_effect=True))
    assert not rocket_env.pallas_physics_ok(params)
    n = 4
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    states, _ = jax.vmap(rocket_env.reset, in_axes=(0, None))(keys, params)
    with pytest.raises(ValueError):
        rocket_env.batched_step_autoreset(
            states, jnp.zeros((n, 2)), params, use_pallas=True, interpret=True
        )
    # auto mode silently falls back to the vmapped path
    out = rocket_env.batched_step_autoreset(
        states, jnp.zeros((n, 2)), params
    )
    assert out[1].obs.shape[0] == n
