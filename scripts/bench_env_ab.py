#!/usr/bin/env python
"""A/B breakdown of the env hot path on the real TPU (round-3 perf item).

Times several program variants at 4096 envs x 256-step fused scans to
localize where throughput goes, using bench.py's methodology:

  physics        raw integrator scan (no env bookkeeping)
  step           env step, no autoreset
  autoreset      step + branchless masked reset (bench.py headline program)
  autoreset_nodr autoreset with randomization disabled
  trim           autoreset + trim observation channels (obs 14)

Usage: python scripts/bench_env_ab.py [--envs 4096] [--steps 256] [--calls 8]
"""

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tvc_ai_tpu.env import rocket_env
from tvc_ai_tpu.env.types import EnvParams, RandomizationConfig


def timeit(run, states, key, n_calls, total_steps):
    states, key, r = run(states, key)  # compile + warmup
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        states, key, r = run(states, key)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    return total_steps * n_calls / dt


def bench_env(params, num_envs, steps, calls, autoreset=True):
    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    states, _ = jax.vmap(rocket_env.reset, in_axes=(0, None))(keys, params)
    if autoreset:
        bstep = jax.vmap(rocket_env.step_autoreset, in_axes=(0, 0, None))

        def body(carry, _):
            states, key = carry
            key, k_act = jax.random.split(key)
            actions = jax.random.uniform(
                k_act, (num_envs, 2), minval=-1.0, maxval=1.0
            )
            states, out, _ = bstep(states, actions, params)
            return (states, key), out.reward
    else:
        bstep = jax.vmap(rocket_env.step, in_axes=(0, 0, None))

        def body(carry, _):
            states, key = carry
            key, k_act = jax.random.split(key)
            actions = jax.random.uniform(
                k_act, (num_envs, 2), minval=-1.0, maxval=1.0
            )
            states, out = bstep(states, actions, params)
            return (states, key), out.reward

    @partial(jax.jit, donate_argnums=(0,))
    def run(states, key):
        (states, key), rewards = jax.lax.scan(
            body, (states, key), None, length=steps
        )
        return states, key, jnp.mean(rewards)

    return timeit(run, states, jax.random.PRNGKey(1), calls, num_envs * steps)


def bench_physics(num_envs, steps, calls):
    from tvc_ai_tpu.physics.integrator import ThrustControl
    from tvc_ai_tpu.physics.integrator import step as physics_step
    from tvc_ai_tpu.physics.types import RigidBodyState, RocketParams

    rp = RocketParams()
    body0 = RigidBodyState(
        pos=jnp.zeros((num_envs, 3)),
        quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (num_envs, 1)),
        vel=jnp.zeros((num_envs, 3)),
        omega=jnp.zeros((num_envs, 3)),
    )
    pstep = jax.vmap(
        lambda b, g: physics_step(
            b, ThrustControl(gimbal=g, thrust_active=jnp.bool_(True)), rp
        ),
        in_axes=(0, 0),
    )

    def body(carry, _):
        b, key = carry
        key, k = jax.random.split(key)
        g = jax.random.uniform(k, (num_envs, 2), minval=-0.3, maxval=0.3)
        b = pstep(b, g)
        return (b, key), b.pos[:, 2].mean()

    @partial(jax.jit, donate_argnums=(0,))
    def run(b, key):
        (b, key), alt = jax.lax.scan(body, (b, key), None, length=steps)
        return b, key, alt.mean()

    return timeit(run, body0, jax.random.PRNGKey(1), calls, num_envs * steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--calls", type=int, default=8)
    args = ap.parse_args()
    E, T, C = args.envs, args.steps, args.calls

    dr_on = EnvParams(randomization=RandomizationConfig(enabled=True))
    dr_off = EnvParams()
    trim = EnvParams(
        randomization=RandomizationConfig(enabled=True), trim_obs_enabled=True
    )

    results = {
        "physics": bench_physics(E, T, C),
        "step": bench_env(dr_on, E, T, C, autoreset=False),
        "autoreset": bench_env(dr_on, E, T, C, autoreset=True),
        "autoreset_nodr": bench_env(dr_off, E, T, C, autoreset=True),
        "trim": bench_env(trim, E, T, C, autoreset=True),
    }
    for k, v in results.items():
        print(f"{k:>15}: {v/1e6:8.1f} M steps/s")
    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
