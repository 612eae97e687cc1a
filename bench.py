"""Headline benchmark: batched env throughput (steps/s) at 4096 envs.

Methodology mirrors the reference's env benchmark (tests/benchmark.py:40-60:
random actions, fixed step count, wall clock) scaled to the TPU-native
design: 4096 vmapped envs, T steps fused in one `lax.scan` under jit.

Baseline: ~1247 env steps/s observed for the reference's single PyBullet env
(GUIDE/STATE_OF_THE_ART_INTEGRATION.md:148; see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp

from tvc_ai_tpu.env import rocket_env
from tvc_ai_tpu.env.types import EnvParams, RandomizationConfig

NUM_ENVS = 4096
STEPS_PER_CALL = 256
TIMED_CALLS = 8
BASELINE_STEPS_PER_SEC = 1247.0


def main() -> None:
    params = EnvParams(randomization=RandomizationConfig(enabled=True))
    keys = jax.random.split(jax.random.PRNGKey(0), NUM_ENVS)
    states, obs = jax.vmap(rocket_env.reset, in_axes=(0, None))(keys, params)

    # auto-selects the SoA Pallas physics kernel on TPU (vmapped XLA on CPU)
    batched_step = rocket_env.batched_step_autoreset

    def rollout(carry, _):
        states, key = carry
        key, k_act = jax.random.split(key)
        actions = jax.random.uniform(
            k_act, (NUM_ENVS, 2), minval=-1.0, maxval=1.0
        )
        states, out, _ = batched_step(states, actions, params)
        return (states, key), out.reward

    @partial(jax.jit, donate_argnums=(0,))
    def run(states, key):
        (states, key), rewards = jax.lax.scan(
            rollout, (states, key), None, length=STEPS_PER_CALL
        )
        return states, key, jnp.mean(rewards)

    key = jax.random.PRNGKey(1)
    # warmup / compile
    states, key, r = run(states, key)
    jax.block_until_ready(r)

    t0 = time.perf_counter()
    for _ in range(TIMED_CALLS):
        states, key, r = run(states, key)
    jax.block_until_ready(r)
    elapsed = time.perf_counter() - t0

    total_steps = NUM_ENVS * STEPS_PER_CALL * TIMED_CALLS
    steps_per_sec = total_steps / elapsed
    print(
        json.dumps(
            {
                "metric": f"env_steps_per_sec@{NUM_ENVS}envs",
                "value": round(steps_per_sec, 1),
                "unit": "env steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
