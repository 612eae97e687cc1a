#!/usr/bin/env python
"""Performance benchmark suite — run as a script, not pytest (ref tests/benchmark.py).

Measures (methodology mirrors the reference's :40-281):
- env steps/s (random actions): single functional env AND batched-4096
- agent inference/s, deterministic and stochastic (single + batched)
- SAC training gradient steps/s
- host memory RSS at baseline / after buffer alloc / after training
- convergence-episode detection on a short training run

Writes ``benchmark_results.json`` next to this file (ref :354-361).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np


def bench_env_steps(results: dict) -> None:
    import jax
    import jax.numpy as jnp

    from tvc_ai_tpu.env import EnvParams, rocket_env

    params = EnvParams()
    # single env, host loop (the reference's exact methodology: 1000 random
    # actions, wall clock — apples-to-apples with its ~1247 steps/s)
    state, obs = rocket_env.reset(jax.random.PRNGKey(0), params)
    step = jax.jit(rocket_env.step)
    key = jax.random.PRNGKey(1)
    state, out = step(state, jnp.zeros(2), params)  # compile
    jax.block_until_ready(out.reward)
    t0 = time.perf_counter()
    n = 1000
    for _ in range(n):
        key, k = jax.random.split(key)
        action = jax.random.uniform(k, (2,), minval=-1, maxval=1)
        state, out = step(state, action, params)
    jax.block_until_ready(out.reward)
    results["env_steps_per_sec_single"] = n / (time.perf_counter() - t0)

    # batched 4096, fused scan
    N, T = 4096, 128
    keys = jax.random.split(jax.random.PRNGKey(2), N)
    states, obs = jax.vmap(rocket_env.reset, in_axes=(0, None))(keys, params)
    batched = jax.vmap(rocket_env.step_autoreset, in_axes=(0, 0, None))

    @jax.jit
    def run(states, key):
        def f(carry, _):
            states, key = carry
            key, k = jax.random.split(key)
            actions = jax.random.uniform(k, (N, 2), minval=-1, maxval=1)
            states, out, _ = batched(states, actions, params)
            return (states, key), out.reward

        (states, key), r = jax.lax.scan(f, (states, key), None, length=T)
        return states, key, r.mean()

    states, key, r = run(states, jax.random.PRNGKey(3))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    calls = 4
    for _ in range(calls):
        states, key, r = run(states, key)
    jax.block_until_ready(r)
    results["env_steps_per_sec_batched4096"] = (
        N * T * calls / (time.perf_counter() - t0)
    )


def bench_inference(results: dict) -> None:
    import jax
    import jax.numpy as jnp

    from tvc_ai_tpu.agents import sac as sac_mod

    cfg = sac_mod.SACConfig()
    agent = sac_mod.init(jax.random.PRNGKey(0), 10, 2, cfg)
    for name, det in (("deterministic", True), ("stochastic", False)):
        sel = jax.jit(
            lambda a, o, k, det=det: sac_mod.select_action(a, o, k, cfg, 2, det)
        )
        obs1 = jnp.zeros((1, 10))
        a = sel(agent, obs1, jax.random.PRNGKey(1))
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        n = 2000
        for i in range(n):
            a = sel(agent, obs1, jax.random.PRNGKey(i))
        jax.block_until_ready(a)
        results[f"inference_per_sec_{name}"] = n / (time.perf_counter() - t0)

    obs_b = jnp.zeros((4096, 10))
    sel = jax.jit(lambda a, o, k: sac_mod.select_action(a, o, k, cfg, 2, True))
    a = sel(agent, obs_b, jax.random.PRNGKey(0))
    jax.block_until_ready(a)
    t0 = time.perf_counter()
    for i in range(100):
        a = sel(agent, obs_b, jax.random.PRNGKey(i))
    jax.block_until_ready(a)
    results["inference_per_sec_batched4096"] = (
        4096 * 100 / (time.perf_counter() - t0)
    )


def bench_training(results: dict) -> None:
    import jax
    import jax.numpy as jnp

    from tvc_ai_tpu.agents import sac as sac_mod

    cfg = sac_mod.SACConfig(batch_size=256)
    agent = sac_mod.init(jax.random.PRNGKey(0), 10, 2, cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    batch = {
        "obs": jax.random.normal(ks[0], (256, 10)),
        "action": jax.random.uniform(ks[1], (256, 2), minval=-1, maxval=1),
        "reward": jax.random.normal(ks[2], (256,)),
        "next_obs": jax.random.normal(ks[3], (256, 10)),
        "done": jnp.zeros(256),
    }
    upd = jax.jit(lambda a, k: sac_mod.update(a, batch, k, cfg, 10, 2))
    agent, m = upd(agent, ks[4])
    jax.block_until_ready(m["critic_loss"])
    t0 = time.perf_counter()
    n = 500
    for i in range(n):
        agent, m = upd(agent, jax.random.PRNGKey(i))
    jax.block_until_ready(m["critic_loss"])
    results["train_steps_per_sec"] = n / (time.perf_counter() - t0)


def bench_memory(results: dict) -> None:
    try:
        import psutil
    except ImportError:
        return
    import jax
    import jax.numpy as jnp

    proc = psutil.Process()
    results["memory_rss_mb_baseline"] = proc.memory_info().rss / 1e6
    from tvc_ai_tpu.agents import replay as replay_mod

    example = {
        "obs": jnp.zeros(10), "action": jnp.zeros(2),
        "reward": jnp.float32(0), "next_obs": jnp.zeros(10),
        "done": jnp.float32(0),
    }
    buf = replay_mod.ReplayBuffer.create(1_000_000, example)
    jax.block_until_ready(buf.data["obs"])
    results["memory_rss_mb_with_buffer"] = proc.memory_info().rss / 1e6
    mem = jax.devices()[0].memory_stats() or {}
    if mem:
        results["hbm_bytes_in_use"] = int(mem.get("bytes_in_use", 0))


def bench_convergence(results: dict) -> None:
    """Short fused run; record the iteration where eval reward stabilizes
    (ref convergence-episode detection :189-242)."""
    import jax

    from tvc_ai_tpu.agents.sac import SACConfig
    from tvc_ai_tpu.env.types import EnvParams
    from tvc_ai_tpu.training import loop as loop_mod

    sac_cfg = SACConfig(
        hidden_dims=(64, 64), batch_size=256, buffer_size=262144,
        learning_starts=2048,
    )
    loop_cfg = loop_mod.TrainLoopConfig(
        num_envs=256, rollout_steps=32, updates_per_step=4
    )
    carry = loop_mod.init_carry(
        jax.random.PRNGKey(0), EnvParams(), sac_cfg, loop_cfg
    )
    it = jax.jit(loop_mod.make_train_iteration(sac_cfg, loop_cfg),
                 donate_argnums=(0,))
    rewards = []
    t0 = time.perf_counter()
    for i in range(20):
        carry, m = it(carry, EnvParams())
        rewards.append(float(m["reward_mean"]))
    results["convergence_wallclock_sec"] = time.perf_counter() - t0
    results["convergence_rewards"] = rewards
    # convergence iteration: first index where the 3-window mean stops
    # improving by >1%
    conv = len(rewards)
    for i in range(3, len(rewards)):
        prev = np.mean(rewards[i - 3 : i])
        if prev != 0 and abs(rewards[i] - prev) / abs(prev) < 0.01:
            conv = i
            break
    results["convergence_iteration"] = conv


def main() -> None:
    results: dict = {"timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}
    for name, fn in [
        ("env", bench_env_steps),
        ("inference", bench_inference),
        ("training", bench_training),
        ("memory", bench_memory),
        ("convergence", bench_convergence),
    ]:
        print(f"benchmarking {name}...", flush=True)
        fn(results)
    out = Path(__file__).parent / "benchmark_results.json"
    out.write_text(json.dumps(results, indent=2))
    for k, v in results.items():
        if isinstance(v, float):
            print(f"{k}: {v:,.1f}")
    print(f"results -> {out}")


if __name__ == "__main__":
    main()
