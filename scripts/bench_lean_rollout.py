#!/usr/bin/env python
"""Upper bound for restructured rollout: act + env step + history only,
all bookkeeping/replay hoisted out of the scan body (stacked outputs).
Compares against bench_act_path's full-body numbers to size the prize of
moving per-step bookkeeping to per-iteration vectorized post-processing."""
import argparse, json, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--set", dest="overrides", action="append", default=[])
    args = p.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from tvc_ai_tpu.config import load_config
    from tvc_ai_tpu.config.build import build_env_params, build_loop_config, build_sac_config
    from tvc_ai_tpu.training import loop as loop_mod
    from tvc_ai_tpu.env import rocket_env
    from tvc_ai_tpu.agents import sac as sac_mod

    cfg = load_config(None, overrides=["algorithms.sac.learning_starts=2000000000"] + args.overrides)
    sac_cfg = build_sac_config(cfg)
    loop_cfg = build_loop_config(cfg)
    env_params = build_env_params(cfg)
    init_fn = jax.jit(lambda k: loop_mod.init_carry(k, env_params, sac_cfg, loop_cfg))
    carry = init_fn(jax.random.PRNGKey(0))

    def lean_iter(env_states, obs, agent, key, env_params):
        def step(c, _):
            states, obs, key = c
            key, k_act = jax.random.split(key)
            actions = sac_mod.select_action(agent, obs, k_act, sac_cfg, loop_cfg.action_dim)
            states, out, next_obs = rocket_env.batched_step_autoreset(
                states, actions, env_params, use_pallas=loop_cfg.use_pallas_physics)
            return (states, next_obs, key), (out.obs, actions, out.reward, out.terminated)
        (states, obs, key), ys = jax.lax.scan(step, (env_states, obs, key), None, length=loop_cfg.rollout_steps)
        return states, obs, key, ys

    fn = jax.jit(lean_iter, donate_argnums=(0, 1))
    states, obs, key = carry.env_states, carry.obs, carry.key
    agent = carry.agent
    states, obs, key, ys = fn(states, obs, agent, key, env_params)
    jax.block_until_ready(ys)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        states, obs, key, ys = fn(states, obs, agent, key, env_params)
    jax.block_until_ready(ys)
    dt = time.perf_counter() - t0
    n = loop_cfg.num_envs * loop_cfg.rollout_steps * args.iters
    print(json.dumps({"metric": "lean_rollout_env_steps_per_sec", "value": n / dt,
                      "unit": "env steps/s", "num_envs": loop_cfg.num_envs}))
    return 0

if __name__ == "__main__":
    sys.exit(main())
