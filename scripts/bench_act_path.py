#!/usr/bin/env python
"""Isolate the rollout act-path cost (VERDICT r4 ask #8 diagnosis).

The r4 MFU sweep measured the fused program at 21.0M env steps/s with
updates gated off vs 84M env-only — and attributed the gap to the per-step
actor forward inside the sequential scan. This probe measures that claim
directly by swapping the act path (training/loop.py ``act_fn`` hook) while
keeping EVERYTHING else in the production rollout (env step, autoreset,
replay writes, episode bookkeeping, history window):

- ``full``   — production SAC act path (tanh-Gaussian sample through the
               256x256 actor): the 21.0M baseline;
- ``linear`` — one obs->action Dense + tanh (depth ablation: if this
               recovers most of the gap, the bound is the MLP depth /
               per-layer dispatch, not the act path per se);
- ``const``  — constant zero action (no NN in the rollout at all: the
               remainder is env + bookkeeping + replay-write cost).

Updates never execute (learning_starts above the probe budget), matching
the r4 ablation-row methodology.

Usage: python scripts/bench_act_path.py [--iters 8] [--cpu]
Prints one JSON line per variant.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument(
        "--variants", nargs="*", default=["full", "linear", "const"]
    )
    parser.add_argument(
        "--set", dest="overrides", action="append", default=[]
    )
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from tvc_ai_tpu.config import load_config
    from tvc_ai_tpu.config.build import (
        build_env_params,
        build_loop_config,
        build_sac_config,
    )
    from tvc_ai_tpu.training import loop as loop_mod

    # learning_starts above the probe budget: updates compiled in but never
    # executed (the r4 "updates gated off" ablation shape)
    cfg = load_config(
        None,
        overrides=["algorithms.sac.learning_starts=2000000000"]
        + args.overrides,
    )
    sac_cfg = build_sac_config(cfg)
    loop_cfg = build_loop_config(cfg)
    env_params = build_env_params(cfg)
    n_steps = loop_cfg.num_envs * loop_cfg.rollout_steps

    def linear_act(agent, policy_input, key):
        del key
        # one Dense worth of compute, weights borrowed from the actor's
        # first kernel (obs->h matrix, sliced to action_dim columns)
        w = next(
            leaf
            for leaf in jax.tree.leaves(agent.actor_params)
            if leaf.ndim == 2 and leaf.shape[0] == policy_input.shape[-1]
        )
        return jnp.tanh(policy_input @ w[:, : loop_cfg.action_dim])

    def const_act(agent, policy_input, key):
        del agent, key
        return jnp.zeros(
            (policy_input.shape[0], loop_cfg.action_dim), jnp.float32
        )

    act_fns = {"full": None, "linear": linear_act, "const": const_act}

    key = jax.random.PRNGKey(0)
    init_fn = jax.jit(
        lambda k: loop_mod.init_carry(k, env_params, sac_cfg, loop_cfg)
    )
    for name in args.variants:
        carry = init_fn(key)
        fn = jax.jit(
            loop_mod.make_train_iteration(
                sac_cfg, loop_cfg, act_fn=act_fns[name]
            ),
            donate_argnums=(0,),
        )
        carry, m = fn(carry, env_params)  # warmup/compile
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            carry, m = fn(carry, env_params)
        jax.block_until_ready(m)
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": f"rollout_env_steps_per_sec[{name}]",
                    "value": n_steps * args.iters / dt,
                    "unit": "env steps/s",
                    "num_envs": loop_cfg.num_envs,
                    "rollout_steps": loop_cfg.rollout_steps,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
