#!/usr/bin/env python
"""Per-axis domain-randomization ablation of a trained policy.

Evaluates a checkpoint with each DR axis enabled in isolation (and all
together) to locate which disturbance actually degrades success — the
diagnostic that found CG offset to be the dominant failure axis for
memoryless policies (RESULTS.md). Complements scripts/evaluate.py's suite
aggregates, which can't attribute failures to an axis.

Usage: python scripts/ablate_dr.py --model_path <ckpt> [--episodes 64]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--episodes", type=int, default=64)
    parser.add_argument("--hidden", type=int, nargs="*", default=[256, 256])
    parser.add_argument("--history", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from tvc_ai_tpu.agents import sac as sac_mod
    from tvc_ai_tpu.env.types import RandomizationConfig
    from tvc_ai_tpu.env.wrappers import RocketConfig
    from tvc_ai_tpu.eval.evaluate import load_agent_state
    from tvc_ai_tpu.eval.rollout import make_eval_fn, summarize_stats

    sac_cfg = sac_mod.SACConfig(hidden_dims=tuple(args.hidden))
    state = load_agent_state(
        args.model_path, 10 * args.history, 2, sac_cfg
    )
    base = RocketConfig(mass=2.0).to_env_params(
        domain_randomization=False, sensor_noise=False, max_episode_steps=1000
    )

    def rc(**kw):
        defaults = dict(
            enabled=True,
            mass_variation=jnp.float32(0.0),
            thrust_variation=jnp.float32(0.0),
            cg_offset_max=jnp.float32(0.0),
            wind_max=jnp.float32(0.0),
        )
        defaults.update(kw)
        return RandomizationConfig(**defaults)

    axes = {
        "none (nominal)": rc(),
        "mass +-30%": rc(mass_variation=jnp.float32(0.3)),
        "thrust +-20%": rc(thrust_variation=jnp.float32(0.2)),
        "cg 0.05 m": rc(cg_offset_max=jnp.float32(0.05)),
        "wind 3 N": rc(wind_max=jnp.float32(3.0)),
        "noise fixed 0.02": rc(sensor_noise_enabled=True),
        "ALL (robustness suite)": rc(
            mass_variation=jnp.float32(0.3),
            thrust_variation=jnp.float32(0.2),
            cg_offset_max=jnp.float32(0.05),
            wind_max=jnp.float32(3.0),
            sensor_noise_enabled=True,
        ),
    }
    fn = jax.jit(make_eval_fn(sac_cfg, args.episodes, history_len=args.history))
    for name, r in axes.items():
        params = base.replace(randomization=r)
        m = summarize_stats(fn(state, jax.random.PRNGKey(args.seed), params))
        print(
            f"{name:24s} success {m['eval_success_rate']:7.2%} "
            f"legacy {m['eval_legacy_success_rate']:7.2%} "
            f"crash {m['eval_crash_rate']:6.2%} "
            f"len {m['eval_length_mean']:5.0f} "
            f"reward {m['eval_reward_mean']:8.0f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
