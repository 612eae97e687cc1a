#!/usr/bin/env python
"""Inspect a trained policy's behavior: trajectory printout + episode stats.

Loads a checkpoint (orbax dir or msgpack), runs deterministic episodes, and
prints the altitude/tilt/velocity profile — the quick diagnostic for "what
is the policy actually doing".
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--hidden", type=int, nargs="*", default=[256, 256])
    parser.add_argument("--obs_dim", type=int, default=10)
    parser.add_argument("--episodes", type=int, default=3)
    parser.add_argument("--print_every", type=int, default=50)
    parser.add_argument("--randomize", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from tvc_ai_tpu.agents import sac as sac_mod
    from tvc_ai_tpu.config import load_config, build_env_params
    from tvc_ai_tpu.env import rocket_env
    from tvc_ai_tpu.eval.evaluate import load_agent_state

    cfg = load_config(None)
    cfg.env.domain_randomization.enabled = args.randomize
    cfg.env.domain_randomization.sensor_noise_enabled = args.randomize
    env_params = build_env_params(cfg)
    sac_cfg = sac_mod.SACConfig(hidden_dims=tuple(args.hidden))
    agent = load_agent_state(args.model_path, args.obs_dim, 2, sac_cfg)

    step = jax.jit(rocket_env.step)
    act = jax.jit(
        lambda a, o: sac_mod.select_action(
            a, o, jax.random.PRNGKey(0), sac_cfg, 2, deterministic=True
        )
    )

    for ep in range(args.episodes):
        state, obs = rocket_env.reset(jax.random.PRNGKey(100 + ep), env_params)
        total, steps = 0.0, 0
        print(f"\n=== episode {ep} ===")
        print(f"{'step':>5} {'alt':>7} {'tilt°':>7} {'|ω|':>7} {'vz':>7} "
              f"{'fuel':>6} {'act':>14} {'r':>8}")
        while True:
            action = act(agent, obs[None])[0]
            state, out = step(state, action, env_params)
            obs = out.obs
            total += float(out.reward)
            steps += 1
            if steps % args.print_every == 0 or bool(out.terminated) or bool(
                out.truncated
            ):
                a = np.asarray(action)
                print(
                    f"{steps:5d} {float(out.altitude):7.2f} "
                    f"{np.degrees(float(out.tilt)):7.2f} "
                    f"{float(out.angular_velocity_mag):7.3f} "
                    f"{float(state.body.vel[2]):7.2f} "
                    f"{float(out.fuel):6.3f} "
                    f"[{a[0]:+5.2f},{a[1]:+5.2f}] {total:8.1f}"
                )
            if bool(out.terminated) or bool(out.truncated):
                reason = "SUCCESS" if bool(out.mission_success) else (
                    "crash" if bool(out.crashed) else
                    ("truncated" if bool(out.truncated) else "terminated")
                )
                print(f"  -> {reason} after {steps} steps, return {total:.1f}")
                break
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
