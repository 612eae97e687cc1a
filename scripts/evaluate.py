#!/usr/bin/env python
"""Evaluate a trained agent over the Standard / Robustness / Stress suites.

Reference-compatible CLI shape (scripts/evaluate.py:611-710) on the batched
TPU rollout core: each suite runs all episodes in one device call.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser(description="TVC-AI-TPU evaluation")
    parser.add_argument("--model_path", type=str, required=True,
                        help="msgpack file (SACAgent.save) or orbax ckpt dir")
    parser.add_argument("--output_dir", type=str, default="evaluation_output")
    parser.add_argument("--obs_dim", type=int, default=10)
    parser.add_argument("--action_dim", type=int, default=2)
    parser.add_argument("--hidden", type=int, nargs="*", default=[256, 256])
    parser.add_argument("--episodes_scale", type=float, default=1.0,
                        help="scale the per-suite episode counts")
    parser.add_argument("--suite", choices=["standard", "robustness", "stress",
                                            "all"], default="all")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--history", type=int, default=1,
                        help="history_len the agent was trained with "
                             "(network.history_len)")
    parser.add_argument("--trajectories", type=int, default=0,
                        help="record N standard-suite episode trajectories "
                             "and save a per-episode trajectory plot")
    parser.add_argument("--rocket_mass", type=float, default=2.0,
                        help="suite nominal mass (1.5 = legacy-gen policies)")
    parser.add_argument("--run_config", type=str, default=None,
                        help="the training run's saved config.yaml — derives "
                             "the observation construction (trim + drift "
                             "channels, scales, history) exactly as trained, "
                             "so suite eval can't silently diverge. "
                             "Overrides the individual flags below.")
    parser.add_argument("--trim_obs", action="store_true",
                        help="enable the 4 trim-observation channels (obs "
                             "10→14) for policies trained with "
                             "env.trim_observation.enabled")
    parser.add_argument("--trim_mode", choices=["ema", "integral"],
                        default="ema",
                        help="trim-channel estimator the policy was trained "
                             "with (env.trim_observation.mode)")
    parser.add_argument("--drift_obs", action="store_true",
                        help="enable the 4 drift-observation channels "
                             "(scaled [vx,vy,x,y]) for policies trained "
                             "with env.drift_observation.enabled")
    parser.add_argument("--action_obs", action="store_true",
                        help="enable the 2 previous-action observation "
                             "channels for policies trained with "
                             "env.action_observation.enabled")
    parser.add_argument("--cg_offset_max", type=float, default=None,
                        help="override the suites' CG-offset range "
                             "(ablation: 0 isolates how much of the suite "
                             "score the CG axis alone costs)")
    parser.add_argument("--no_sensor_noise", action="store_true",
                        help="disable the suites' sensor noise (ablation: "
                             "isolates the observation-noise cost)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tvc_ai_tpu.agents.sac import SACConfig
    from tvc_ai_tpu.eval.evaluate import (
        SUITE_EPISODES,
        load_agent_state,
        obs_overrides_from_config,
        run_all_suites,
        run_suite,
        write_episode_csv,
    )

    sac_cfg = SACConfig(hidden_dims=tuple(args.hidden))
    if args.run_config:
        from tvc_ai_tpu.config import load_config
        from tvc_ai_tpu.config.build import build_sac_config
        from tvc_ai_tpu.env.types import obs_dim as env_obs_dim
        from tvc_ai_tpu.config.build import build_env_params

        run_cfg = load_config(args.run_config)
        sac_cfg = build_sac_config(run_cfg)
        obs_overrides = obs_overrides_from_config(run_cfg)
        frame_dim = int(env_obs_dim(build_env_params(run_cfg)))
        args.history = run_cfg.network.history_len
    else:
        obs_overrides = {}
        if args.trim_obs:
            obs_overrides.update(
                trim_obs_enabled=True,
                trim_obs_integral=args.trim_mode == "integral",
            )
        if args.drift_obs:
            obs_overrides["drift_obs_enabled"] = True
        if args.action_obs:
            obs_overrides["action_obs_enabled"] = True
        frame_dim = (args.obs_dim + (4 if args.trim_obs else 0)
                     + (4 if args.drift_obs else 0)
                     + (2 if args.action_obs else 0))
    agent_state = load_agent_state(
        args.model_path, frame_dim * args.history, args.action_dim, sac_cfg
    )
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    obs_dim = args.obs_dim if args.obs_dim != 10 else None
    sensor_noise = False if args.no_sensor_noise else None
    if args.suite == "all":
        results = run_all_suites(
            agent_state, sac_cfg, out, args.episodes_scale, args.seed, obs_dim,
            args.rocket_mass, args.history, obs_overrides, args.cg_offset_max,
            sensor_noise,
        )
    else:
        episodes = max(int(SUITE_EPISODES[args.suite] * args.episodes_scale), 2)
        result = run_suite(
            agent_state, sac_cfg, args.suite, episodes, args.seed, obs_dim,
            args.rocket_mass, args.history, obs_overrides, args.cg_offset_max,
            sensor_noise,
        )
        write_episode_csv(result, out / f"{args.suite}_episodes.csv")
        results = {args.suite: result}

    if args.trajectories > 0:
        from tvc_ai_tpu.eval.evaluate import _suite_env_params
        from tvc_ai_tpu.eval.rollout import make_trajectory_fn, plot_trajectories
        import jax

        traj_fn = jax.jit(make_trajectory_fn(
            sac_cfg, args.trajectories, args.action_dim, obs_dim,
            history_len=args.history,
        ))
        series = traj_fn(
            agent_state,
            jax.random.PRNGKey(args.seed),
            _suite_env_params("standard", args.rocket_mass, obs_overrides),
        )
        plot_trajectories(series, out / "trajectory_plots.png",
                          max_episodes=args.trajectories)
        print(f"trajectories: {out / 'trajectory_plots.png'}")

    for name, result in results.items():
        m = result.metrics
        print(
            f"{name:>10}: success {m['eval_success_rate']:.2%} "
            f"(legacy criterion {m['eval_legacy_success_rate']:.2%}) "
            f"reward {m['eval_reward_mean']:.1f}±{m['eval_reward_std']:.1f} "
            f"crash {m['eval_crash_rate']:.2%} "
            f"p50 {m['eval_reward_p50']:.1f} p95 {m['eval_reward_p95']:.1f}"
        )
    print(f"artifacts: {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
