#!/usr/bin/env python
"""Train a TVC policy — the main entry point.

Mirrors the reference CLI (scripts/train.py:851-861: ``--config``,
``--debug``, ``--resume``) and adds Hydra-style dotted overrides:

    python scripts/train.py --config tvc_ai_tpu/config/default.yaml \\
        training.total_timesteps=500000 training.num_envs=2048

``--resume`` takes a checkpoint directory and actually resumes (agent,
optimizers, replay buffer, env states, PRNG keys, curriculum stage) — the
reference's flag was a stub ("Resume logic would go here",
ref scripts/train.py:905-907).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser(description="TVC-AI-TPU trainer")
    parser.add_argument("--config", type=str, default=None, help="YAML config path")
    parser.add_argument("--debug", action="store_true", help="small fast run")
    parser.add_argument(
        "--resume", type=str, default=None, help="checkpoint directory to resume from"
    )
    parser.add_argument("--output-dir", type=str, default=None)
    parser.add_argument(
        "--cpu", action="store_true", help="force CPU backend (testing)"
    )
    parser.add_argument(
        "overrides", nargs="*", help="dotted config overrides: a.b.c=value"
    )
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tvc_ai_tpu.config import load_config, save_config

    cfg = load_config(args.config, overrides=args.overrides)
    algo = cfg.training.algorithm
    if algo == "ensemble":
        from tvc_ai_tpu.training.trainer_ensemble import EnsembleTrainer as Trainer
    elif algo in ("ppo", "td3"):
        import functools

        from tvc_ai_tpu.training.trainer_ensemble import EnsembleTrainer

        Trainer = functools.partial(EnsembleTrainer, forced_actor=algo)
    else:  # sac (default): the dedicated fused SAC trainer
        from tvc_ai_tpu.training.trainer import Trainer
    if args.debug:
        cfg.globals.debug = True
        cfg.training.total_timesteps = min(cfg.training.total_timesteps, 50_000)
        cfg.training.num_envs = min(cfg.training.num_envs, 64)
        cfg.training.rollout_steps = min(cfg.training.rollout_steps, 32)
        cfg.logging.level = "DEBUG"

    trainer = Trainer(cfg, output_dir=args.output_dir, resume=args.resume)
    save_config(cfg, trainer.output_dir / "config.yaml")
    result = trainer.train()
    print(
        f"final: success={result['eval_success_rate']:.2%} "
        f"reward={result['eval_reward_mean']:.1f} "
        f"steps/s={result['steps_per_sec']:,.0f}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
