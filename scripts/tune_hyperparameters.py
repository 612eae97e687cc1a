#!/usr/bin/env python
"""SAC hyperparameter search (reference CLI: scripts/tune_hyperparameters.py).

Uses Optuna when installed; otherwise a built-in random-search study with
median pruning (same search space and outputs).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser(description="TVC-AI-TPU HPO")
    parser.add_argument("--n_trials", type=int, default=20)
    parser.add_argument("--trial_steps", type=int, default=50_000)
    parser.add_argument("--num_envs", type=int, default=256)
    parser.add_argument("--output_dir", type=str, default="hpo_output")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tvc_ai_tpu.tuning.hpo import HAS_OPTUNA, make_sac_objective, run_study

    print(f"backend: {'optuna' if HAS_OPTUNA else 'built-in random search'}")
    objective = make_sac_objective(
        total_steps=args.trial_steps, num_envs=args.num_envs, seed=args.seed
    )
    best, results = run_study(
        objective, n_trials=args.n_trials, seed=args.seed,
        output_dir=args.output_dir,
    )
    pruned = sum(r.pruned for r in results)
    print(f"{len(results)} trials ({pruned} pruned)")
    print(f"best eval reward: {best.value:.1f}")
    for k, v in best.params.items():
        print(f"  {k} = {v}")
    print(f"artifacts: {args.output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
