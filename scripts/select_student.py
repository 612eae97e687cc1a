#!/usr/bin/env python
"""Post-hoc student reselection with large independent evals.

The distillation loop's in-run best-iter capture is an argmax over a noisy
metric (r5 measured: in-run best 5.1% on its 256-episode selection eval
re-evaluating at 2.2% on 512 fresh episodes — the winner's curse the r4
library-selection experiments quantified, now at the checkpoint level).
This script evaluates every saved candidate (student*.msgpack from
``dagger_distill.py --save_every``) on the OFFICIAL robustness suite with
a large episode count and a held-out seed, then re-confirms the winner on
a second disjoint seed — selection and confirmation never share episodes.

Usage:
  python scripts/select_student.py --dir outputs/dagger_r5 \
      [--episodes 512] [--history 8] [--hidden 256 256]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dir", required=True)
    p.add_argument("--episodes", type=int, default=512)
    p.add_argument("--confirm_episodes", type=int, default=1024)
    p.add_argument("--history", type=int, default=8)
    p.add_argument("--hidden", type=int, nargs="*", default=[256, 256])
    p.add_argument("--suite", default="robustness",
                   choices=["robustness", "stress"])
    p.add_argument("--select_seed", type=int, default=1001)
    p.add_argument("--confirm_seed", type=int, default=2002)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from flax import serialization

    from tvc_ai_tpu.agents import sac as sac_mod
    from tvc_ai_tpu.env.types import obs_dim as obs_dim_of
    from tvc_ai_tpu.eval import rollout as rollout_mod
    from tvc_ai_tpu.eval.evaluate import _suite_env_params

    out = Path(args.dir)
    candidates = sorted(out.glob("student*.msgpack"))
    if not candidates:
        print(f"no student*.msgpack under {out}", file=sys.stderr)
        return 1

    params = _suite_env_params(
        args.suite,
        obs_overrides=dict(drift_obs_enabled=True, action_obs_enabled=True),
    )
    obs_dim = obs_dim_of(params)
    view_dim = obs_dim * args.history
    sac_cfg = sac_mod.SACConfig(hidden_dims=tuple(args.hidden))
    actor, _ = sac_mod.make_networks(view_dim, 2, sac_cfg)
    template = sac_mod.init(jax.random.PRNGKey(0), view_dim, 2, sac_cfg)

    def policy_fn(actor_params, obs, k):
        mean, _ = actor.apply(actor_params, obs)
        return jnp.tanh(mean)

    eval_sel = jax.jit(
        rollout_mod.make_policy_eval_fn(
            policy_fn, args.episodes, history_len=args.history
        )
    )
    eval_confirm = jax.jit(
        rollout_mod.make_policy_eval_fn(
            policy_fn, args.confirm_episodes, history_len=args.history
        )
    )

    def load(path):
        raw = serialization.msgpack_restore(path.read_bytes())
        state = serialization.from_state_dict(
            template, raw["state"]
        )
        return state.actor_params

    rows = []
    k_sel = jax.random.PRNGKey(args.select_seed)
    for c in candidates:
        ap = load(c)
        t0 = time.time()
        stats = eval_sel(ap, k_sel, params)
        sr = float(jnp.mean(stats.success))
        rows.append({"candidate": c.name, "select_success": sr})
        print(
            f"{c.name}: {sr:.2%} on {args.episodes} episodes "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )
    rows.sort(key=lambda r: -r["select_success"])
    winner = rows[0]
    ap = load(out / winner["candidate"])
    stats = eval_confirm(
        ap, jax.random.PRNGKey(args.confirm_seed), params
    )
    confirm = float(jnp.mean(stats.success))
    winner["confirm_success"] = confirm
    winner["confirm_episodes"] = args.confirm_episodes
    print(
        f"winner {winner['candidate']}: select "
        f"{winner['select_success']:.2%} -> confirm {confirm:.2%} "
        f"({args.confirm_episodes} episodes, disjoint seed)"
    )
    (out / f"selection_{args.suite}.json").write_text(
        json.dumps({"rows": rows, "winner": winner}, indent=2)
    )
    # the confirmed winner becomes the canonical per-suite artifact
    best_path = out / f"student_selected_{args.suite}.msgpack"
    best_path.write_bytes((out / winner["candidate"]).read_bytes())
    print(f"saved {best_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
