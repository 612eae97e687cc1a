#!/usr/bin/env python
"""Cross-transfer matrix of per-draw CEM controllers.

The privileged per-draw CEM oracle (suite_feasibility --cem) bounds what a
controller that KNOWS the episode draw can do (~11 % on the robustness
suite). A BLIND policy must either identify the draw in-episode (racing
the tip-over) or use one fixed strategy. This probe measures which regime
the suite is in: CEM-solve a draw batch, then roll EVERY solved draw's
controller on EVERY solved draw (the transfer matrix T[i,j] = does
controller i win draw j?).

- If a few controllers cover most solved draws (dense rows), a blind
  policy could approach the privileged ceiling with a single robust
  strategy — distillation has headroom.
- If T is near-diagonal, winning requires per-draw adaptation that must be
  identified faster than the plant diverges, and the blind ceiling is
  fundamentally below the privileged one. The best single row is a lower
  bound on what one fixed controller achieves across the solved set.

  python scripts/cross_transfer.py --episodes 512 [--suite robustness]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--suite", default="robustness",
                   choices=["robustness", "stress"])
    p.add_argument("--episodes", type=int, default=512)
    p.add_argument("--max_solved", type=int, default=96,
                   help="cap the matrix side (memory: side^2 envs roll "
                        "at once)")
    p.add_argument("--cem_pop", type=int, default=64)
    p.add_argument("--cem_gens", type=int, default=25)
    p.add_argument("--cem_horizon", type=int, default=700)
    p.add_argument("--obs_noise", type=float, default=0.0,
                   help="IMU-noise sigma inside CEM refinement AND the "
                        "transfer rollouts (0.02 = suite condition): "
                        "measures the NOISE-ROBUST transfer matrix — "
                        "flatter winners may transfer better, moving the "
                        "blind fixed-strategy bound")
    p.add_argument("--cem_alive", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from tvc_ai_tpu.env import rocket_env
    from tvc_ai_tpu.eval.evaluate import _suite_env_params
    from tvc_ai_tpu.training import cem as cem_mod
    from tvc_ai_tpu.training import demos

    params = _suite_env_params(args.suite)
    sched = demos.design_lqr_schedule(params)
    ccfg = cem_mod.CEMConfig(
        pop=args.cem_pop, generations=args.cem_gens,
        horizon=args.cem_horizon,
        obs_noise_std=args.obs_noise, alive_weight=args.cem_alive,
    )

    n = args.episodes
    keys = jax.random.split(jax.random.PRNGKey(args.seed), n)
    states, _ = jax.vmap(rocket_env.reset, in_axes=(0, None))(keys, params)
    theta0 = cem_mod.theta_for_states(sched, states)
    t0 = time.time()
    theta, score = jax.jit(
        lambda k, s, t: cem_mod.refine_per_draw(k, params, s, t, ccfg)
    )(jax.random.PRNGKey(args.seed + 1), states, theta0)
    solved = np.asarray(score >= 0.5 * ccfg.success_bonus)
    idx = np.nonzero(solved)[0][: args.max_solved]
    m = len(idx)
    print(f"{args.suite}: {solved.mean():.1%} solved; transfer matrix on "
          f"{m} draws ({time.time() - t0:.0f}s refine)", flush=True)
    if m == 0:
        return 0

    sub_states = jax.tree.map(lambda x: x[idx], states)
    sub_theta = jnp.asarray(theta)[idx]

    # rows = controllers, cols = draws: roll controller i on draw j
    rep_states = jax.tree.map(
        lambda x: jnp.tile(x, (m,) + (1,) * (x.ndim - 1)), sub_states
    )  # draw index varies fastest
    rep_theta = jnp.repeat(sub_theta, m, axis=0)
    scores = jax.jit(
        lambda th, st: cem_mod.rollout_score(th, st, params, ccfg)
    )(rep_theta, rep_states)
    T = np.asarray(
        scores >= 0.5 * ccfg.success_bonus
    ).reshape(m, m)  # T[i, j]: controller i wins draw j

    wins_per_controller = T.sum(1)
    cover_best = wins_per_controller.max() / m
    # greedy set cover: how many controllers to win 90 % of solved draws
    covered = np.zeros(m, bool)
    picks = 0
    while covered.mean() < 0.9 and picks < m:
        gains = (T & ~covered).sum(1)
        best = int(gains.argmax())
        if gains[best] == 0:
            break
        covered |= T[best]
        picks += 1
    print(f"diagonal (own draw): {np.diag(T).mean():.1%}")
    print(f"off-diagonal transfer: "
          f"{(T.sum() - np.diag(T).sum()) / (m * m - m):.1%}")
    print(f"best single controller covers {cover_best:.1%} of solved draws")
    print(f"greedy cover of 90% needs {picks} controllers "
          f"(reached {covered.mean():.1%})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
