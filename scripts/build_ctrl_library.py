#!/usr/bin/env python
"""Build a greedy set-cover controller library for the identification pilot.

The r4 cross-transfer measurement (scripts/cross_transfer.py, RESULTS.md)
showed the robustness suite's solved draws need ~22 distinct linear
controllers to cover 90 % — one fixed strategy caps at ~3.9 % of the suite
while the privileged per-draw oracle reaches ~11 %. This script turns that
finding into an artifact the blind pilot can select from at flight time:

1. CEM-solve a large draw batch (the per-draw privileged oracle);
2. build the controller×draw transfer matrix on the solved set;
3. greedy set cover → K controllers ordered by marginal coverage
   (library[0] is the single best-coverage controller — the pilot's
   pre-identification strategy);
4. validate on FRESH draws (different seed): the library ceiling
   (fresh draw solved by ANY member) upper-bounds what posterior-scored
   selection (training/pilot.py::select_from_library) can reach;
5. save θ rows + stats to an .npz the pilot loads.

Reference contract served: the robustness/stress evaluation suites
(ref scripts/evaluate.py:338-391).

  python scripts/build_ctrl_library.py --episodes 1024 --k 24 \
      [--suite robustness] [--out tvc_ai_tpu/data/ctrl_library_robustness.npz]
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
    p.add_argument("--episodes", type=int, default=1024,
                   help="draws to CEM-solve for library construction")
    p.add_argument("--fresh", type=int, default=512,
                   help="fresh validation draws")
    p.add_argument("--k", type=int, default=24, help="max library size")
    p.add_argument("--max_solved", type=int, default=128,
                   help="cap the transfer-matrix side")
    p.add_argument("--cem_pop", type=int, default=64)
    p.add_argument("--cem_gens", type=int, default=25)
    p.add_argument("--cem_horizon", type=int, default=700)
    p.add_argument("--obs_noise", type=float, default=0.02,
                   help="IMU noise sigma modeled inside CEM scoring — the "
                        "deployment condition (0 = the r4 clean-feedback "
                        "oracle whose controllers collapse under the "
                        "suite's real readings)")
    p.add_argument("--student_view", action="store_true",
                   help="zero the dz/vz gain columns and z_eq (theta "
                        "indices 1,4,7,10,14) so every controller input is "
                        "a directly observed channel (x,y from the INS "
                        "drift block; tilt/omega from the IMU) — measured "
                        "to cost ~nothing on the clean oracle (10.9% vs "
                        "11%) and it removes the pilot's only dependence "
                        "on estimated state in the CONTROL path")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fresh_seed", type=int, default=1000)
    p.add_argument("--out", default=None)
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
        horizon=args.cem_horizon, obs_noise_std=args.obs_noise,
    )
    win = 0.5 * ccfg.success_bonus

    # 1. per-draw oracle on the construction batch
    n = args.episodes
    keys = jax.random.split(jax.random.PRNGKey(args.seed), n)
    states, _ = jax.vmap(rocket_env.reset, in_axes=(0, None))(keys, params)
    theta0 = cem_mod.theta_for_states(sched, states)
    mask = None
    if args.student_view:
        mask = jnp.ones((cem_mod.THETA_DIM,), jnp.float32)
        mask = mask.at[jnp.array([1, 4, 7, 10, 14])].set(0.0)
    t0 = time.time()
    theta, score = jax.jit(
        lambda k, s, t: cem_mod.refine_per_draw(
            k, params, s, t, ccfg, theta_mask=mask
        )
    )(jax.random.PRNGKey(args.seed + 1), states, theta0)
    solved = np.asarray(score >= win)
    print(f"{args.suite}: {solved.mean():.1%} of {n} draws solved "
          f"({time.time() - t0:.0f}s)", flush=True)
    idx = np.nonzero(solved)[0][: args.max_solved]
    m = len(idx)
    if m == 0:
        print("no solved draws — nothing to build")
        return 1

    # 2. transfer matrix on the solved subset
    sub_states = jax.tree.map(lambda x: x[idx], states)
    sub_theta = jnp.asarray(theta)[idx]
    rep_states = jax.tree.map(
        lambda x: jnp.tile(x, (m,) + (1,) * (x.ndim - 1)), sub_states
    )
    rep_theta = jnp.repeat(sub_theta, m, axis=0)
    t0 = time.time()
    scores = jax.jit(
        lambda th, st: cem_mod.rollout_score(th, st, params, ccfg)
    )(rep_theta, rep_states)
    T = np.asarray(scores >= win).reshape(m, m)
    print(f"transfer matrix {m}x{m}: diagonal {np.diag(T).mean():.1%}, "
          f"off-diag {(T.sum() - np.diag(T).sum()) / max(m * m - m, 1):.1%} "
          f"({time.time() - t0:.0f}s)", flush=True)

    # 3. greedy set cover, ordered by marginal coverage
    covered = np.zeros(m, bool)
    picks: list[int] = []
    while len(picks) < args.k:
        gains = (T & ~covered).sum(1)
        best = int(gains.argmax())
        if gains[best] == 0:
            break
        picks.append(best)
        covered |= T[best]
        print(f"  pick {len(picks):2d}: controller of draw {idx[best]} "
              f"+{gains[best]} draws → cover {covered.mean():.1%}")
    lib = np.asarray(sub_theta)[picks]  # (K, THETA_DIM)
    k = len(picks)

    # 4. fresh-draw validation: library ceiling = any member wins
    f = args.fresh
    fkeys = jax.random.split(jax.random.PRNGKey(args.fresh_seed), f)
    fstates, _ = jax.vmap(rocket_env.reset, in_axes=(0, None))(fkeys, params)
    frep_states = jax.tree.map(
        lambda x: jnp.tile(x, (k,) + (1,) * (x.ndim - 1)), fstates
    )
    frep_theta = jnp.repeat(jnp.asarray(lib), f, axis=0)
    t0 = time.time()
    fscores = jax.jit(
        lambda th, st: cem_mod.rollout_score(th, st, params, ccfg)
    )(frep_theta, frep_states)
    FT = np.asarray(fscores >= win).reshape(k, f)
    lib_ceiling = FT.any(0).mean()
    best_single = FT.sum(1).max() / f
    print(f"fresh {f} draws ({time.time() - t0:.0f}s): library ceiling "
          f"{lib_ceiling:.1%} (any of {k}), best single member "
          f"{best_single:.1%}, member[0] {FT[0].mean():.1%}")

    out = args.out or f"tvc_ai_tpu/data/ctrl_library_{args.suite}.npz"
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        out,
        theta=lib.astype(np.float32),
        suite=np.array(args.suite),
        construction_draws=np.int32(n),
        solved_frac=np.float32(solved.mean()),
        cover_frac=np.float32(covered.mean()),
        fresh_lib_ceiling=np.float32(lib_ceiling),
        fresh_best_single=np.float32(best_single),
        cem_pop=np.int32(ccfg.pop),
        cem_gens=np.int32(ccfg.generations),
        cem_horizon=np.int32(ccfg.horizon),
        obs_noise_std=np.float32(ccfg.obs_noise_std),
        student_view=np.bool_(args.student_view),
        seed=np.int32(args.seed),
    )
    print(f"library ({k} controllers) → {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
