#!/usr/bin/env python
"""Empirical feasibility oracle for the evaluation suites.

Runs the blind ground-balance LQR (training/demos.py — the best known
controller for this plant) over the EXACT robustness / stress suite
distributions (eval/evaluate.py::_suite_env_params, mirroring the
reference's scripts/evaluate.py:338-391) and reports its strict success
rate with a per-axis breakdown. This replaces the r3 analytic ceiling
(which modeled only single-axis cg draws) with a measured bound:

- mass draws below thrust/(2g) = 1.784 kg make thrust exceed the
  double-gravity weight — the vehicle climbs away from the ground-balance
  regime and (with the 100-step window unreachable in free fall + ceiling
  termination at 10 m) those episodes are unwinnable by ANY controller;
- |cg_xy| beyond ~0.049 m tips the standing equilibrium outside the
  5-degree window (tan(theta*) = 2*T*d/(m*g_eff));
- the remaining draws are feasible in principle; the LQR's score on them
  is a lower bound on attainable (it has measured direction-dependent
  marginal stability on mixed-ratio cg draws).

Usage:
  python scripts/suite_feasibility.py [--cpu] [--episodes 200] [--seed 0]
      [--suite robustness stress]
"""

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--suite", nargs="*",
                        default=["robustness", "stress"])
    parser.add_argument("--episodes", type=int, default=200)
    parser.add_argument("--steps", type=int, default=0,
                        help="horizon (0 = the suite's own max_episode_steps)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--scheduled", action="store_true",
                        help="use the gain-scheduled privileged LQR teacher "
                             "(training/demos.py::design_lqr_schedule) instead "
                             "of the fixed nominal-plant design")
    parser.add_argument("--cem", action="store_true",
                        help="per-draw CEM refinement on top of the schedule "
                             "(training/cem.py): 'does ANY linear ground-"
                             "balance controller win this exact episode?' — "
                             "the measured attainable ceiling per suite")
    parser.add_argument("--cem_pop", type=int, default=64)
    parser.add_argument("--cem_gens", type=int, default=25)
    parser.add_argument("--cem_horizon", type=int, default=700)
    parser.add_argument("--reroll", type=int, default=0,
                        help="with --cem --obs_noise>0: re-roll each "
                             "refined controller N times with fresh noise "
                             "and report the EXPECTED ceiling E[P(win)] — "
                             "the single-rollout solved bit is an "
                             "existence proof that overestimates executed "
                             "performance (winner's curse)")
    parser.add_argument("--obs_noise", type=float, default=0.0,
                        help="model IMU noise (sigma on quat/omega) inside "
                             "the CEM scoring rollouts — 0.02 measures the "
                             "noise-robust oracle ceiling instead of the "
                             "clean-feedback (in-model) one")
    parser.add_argument("--student_view", action="store_true",
                        help="restrict the CEM search to gains on state the "
                             "blind student's observation actually carries "
                             "(zero the dz/vz feedback columns): measures "
                             "how much of the ceiling is unreachable for "
                             "any policy over the current obs layout")
    # single-axis ablation knobs: override the suite's DR box to isolate
    # which axis defeats the controller (e.g. --wind_max 0 --cg_max 0
    # leaves only the (mass, thrust) draws active)
    parser.add_argument("--cg_max", type=float, default=None)
    parser.add_argument("--wind_max", type=float, default=None)
    parser.add_argument("--mass_var", type=float, default=None)
    parser.add_argument("--thrust_var", type=float, default=None)
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from tvc_ai_tpu.env import rocket_env
    from tvc_ai_tpu.eval.evaluate import _suite_env_params
    from tvc_ai_tpu.training import demos

    design = None
    sched = None
    for suite in args.suite:
        params = _suite_env_params(suite)
        overrides = {
            "cg_offset_max": args.cg_max,
            "wind_max": args.wind_max,
            "mass_variation": args.mass_var,
            "thrust_variation": args.thrust_var,
        }
        overrides = {k: jnp.float32(v) for k, v in overrides.items()
                     if v is not None}
        if overrides:
            params = params.replace(
                randomization=params.randomization.replace(**overrides)
            )
            print(f"  [ablation overrides: "
                  f"{ {k: float(v) for k, v in overrides.items()} }]")
        if args.scheduled or args.cem:
            # re-synthesize per suite: the stress suite's wider (mass,
            # thrust) box needs its own grid extent
            sched = demos.design_lqr_schedule(params)
        elif design is None:
            design = demos.design_lqr(params)
        rp = params.rocket
        n = args.episodes
        horizon = args.steps or params.max_episode_steps
        keys = jax.random.split(jax.random.PRNGKey(args.seed), n)
        states, _ = jax.vmap(rocket_env.reset, in_axes=(0, None))(keys, params)
        d0 = jnp.zeros((n, 3), jnp.float32)

        if args.cem:
            from tvc_ai_tpu.training import cem as cem_mod

            ccfg = cem_mod.CEMConfig(
                pop=args.cem_pop, generations=args.cem_gens,
                horizon=args.cem_horizon, obs_noise_std=args.obs_noise,
            )
            theta0 = cem_mod.theta_for_states(sched, states)
            mask = None
            if args.student_view:
                # theta layout (cem.py): per-plane gains over
                # [x, dz, tilt, vx, vz, omega]; dz/vz sit at 1, 4 (yaw)
                # and 7, 10 (pitch). z_eq (14) only feeds dz — zero it too.
                mask = jnp.ones((cem_mod.THETA_DIM,), jnp.float32)
                mask = mask.at[jnp.array([1, 4, 7, 10, 14])].set(0.0)
            t0 = time.time()
            theta, score = jax.jit(
                lambda k, s, t: cem_mod.refine_per_draw(
                    k, params, s, t, ccfg, theta_mask=mask
                )
            )(jax.random.PRNGKey(args.seed + 1), states, theta0)
            score = np.asarray(score)
            # a strict-window success scores >= success_bonus (1000); the
            # best non-success streak tops out at 99 + shaping
            ok = score >= 0.5 * ccfg.success_bonus
            print(f"== {suite} suite ({n} episodes, CEM oracle) ==")
            print(f"  [CEM refine: pop {ccfg.pop} x gens {ccfg.generations} "
                  f"x horizon {ccfg.horizon}, {time.time() - t0:.0f}s]")
            _report(suite, args, params, rp, states, ok, np)
            if args.reroll > 0 and args.obs_noise > 0:
                # honest EXPECTED ceiling under execution noise: the
                # single-rollout "solved" bit is an existence statement
                # (the search found one passing noisy rollout) that
                # overestimates the re-roll win probability (r5 measured:
                # robustness 13.5% solved-once vs 3.3% expected; stress
                # 1.8% vs 0.54%). Re-roll every draw's refined controller
                # with fresh noise keys and report E[P(win|draw)].
                score_fn = jax.jit(
                    lambda th, st, k: cem_mod.rollout_score(
                        th, st, params, ccfg, key=k
                    )
                )
                wins = np.zeros(n)
                for r in range(args.reroll):
                    s = score_fn(
                        theta, states, jax.random.PRNGKey(args.seed + 7 + r)
                    )
                    wins += np.asarray(s >= 0.5 * ccfg.success_bonus)
                p_win = wins / args.reroll
                print(
                    f"  honest re-rolled ceiling ({args.reroll} fresh-noise "
                    f"re-rolls/draw): E[P(win)] = {p_win.mean():.2%}; "
                    f"P(win|solved-once) = "
                    f"{p_win[ok].mean() if ok.any() else 0.0:.2%}; "
                    f"draws with P(win)>=0.5: {(p_win >= 0.5).mean():.2%}"
                )
            continue

        @jax.jit
        def roll(states):
            def step_fn(st, _):
                if args.scheduled:
                    act = demos.lqr_action_scheduled(
                        st.body, sched, st.dr.mass, st.dr.thrust_scale,
                        d0, rp,
                    )
                else:
                    act = demos.lqr_action(st.body, design, d0, rp)
                nxt, out, _ = rocket_env.batched_step_autoreset(
                    st, act, params, use_pallas=False
                )
                return nxt, (out.terminated | out.truncated,
                             out.mission_success)
            _, (dones, succ) = jax.lax.scan(
                step_fn, states, None, length=horizon
            )
            return dones, succ

        dones, succ = roll(states)
        dn = np.asarray(dones)
        sc = np.asarray(succ)
        first_done = dn.argmax(0)
        ended = dn.any(0)
        # first-episode outcome per env slot = one suite episode each
        ok = np.where(ended, sc[first_done, np.arange(n)], sc[-1])
        print(f"== {suite} suite ({n} episodes, horizon {horizon}) ==")
        _report(suite, args, params, rp, states, ok, np)
    return 0


def _report(suite, args, params, rp, states, ok, np):
    """Per-axis breakdown of strict success vs the analytic feasibility
    labels. Three analytically-infeasible classes (r4, measured against
    the CEM oracle):
    - climb-away: thrust > double-gravity weight — vertical force is
      positive at any in-window tilt, altitude exits the 2 m bound
      (marginal draws with <~4% excess can still win: 100 steps = 2 s);
    - friction-pinned: stiction exceeds max lateral thrust
      (mu*(m*g_eff - T) > T*sin(gimbal_max)) — the base cannot slide, and
      thrust applies AT the contact so gimbal torque about the pivot ~ 0;
    - equilibrium tilt: tan(theta*) = 2*T*d/(m*g_eff) beyond the 5 deg
      window at the draw's cg offset.
    """
    ok = np.asarray(ok)
    mass = np.asarray(states.dr.mass)
    cg = np.asarray(states.dr.cg_offset)
    cg_mag = np.linalg.norm(cg[:, :2], axis=1)
    thrust_w = float(rp.thrust)  # nominal; per-episode scale below
    tscale = np.asarray(states.dr.thrust_scale)
    g_eff = 2.0 * float(rp.gravity)
    mu = float(rp.contact_friction)
    sin_g = math.sin(float(rp.max_gimbal))
    thrust = tscale * thrust_w
    climb_away = thrust > mass * g_eff
    pinned = mu * (mass * g_eff - thrust) > thrust * sin_g
    theta_eq = np.arctan(2.0 * thrust * cg_mag / (mass * g_eff))
    tilt_infeasible = theta_eq > 0.087  # strict window tilt bound
    infeasible = climb_away | pinned | tilt_infeasible
    feas = ~infeasible

    print(f"  physics-infeasible: {infeasible.mean():.1%} "
          f"(climb-away {climb_away.mean():.1%}, "
          f"friction-pinned {pinned.mean():.1%}, "
          f"equilibrium tilt > 5deg {tilt_infeasible.mean():.1%})")
    print(f"  strict success: {ok.mean():.1%} overall; "
          f"{ok[feas].mean() if feas.any() else 0:.1%} on feasible draws; "
          f"{ok[infeasible].mean() if infeasible.any() else 0:.1%} on "
          f"infeasible draws (analytic labels are approximate at the "
          f"band edges)")
    for lo, hi in [(0, 0.02), (0.02, 0.035), (0.035, 0.05), (0.05, 0.2)]:
        m = (cg_mag >= lo) & (cg_mag < hi) & ~climb_away & ~pinned
        if m.sum():
            print(f"    |cg| in [{lo:.3f},{hi:.3f}) n={m.sum():4d} "
                  f"success={ok[m].mean():.1%}")


if __name__ == "__main__":
    sys.exit(main())
