#!/usr/bin/env python
"""Evaluate the blind identification pilot on the official suites.

The pilot (``training/pilot.py``) is a model-based BLIND policy: a
particle filter over the domain-randomization draw feeding a
gain-scheduled LQR, with per-draw CEM replanning on the *identified*
plant at the --replan step indices. It consumes only the observation
stream (drift channels on, like every r4 student) — never the env's true
state or draw.

Context (RESULTS.md r4): privileged per-draw ceiling ≈11 % on the
robustness suite; best blind FIXED-strategy bound ≈3.9 %; every distilled
student 2.9-4.1 %. This script measures how much of the identification
race the filter wins.

  python scripts/pilot_eval.py --episodes 512 [--suite robustness]
      [--particles 192] [--replan 50,300] [--diag]
"""

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--suite", default="robustness",
                   choices=["robustness", "stress"])
    p.add_argument("--episodes", type=int, default=512)
    p.add_argument("--steps", type=int, default=0,
                   help="horizon (0 = the suite's max_episode_steps)")
    p.add_argument("--particles", type=int, default=192)
    p.add_argument("--replan", default="50,300",
                   help="comma-separated step indices for CEM replanning "
                        "('' = never: scheduled-LQR-on-posterior only)")
    p.add_argument("--cem_pop", type=int, default=64)
    p.add_argument("--cem_gens", type=int, default=25)
    p.add_argument("--cem_horizon", type=int, default=700)
    p.add_argument("--sigma_drift", type=float, default=0.02)
    p.add_argument("--jitter_frac", type=float, default=0.25)
    p.add_argument("--library", default=None,
                   help="controller-library .npz (build_ctrl_library.py): "
                        "start on library[0] and posterior-select at the "
                        "--select step indices instead of CEM replanning")
    p.add_argument("--select", default="25,150",
                   help="comma-separated step indices for library selection")
    p.add_argument("--select_samples", type=int, default=8,
                   help="posterior particles scored per selection")
    p.add_argument("--select_horizon", type=int, default=500,
                   help="model-rollout length per selection score")
    p.add_argument("--select_noise", type=float, default=0.0,
                   help="obs_noise_std for the selection scoring rollouts "
                        "(0 = clean feedback; set to the suite's IMU σ so "
                        "members are ranked by executed-under-noise "
                        "performance, not knife-edge in-model scores)")
    p.add_argument("--state_from_obs", action="store_true",
                   help="feed the control law the raw observed state "
                        "(IMU + INS channels; z/vz from the posterior) "
                        "instead of the posterior-mean body")
    p.add_argument("--oracle_dr", action="store_true",
                   help="PROBE (privileged): replan on the episode's TRUE "
                        "draw instead of the posterior — isolates how much "
                        "identification error costs")
    p.add_argument("--oracle_state", action="store_true",
                   help="PROBE (privileged): replan from the episode's TRUE "
                        "body state/fuel instead of the posterior mean")
    p.add_argument("--cg_offset_max", type=float, default=None)
    p.add_argument("--sensor_noise", type=int, default=None,
                   help="override suite sensor noise (0/1)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--diag", action="store_true",
                   help="print identification error vs the true draw at "
                        "each replan (reporting only — the pilot never "
                        "sees the truth)")
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
    from tvc_ai_tpu.training import pilot as pilot_mod

    params = _suite_env_params(
        args.suite,
        obs_overrides={"drift_obs_enabled": True},
        cg_offset_max=args.cg_offset_max,
        sensor_noise=(None if args.sensor_noise is None
                      else bool(args.sensor_noise)),
    )
    sched = demos.design_lqr_schedule(params)
    pcfg = pilot_mod.PilotConfig(
        particles=args.particles,
        sigma_drift=args.sigma_drift,
        jitter_frac=args.jitter_frac,
        state_from_obs=args.state_from_obs,
    )
    ccfg = cem_mod.CEMConfig(
        pop=args.cem_pop, generations=args.cem_gens,
        horizon=args.cem_horizon,
    )
    library = None
    if args.library:
        import numpy as _np

        blob = _np.load(args.library, allow_pickle=False)
        library = jnp.asarray(blob["theta"])
        print(f"library: {library.shape[0]} controllers from "
              f"{args.library} (fresh ceiling "
              f"{float(blob['fresh_lib_ceiling']):.1%}, best single "
              f"{float(blob['fresh_best_single']):.1%})")
        events = [int(s) for s in args.select.split(",") if s.strip()]
    else:
        events = [int(s) for s in args.replan.split(",") if s.strip()]
    replans = events
    horizon = args.steps or params.max_episode_steps
    n = args.episodes

    keys = jax.random.split(jax.random.PRNGKey(args.seed), n)
    states, obs0 = jax.vmap(rocket_env.reset, in_axes=(0, None))(keys, params)
    true_dr = states.dr  # held for --diag reporting only

    pkeys = jax.random.split(jax.random.PRNGKey(args.seed + 1), n)
    ps = jax.vmap(pilot_mod.init_pilot, in_axes=(0, 0, None, None))(
        pkeys, obs0, params, pcfg
    )
    if library is not None:
        # pre-identification strategy: the best-coverage member
        ps = ps._replace(
            theta=jnp.broadcast_to(library[0], ps.theta.shape),
            has_theta=jnp.ones_like(ps.has_theta),
        )
    # shape template for replan's hypothetical states (contents overwritten
    # by the pilot's own estimates — fresh keys, nothing from the episode)
    tkeys = jax.random.split(jax.random.PRNGKey(args.seed + 2), n)
    template, _ = jax.vmap(rocket_env.reset, in_axes=(0, None))(tkeys, params)

    act_fn = jax.vmap(
        lambda s: pilot_mod.pilot_act(s, sched, params, pcfg), in_axes=0
    )
    obs_fn = jax.vmap(
        lambda s, o: pilot_mod.pilot_observe(s, o, params, pcfg),
        in_axes=(0, 0),
    )

    def segment(carry, length):
        def step_fn(c, _):
            st, done, succ, ps = c
            ps, act = act_fn(ps)
            nxt, out, _ = rocket_env.batched_step_autoreset(
                st, act, params, use_pallas=False
            )
            ep_done = out.terminated | out.truncated
            succ = succ | (~done & out.mission_success)
            nxt = jax.tree.map(
                lambda new, old: jnp.where(
                    done.reshape(done.shape + (1,) * (new.ndim - done.ndim)),
                    old, new),
                nxt, st,
            )
            ps = obs_fn(ps, out.obs)
            return (nxt, done | ep_done, succ, ps), None

        return jax.lax.scan(step_fn, carry, None, length=length)[0]

    seg_jit = jax.jit(segment, static_argnums=1)

    if library is not None:
        score_cfg = cem_mod.CEMConfig(
            horizon=args.select_horizon, alive_weight=0.1,
            obs_noise_std=args.select_noise,
        )

        def _replan(k, ps, st):
            return pilot_mod.select_from_library(
                k, ps, library, params, score_cfg, template,
                n_samples=args.select_samples,
                bodies=st.body if args.oracle_state else None,
                drs=st.dr if args.oracle_dr else None,
                fuel=st.fuel if args.oracle_state else None,
            )
    else:
        def _replan(k, ps, st):
            bodies = (st.body if args.oracle_state
                      else jax.vmap(pilot_mod.estimate_body)(ps.filt))
            drs = (st.dr if args.oracle_dr
                   else jax.vmap(pilot_mod.estimate_dr)(ps.filt))
            fuel = st.fuel if args.oracle_state else ps.filt.fuel
            return pilot_mod.replan_from(
                k, ps, bodies, drs, fuel, sched, params, ccfg, template
            )

    # library selection runs EAGERLY: jitting the whole selection (the
    # (N, particles) posterior gather + the N·S·K noisy scoring scan in ONE
    # program) hangs XLA/axon compilation at P=192 — measured >1200 s,
    # while P=32-jitted, P=192-eager, and the clean-feedback P=192-jitted
    # variants all finish in 37-82 s. Eager selection costs ~60 s and runs
    # at most a few times per eval.
    replan_jit = _replan if library is not None else jax.jit(_replan)

    bounds = sorted(set([0] + [t for t in replans if 0 < t < horizon]
                        + [horizon]))
    carry = (states, jnp.zeros(n, bool), jnp.zeros(n, bool), ps)
    rkey = jax.random.PRNGKey(args.seed + 3)
    t0 = time.time()
    for a, b in zip(bounds[:-1], bounds[1:]):
        carry = seg_jit(carry, b - a)
        st, done, succ, ps = carry
        if b < horizon:
            if args.diag:
                _diag(ps, true_dr, done, b, pilot_mod, jax, np)
            rkey, k = jax.random.split(rkey)
            ps = replan_jit(k, ps, st)
            carry = (st, done, succ, ps)
    _, done, succ, ps = carry
    ok = np.asarray(succ)
    dt = time.time() - t0
    tags = "".join(
        f" {t}" for t, on in [("obs-state", args.state_from_obs),
                              ("ORACLE-DR", args.oracle_dr),
                              ("ORACLE-STATE", args.oracle_state)] if on
    )
    mode = (f"select@{replans} K={library.shape[0]}"
            if library is not None else f"replan@{replans}")
    print(f"== {args.suite} suite: pilot strict success "
          f"{ok.mean():.1%} ({int(ok.sum())}/{n}, {dt:.0f}s, "
          f"P={args.particles}, {mode}{tags}) ==")
    _breakdown(params, true_dr, ok, np)
    return 0


def _diag(ps, true_dr, done, t, pilot_mod, jax, np):
    est = jax.vmap(pilot_mod.estimate_dr)(ps.filt)
    live = ~np.asarray(done)
    if live.sum() == 0:
        return
    em = np.abs(np.asarray(est.mass - true_dr.mass))[live]
    et = np.abs(np.asarray(est.thrust_scale - true_dr.thrust_scale))[live]
    ec = np.linalg.norm(
        np.asarray(est.cg_offset - true_dr.cg_offset)[:, :2], axis=1)[live]
    ew = np.linalg.norm(
        np.asarray(est.wind - true_dr.wind)[:, :2], axis=1)[live]
    print(f"  [t={t} id-error (live {live.sum()}): "
          f"mass {np.median(em):.3f} kg, thrust {np.median(et):.3f}, "
          f"cg {np.median(ec)*1000:.1f} mm, wind {np.median(ew):.2f} N "
          f"(medians)]")


def _breakdown(params, dr, ok, np):
    """Feasibility-class breakdown (same analytic labels as
    scripts/suite_feasibility.py::_report)."""
    rp = params.rocket
    mass = np.asarray(dr.mass)
    tscale = np.asarray(dr.thrust_scale)
    cg = np.asarray(dr.cg_offset)
    cg_mag = np.linalg.norm(cg[:, :2], axis=1)
    g_eff = 2.0 * float(rp.gravity)
    mu = float(rp.contact_friction)
    sin_g = math.sin(float(rp.max_gimbal))
    thrust = tscale * float(rp.thrust)
    climb = thrust > mass * g_eff
    pinned = ~climb & (mu * (mass * g_eff - thrust) > thrust * sin_g)
    tilt_lim = float(params.success.max_tilt_angle)
    eq_tilt = np.arctan(2.0 * thrust * cg_mag / (mass * g_eff))
    tilted = ~climb & ~pinned & (eq_tilt > tilt_lim)
    feasible = ~climb & ~pinned & ~tilted
    for name, m in [("feasible", feasible), ("climb-away", climb),
                    ("friction-pinned", pinned), ("eq-tilt>5deg", tilted)]:
        if m.sum():
            print(f"  {name:>15}: {ok[m].mean():6.1%}  "
                  f"({int(ok[m].sum())}/{int(m.sum())})")


if __name__ == "__main__":
    sys.exit(main())
