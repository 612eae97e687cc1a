#!/usr/bin/env python
"""Per-axis success breakdown of a distilled student on a suite.

Rolls the policy over a batch of suite draws, then reports strict success
by |cg|, mass, and thrust-scale bins plus the analytic feasibility labels
(scripts/suite_feasibility.py) — the diagnostic that locates WHICH part of
the draw box a policy loses (e.g. r4: the CEM-DAgger student matches the
privileged ceiling at cg≈0 but loses every |cg|>0.02 draw).

  python scripts/policy_breakdown.py --model outputs/dagger_r4_cem5/student.msgpack \
      --suite robustness [--trim_obs] [--history 8]
"""

import argparse
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   help="student.msgpack (SACState) or theta_student.msgpack")
    p.add_argument("--suite", default="robustness",
                   choices=["robustness", "stress"])
    p.add_argument("--episodes", type=int, default=1024)
    p.add_argument("--history", type=int, default=8)
    p.add_argument("--hidden", type=int, nargs="*", default=[256, 256])
    p.add_argument("--trim_obs", action="store_true")
    p.add_argument("--trim_mode", choices=["ema", "integral"], default="ema")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from tvc_ai_tpu.agents import sac as sac_mod
    from tvc_ai_tpu.env import rocket_env
    from tvc_ai_tpu.env.types import obs_dim as obs_dim_of
    from tvc_ai_tpu.eval import rollout as rollout_mod
    from tvc_ai_tpu.eval.evaluate import _suite_env_params
    from tvc_ai_tpu.training import theta_student as ts

    obs_overrides = dict(drift_obs_enabled=True, action_obs_enabled=True)
    if args.trim_obs:
        obs_overrides.update(
            trim_obs_enabled=True,
            trim_obs_integral=args.trim_mode == "integral",
        )
    params = _suite_env_params(args.suite, obs_overrides=obs_overrides)
    od = obs_dim_of(params)
    view_dim = od * args.history

    raw = Path(args.model).read_bytes()
    payload = serialization.msgpack_restore(raw)
    if isinstance(payload, dict) and payload.get("kind") == "theta_student":
        tcfg = ts.ThetaDaggerConfig(
            history_len=int(payload["history_len"]),
            hidden_dims=tuple(int(h) for h in payload["hidden_dims"]),
        )
        net = ts.ThetaNet(hidden_dims=tcfg.hidden_dims)
        tmpl = net.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, view_dim), jnp.float32))
        net_params = serialization.from_state_dict(tmpl, payload["params"])
        policy_fn = ts.make_theta_policy_fn(params, tcfg)
        agent = net_params
    else:
        sac_cfg = sac_mod.SACConfig(hidden_dims=tuple(args.hidden))
        tmpl = sac_mod.init(jax.random.PRNGKey(0), view_dim, 2, sac_cfg)
        agent = serialization.from_state_dict(tmpl, payload["state"])
        agent = agent.actor_params
        actor, _ = sac_mod.make_networks(view_dim, 2, sac_cfg)

        def policy_fn(p_, obs, k):
            mean, _ = actor.apply(p_, obs)
            return jnp.tanh(mean)

    # reproduce the eval reset draws to recover per-episode DR params
    n = args.episodes
    key = jax.random.PRNGKey(args.seed)
    k_reset, _ = jax.random.split(key)
    keys = jax.random.split(k_reset, n)
    states, _ = jax.vmap(rocket_env.reset, in_axes=(0, None))(keys, params)

    eval_fn = jax.jit(rollout_mod.make_policy_eval_fn(
        policy_fn, n, history_len=args.history))
    stats = eval_fn(agent, key, params)
    ok = np.asarray(stats.success).astype(bool)

    rp = params.rocket
    mass = np.asarray(states.dr.mass)
    tscale = np.asarray(states.dr.thrust_scale)
    cg = np.asarray(states.dr.cg_offset)
    cg_mag = np.linalg.norm(cg[:, :2], axis=1)
    g_eff = 2.0 * float(rp.gravity)
    mu = float(rp.contact_friction)
    sin_g = math.sin(float(rp.max_gimbal))
    thrust = tscale * float(rp.thrust)
    climb = thrust > mass * g_eff
    pinned = mu * (mass * g_eff - thrust) > thrust * sin_g
    theta_eq = np.arctan(2.0 * thrust * cg_mag / (mass * g_eff))
    infeas = climb | pinned | (theta_eq > 0.087)
    feas = ~infeas

    print(f"== {args.suite}: {ok.mean():.2%} strict overall "
          f"({ok[feas].mean() if feas.any() else 0:.2%} on analytically "
          f"feasible draws, {feas.mean():.1%} of the box) ==")
    print("by |cg| (feasible draws only):")
    for lo, hi in [(0, 0.005), (0.005, 0.01), (0.01, 0.02), (0.02, 0.035),
                   (0.035, 0.05), (0.05, 0.2)]:
        m = (cg_mag >= lo) & (cg_mag < hi) & feas
        if m.sum():
            print(f"  [{lo:.3f},{hi:.3f}) n={m.sum():4d} "
                  f"success={ok[m].mean():.1%}")
    print("by mass (feasible draws only):")
    edges = np.quantile(mass[feas], [0, 0.25, 0.5, 0.75, 1.0])
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = (mass >= lo) & (mass <= hi) & feas
        if m.sum():
            print(f"  [{lo:.2f},{hi:.2f}] n={m.sum():4d} "
                  f"success={ok[m].mean():.1%}")
    print("by thrust scale (feasible draws only):")
    edges = np.quantile(tscale[feas], [0, 0.25, 0.5, 0.75, 1.0])
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = (tscale >= lo) & (tscale <= hi) & feas
        if m.sum():
            print(f"  [{lo:.2f},{hi:.2f}] n={m.sum():4d} "
                  f"success={ok[m].mean():.1%}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
