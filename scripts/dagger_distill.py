#!/usr/bin/env python
"""Distill the gain-scheduled LQR teacher into a blind student policy.

The r4 robust-flight pipeline (training/dagger.py for the full measured
rationale): a privileged gain-scheduled LQR (reads each episode's true
mass/thrust draw — training/demos.py::design_lqr_schedule) labels the
student's own rollouts (DAgger), and the student — an MLP over a stacked
(obs + prev-action) history window — learns to reproduce it blind,
inferring the episode parameters from the response history.

The artifact is a full SACState msgpack (actor = the distilled student,
critic = fresh template) that scripts/evaluate.py loads directly, so the
official suites run on it unchanged:

  python scripts/dagger_distill.py --out outputs/dagger_r4
  python scripts/evaluate.py --model_path outputs/dagger_r4/student.msgpack \
      --run_config outputs/dagger_r4/config.yaml

Reference contract this targets: scripts/evaluate.py robustness/stress
suites (ref scripts/evaluate.py:338-391) and the 70-90 % disturbance
claim (ref GUIDE/STATE_OF_THE_ART_INTEGRATION.md:136-141).
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="outputs/dagger_r4")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--envs", type=int, default=512)
    p.add_argument("--rollout_steps", type=int, default=512)
    p.add_argument("--train_steps", type=int, default=1500)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--lr_cosine", action="store_true",
                   help="cosine-decay the BC learning rate over the whole "
                        "run (to lr/10) instead of constant Adam")
    p.add_argument("--history", type=int, default=8)
    p.add_argument("--hidden", type=int, nargs="*", default=[256, 256])
    p.add_argument("--beta0", type=float, default=1.0)
    p.add_argument("--beta_decay", type=float, default=0.6,
                   help="beta_i = beta0 * decay^i (prob. teacher drives)")
    p.add_argument("--beta_floor", type=float, default=0.0,
                   help="keep at least this much teacher-driving forever "
                        "(the labeled set then always includes on-teacher-"
                        "distribution states)")
    p.add_argument("--teacher", choices=["scheduled", "cem"],
                   default="cem",
                   help="'scheduled': gain-scheduled LQR (persistent envs, "
                        "autoreset); 'cem': per-draw CEM-refined controller "
                        "(fresh draws + episodic rollouts each iteration — "
                        "the only teacher measured competent on the full "
                        "suite distribution, training/cem.py)")
    p.add_argument("--cem_pop", type=int, default=32)
    p.add_argument("--cem_gens", type=int, default=15)
    p.add_argument("--cem_horizon", type=int, default=500)
    p.add_argument("--cem_anchor", type=float, default=0.0,
                   help="canonicalize per-draw CEM winners toward the "
                        "schedule init (score - w*|theta-theta0|^2) so "
                        "similar plants get similar labels across "
                        "iterations")
    p.add_argument("--cem_obs_noise", type=float, default=0.0,
                   help="refine teachers under IMU noise of this sigma "
                        "(cem.CEMConfig.obs_noise_std): labels come from "
                        "NOISE-ROBUST controllers instead of clean-feedback "
                        "knife-edge winners (r4 measured clean-refined "
                        "theta collapsing 11%% -> 0.8%% under the suite's "
                        "sigma=0.02 readings). 0.02 = the suite condition.")
    p.add_argument("--cem_alive", type=float, default=0.0,
                   help="survival term in the CEM score "
                        "(cem.CEMConfig.alive_weight): among controllers "
                        "with equal streaks prefer the longest survivor — "
                        "suppresses the argmax winner's curse under noisy "
                        "scoring")
    p.add_argument("--eval_episodes", type=int, default=128)
    p.add_argument("--save_every", type=int, default=0,
                   help="also save student_{iter:03d}.msgpack every N "
                        "iterations: the in-run best-iter selection is a "
                        "noisy argmax (r5 measured a 5.1%% in-run best "
                        "re-evaluating at 2.2%% on 512 fresh episodes); "
                        "periodic artifacts enable post-hoc reselection "
                        "with a big independent eval "
                        "(scripts/select_student.py)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    # student training distribution: slightly wider than the robustness
    # suite (mass +-30%, thrust +-20%, cg 0.05, wind 3) so the suite is
    # in-distribution; raise toward the stress suite with these knobs
    p.add_argument("--trim_obs", action="store_true",
                   help="add the 4 trim-observation channels (slow EMAs of "
                        "the presented tilt reading + commanded action) — "
                        "the long-horizon sufficient statistic for cg-trim "
                        "identification that a short stacked window cannot "
                        "integrate")
    p.add_argument("--trim_mode", choices=["ema", "integral"], default="ema")
    p.add_argument("--mass_variation", type=float, default=0.35)
    p.add_argument("--thrust_variation", type=float, default=0.25)
    p.add_argument("--cg_offset_max", type=float, default=0.06)
    p.add_argument("--wind_max", type=float, default=3.5)
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
    from tvc_ai_tpu.training import cem as cem_mod
    from tvc_ai_tpu.training import dagger, demos

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    obs_overrides = dict(
        drift_obs_enabled=True,
        action_obs_enabled=True,
    )
    if args.trim_obs:
        obs_overrides.update(
            trim_obs_enabled=True,
            trim_obs_integral=args.trim_mode == "integral",
        )
    # student training env: robustness-suite construction, widened DR
    train_params = _suite_env_params("robustness", obs_overrides=obs_overrides)
    train_params = train_params.replace(
        randomization=train_params.randomization.replace(
            mass_variation=jnp.float32(args.mass_variation),
            thrust_variation=jnp.float32(args.thrust_variation),
            cg_offset_max=jnp.float32(args.cg_offset_max),
            wind_max=jnp.float32(args.wind_max),
        )
    )
    eval_params = {
        "robustness": _suite_env_params("robustness", obs_overrides=obs_overrides),
        "stress": _suite_env_params("stress", obs_overrides=obs_overrides),
    }
    if args.cg_offset_max == 0.0:
        # cg-free training run (VERDICT ask #5 attribution): eval on the
        # matching cg=0 suite variant as the primary metric, keeping the
        # official suites for reference
        rob = eval_params["robustness"]
        eval_params = {
            "robust_cg0": rob.replace(
                randomization=rob.randomization.replace(
                    cg_offset_max=jnp.float32(0.0))),
            **eval_params,
        }

    obs_dim = obs_dim_of(train_params)
    act_dim = 2
    print(f"obs_dim={obs_dim} history={args.history} "
          f"view={obs_dim * args.history}")

    # ---- teacher: gain-scheduled LQR over the WIDENED (mass, thrust) box
    t0 = time.time()
    sched = demos.design_lqr_schedule(train_params)
    print(f"teacher schedule designed in {time.time() - t0:.0f}s")
    rp = train_params.rocket

    def teacher_fn(env_states):
        return demos.lqr_action_scheduled(
            env_states.body,
            sched,
            env_states.dr.mass,
            env_states.dr.thrust_scale,
            jnp.zeros_like(env_states.dr.cg_offset),
            rp,
        )

    # ---- student
    sac_cfg = sac_mod.SACConfig(hidden_dims=tuple(args.hidden))
    dcfg = dagger.DaggerConfig(
        num_envs=args.envs,
        rollout_steps=args.rollout_steps,
        capacity=(args.envs * args.rollout_steps) * 8,
        batch_size=args.batch,
        train_steps=args.train_steps,
        lr=args.lr,
        history_len=args.history,
    )
    key = jax.random.PRNGKey(args.seed)
    key, k_init, k_env = jax.random.split(key, 3)
    view_dim = obs_dim * args.history
    template = sac_mod.init(k_init, view_dim, act_dim, sac_cfg)
    import optax

    if args.lr_cosine:
        opt = optax.adam(optax.cosine_decay_schedule(
            dcfg.lr, args.iters * dcfg.train_steps, alpha=0.1))
    else:
        opt = optax.adam(dcfg.lr)
    if args.teacher == "cem":
        cem_cfg = cem_mod.CEMConfig(
            pop=args.cem_pop, generations=args.cem_gens,
            horizon=args.cem_horizon, anchor_weight=args.cem_anchor,
            obs_noise_std=args.cem_obs_noise, alive_weight=args.cem_alive,
        )
        state = dagger.init_cem_state(
            template.actor_params, opt, dcfg, obs_dim, act_dim
        )
        iteration = dagger.make_cem_dagger_iteration(
            train_params, sched, sac_cfg, dcfg, obs_dim, act_dim, cem_cfg,
            opt=opt,
        )
    else:
        state = dagger.init_state(
            k_env, train_params, template.actor_params, opt, dcfg,
            obs_dim, act_dim,
        )
        iteration = dagger.make_dagger_iteration(
            train_params, teacher_fn, sac_cfg, dcfg, obs_dim, act_dim,
            opt=opt,
        )

    # ---- evaluation: deterministic student on the OFFICIAL suite params
    actor, _ = sac_mod.make_networks(view_dim, act_dim, sac_cfg)

    def policy_fn(params, obs, k):
        mean, _ = actor.apply(params, obs)
        return jnp.tanh(mean)

    eval_fns = {
        name: jax.jit(
            rollout_mod.make_policy_eval_fn(
                policy_fn, args.eval_episodes, history_len=args.history
            ),
            static_argnums=(),
        )
        for name in eval_params
    }

    def evaluate(params, k):
        res = {}
        for name, fn in eval_fns.items():
            stats = fn(params, k, eval_params[name])
            res[name] = float(jnp.mean(stats.success))
        return res

    primary = next(iter(eval_params))  # robust_cg0 when training cg-free
    best = {primary: -1.0}
    history = []
    for i in range(args.iters):
        beta = max(args.beta_floor, args.beta0 * (args.beta_decay ** i))
        key, k_it, k_ev = jax.random.split(key, 3)
        t0 = time.time()
        state, metrics = iteration(state, k_it, jnp.float32(beta))
        metrics = {k: float(v) for k, v in metrics.items()}
        scores = evaluate(state.actor_params, k_ev)
        dt = time.time() - t0
        roll_sr = metrics["rollout_success"] / max(metrics["rollout_episodes"], 1)
        teach = (
            f"teacher_solved={metrics['teacher_solved']:.2%} "
            if "teacher_solved" in metrics
            else ""
        )
        suite_str = " ".join(f"{n}={scores[n]:.2%}" for n in scores)
        line = (
            f"iter {i:3d} beta={beta:.3f} "
            f"bc {metrics['bc_loss_first']:.5f}->{metrics['bc_loss_last']:.5f} "
            f"{teach}rollout_sr={roll_sr:.2%} "
            f"{suite_str} ({dt:.0f}s)"
        )
        print(line, flush=True)
        history.append({"iter": i, "beta": beta, **metrics, **scores})
        def _dump(path):
            artifact = template.replace(actor_params=state.actor_params)
            payload = serialization.msgpack_serialize(
                {"state": serialization.to_state_dict(artifact)}
            )
            path.write_bytes(payload)

        if scores[primary] > best[primary]:
            best = {"iter": i, **scores}
            _dump(out / "student.msgpack")
        if args.save_every and (i + 1) % args.save_every == 0:
            _dump(out / f"student_{i:03d}.msgpack")
    (out / "history.json").write_text(json.dumps(
        {"best": best, "history": history, "args": vars(args)}, indent=2))
    print(f"best: {best}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
