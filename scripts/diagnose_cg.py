#!/usr/bin/env python
"""Forensic single-episode rollout under a FIXED CG offset.

The r3 campaigns all plateau at 0% success on any stage whose episodes
carry a CG offset, while nominal success stays anchored at 90-100%. This
tool answers WHY for a specific checkpoint: it rolls one deterministic
episode per requested cg magnitude (no other randomization, no sensor
noise) and prints, per episode, which success criterion fails and the
steady-state behavior (true tilt vs the equilibrium tilt atan(|cg|/L),
horizontal velocity/drift, |omega|, gimbal command vs the trim gimbal).

Usage:
  python scripts/diagnose_cg.py --model_path <ckpt> --hidden 256 256 \
      --history 4 --trim_obs [--cpu] [--cg 0.0 0.01 0.025 0.05]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--hidden", type=int, nargs="*", default=[256, 256])
    parser.add_argument("--history", type=int, default=1)
    parser.add_argument("--trim_obs", action="store_true")
    parser.add_argument("--trim_mode", choices=["ema", "integral"],
                        default="ema")
    parser.add_argument("--cg", type=float, nargs="*",
                        default=[0.0, 0.01, 0.025, 0.05])
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import dataclasses as dc
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tvc_ai_tpu.agents import sac as sac_mod
    from tvc_ai_tpu.env import rocket_env
    from tvc_ai_tpu.env.types import EnvParams, OBS_DIM, TRIM_OBS_DIM
    from tvc_ai_tpu.eval.evaluate import load_agent_state
    from tvc_ai_tpu.physics import quaternion as quat

    sac_cfg = sac_mod.SACConfig(hidden_dims=tuple(args.hidden))
    frame = OBS_DIM + (TRIM_OBS_DIM if args.trim_obs else 0)
    agent = load_agent_state(
        args.model_path, frame * args.history, 2, sac_cfg
    )

    params = EnvParams()
    if args.trim_obs:
        params = params.replace(
            trim_obs_enabled=True,
            trim_obs_integral=args.trim_mode == "integral",
        )

    @jax.jit
    def step_fn(state, action):
        return rocket_env.step(state, action, params)

    for cg in args.cg:
        state, obs = rocket_env.reset(jax.random.PRNGKey(0), params)
        state = dc.replace(
            state,
            dr=dc.replace(
                state.dr, cg_offset=jnp.array([cg, 0.0, 0.0], jnp.float32)
            ),
        )
        window = jnp.tile(obs, (args.history,)) if args.history > 1 else obs
        eq_tilt = math.atan2(cg, 0.5)
        rows = []
        success_steps = 0
        term_reason = "horizon"
        # thresholds come from the env's SuccessConfig (single source of
        # truth) so the forensic verdicts track any criteria change
        crit_cfg = params.success
        max_tilt = float(crit_cfg.max_tilt_angle)
        max_ang = float(crit_cfg.max_angular_velocity)
        max_hvel = float(crit_cfg.max_horizontal_velocity)
        max_vvel = float(crit_cfg.max_vertical_velocity)
        min_alt, max_alt = float(crit_cfg.min_altitude), float(crit_cfg.max_altitude)
        tilt = hvel = ang = 0.0
        alt = float(params.init_pos[2])
        for t in range(args.steps):
            a = sac_mod.select_action(
                agent, window[None], jax.random.PRNGKey(t), sac_cfg, 2, True
            )[0]
            state, out = step_fn(state, a)
            body = state.body
            tilt = float(quat.tilt_angle(body.quat))
            hvel = float(jnp.linalg.norm(body.vel[:2]))
            ang = float(jnp.linalg.norm(body.omega))
            alt = float(body.pos[2])
            ok = (
                tilt <= max_tilt
                and ang <= max_ang
                and hvel <= max_hvel
                and abs(float(body.vel[2])) <= max_vvel
                and min_alt <= alt <= max_alt
            )
            success_steps = success_steps + 1 if ok else 0
            if t % 100 == 0 or t == args.steps - 1:
                rows.append(
                    f"  t={t:4d} tilt={math.degrees(tilt):6.2f}deg "
                    f"(eq {math.degrees(eq_tilt):5.2f}) alt={alt:5.2f} "
                    f"hvel={hvel:5.2f} |w|={ang:5.2f} "
                    f"act=({float(a[0]):+.2f},{float(a[1]):+.2f}) "
                    f"drift={float(jnp.linalg.norm(body.pos[:2])):6.2f} "
                    f"okrun={success_steps}"
                )
            if bool(out.terminated):
                term_reason = (
                    "success" if bool(state.mission_success) else "termination"
                )
                rows.append(f"  t={t} TERMINATED ({term_reason})")
                break
            if args.history > 1:
                window = jnp.concatenate([window[frame:], out.obs])
            else:
                window = out.obs
        crit = []
        if tilt > max_tilt:
            crit.append(
                f"tilt {math.degrees(tilt):.1f}>{math.degrees(max_tilt):.0f}deg"
            )
        if ang > max_ang:
            crit.append(f"|w| {ang:.2f}>{max_ang:g}")
        if hvel > max_hvel:
            crit.append(f"hvel {hvel:.2f}>{max_hvel:g}")
        if not (min_alt <= alt <= max_alt):
            crit.append(f"alt {alt:.2f} outside [{min_alt:g},{max_alt:g}]")
        print(
            f"cg={cg:.3f}: end={term_reason} "
            f"final-fail=[{', '.join(crit) or 'none'}] "
            f"longest-ok-run-at-end={success_steps}"
        )
        for r in rows:
            print(r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
