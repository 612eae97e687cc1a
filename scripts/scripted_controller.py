#!/usr/bin/env python
"""Scripted trim+PD / cascade / integral controller: the classical-control
feasibility probe.

Answers "can ANY controller pass the strict mission window under a fixed
CG offset?" without learning in the loop. Findings (RESULTS.md r3 final,
updated r4):

- at cg=0 the plain attitude PD passes the FULL 100-step strict window
  (success at t~99) — the criterion is reachable by classical control;
- at cg>=0.025 attitude PD + the EXACT trim feedforward (gimbal
  asin(2*cg), thrust line through the CG) fails: a PD holds a constant
  torque only with a steady-state error, the residual tilt drifts the
  vehicle laterally, and the touchdown converts lateral momentum into a
  topple about the friction-pinned base contact;
- a proportional velocity cascade (thrust target tipped against drift)
  fails the same way — true integral action is required;
- the INTEGRAL variant (r4): a velocity/position-drift outer loop
  (thrust target tipped against kv*v + kx*integral(v)) plus an integral
  term in the attitude loop — the "second, slower control loop around
  the attitude reflex" the r3 forensics prescribed. MEASURED: it also
  fails (grid search over kp/kd/kv/kx/ki; best in-window run 46/100 at
  cg 0.01, 42/100 at 0.025, dies t~140-190). Hand-structured PID around
  the HOVER trim is the wrong frame: with thrust < weight the success
  regime is GROUND balance, whose equilibrium tilts the body AWAY from
  the offset (tan(theta*) = -2*T*d/(m*g_eff) ~ -1.784*d) and whose only
  control authority while the base sticks is sliding the base through
  the friction cone. The definitive probe is scripts/lqr_balance.py:
  LQR/LQI synthesized from jax.jacobian of the true step map about the
  standing equilibrium.

With the reference's double-gravity quirk, thrust (35 N) < weight
(39.2 N), so hover is impossible and every success passes through ground
balance on the penalty-contact point (physics/integrator.py::contact_wrench).

Geometry (physics/integrator.py::thrust_body_vector, reference mapping
env/enhanced_rocket_tvc_env.py:539-543): action[0]=pitch drives body-y
force (torque_x = +0.5*T*sin(pitch)); action[1]=yaw drives body-x force
(torque_y = -0.5*T*sin(yaw)); the trim gimbal for cg=(dx,dy) is
pitch=asin(2*dy), yaw=asin(2*dx) (lever L=0.5 m).

Usage:
  python scripts/scripted_controller.py [--cpu] [--variant pd|cascade|integral]
      [--cg 0.0 0.01 0.025 0.04] [--kp 5] [--kd 2] [--kv 0.2] [--kx 0.5]
      [--ki 1.0] [--search]
"""

import argparse
import itertools
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cg", type=float, nargs="*",
                        default=[0.0, 0.01, 0.025, 0.04])
    parser.add_argument("--variant", choices=["pd", "cascade", "integral"],
                        default="pd")
    parser.add_argument("--kp", type=float, default=5.0)
    parser.add_argument("--kd", type=float, default=2.0)
    parser.add_argument("--kv", type=float, default=0.2,
                        help="velocity gain (cascade/integral variants)")
    parser.add_argument("--kx", type=float, default=0.5,
                        help="velocity-integral (drift) gain (integral variant)")
    parser.add_argument("--ki", type=float, default=1.0,
                        help="attitude-integral gain (integral variant)")
    parser.add_argument("--steps", type=int, default=900)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--search", action="store_true",
                        help="grid-search gains at each cg, report the best")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from tvc_ai_tpu.env import rocket_env
    from tvc_ai_tpu.env.types import EnvParams
    from tvc_ai_tpu.physics import quaternion as quat

    params = EnvParams()
    crit = params.success  # strict window thresholds, single source of truth
    max_gimbal = float(params.rocket.max_gimbal)
    thrust = float(params.rocket.thrust)
    dt = float(params.rocket.dt)
    step = jax.jit(lambda s, a: rocket_env.step(s, a, params))

    def controller(state, cg, gains, ctrl):
        """One control step. ``ctrl`` = (att_integral(2,), vel_integral(2,))."""
        kp, kd, kv, kx, ki = gains
        att_i, vel_i = ctrl
        q = state.body.quat
        w = state.body.omega
        ff_pitch = jnp.arcsin(jnp.clip(2.0 * cg[1], -0.9, 0.9))
        ff_yaw = jnp.arcsin(jnp.clip(2.0 * cg[0], -0.9, 0.9))
        # body-frame thrust direction at the trim gimbal
        f_hat = jnp.array([jnp.sin(ff_yaw), jnp.sin(ff_pitch),
                           jnp.cos(ff_pitch) * jnp.cos(ff_yaw)])
        f_world = quat.rotate(q, f_hat)
        tgt = jnp.array([0.0, 0.0, 1.0])
        if args.variant in ("cascade", "integral"):
            v = state.body.vel
            tip = -kv * v[:2]
            if args.variant == "integral":
                # velocity integral == position drift with anti-windup: the
                # outer loop that kills the lateral momentum PD leaves behind
                vel_i = jnp.clip(vel_i + v[:2] * dt, -1.0, 1.0)
                tip = tip - kx * vel_i
            tgt = jnp.concatenate([tip, jnp.ones(1)])
            tgt = tgt / jnp.linalg.norm(tgt)
        e = jnp.cross(f_world, tgt)  # drive the thrust line onto the target
        tau = kp * e - kd * w
        if args.variant == "integral":
            # attitude integral: absorbs the steady-state torque the PD
            # cannot hold (ground-contact trim differs from the free-flight
            # feedforward)
            att_i = jnp.clip(att_i + e[:2] * dt, -0.5, 0.5)
            tau = tau + ki * jnp.concatenate([att_i, jnp.zeros(1)])
        sp = jnp.clip(tau[0] / (0.5 * thrust), -0.9, 0.9)
        sy = jnp.clip(-tau[1] / (0.5 * thrust), -0.9, 0.9)
        act = jnp.array([(jnp.arcsin(sp) + ff_pitch) / max_gimbal,
                         (jnp.arcsin(sy) + ff_yaw) / max_gimbal])
        return jnp.clip(act, -1.0, 1.0), (att_i, vel_i)

    def rollout(cg_mag, gains, verbose=False):
        cgvec = jnp.array([cg_mag, 0.0, 0.0], jnp.float32)
        state, _ = rocket_env.reset(jax.random.PRNGKey(args.seed), params)
        state = dc.replace(state, dr=dc.replace(state.dr, cg_offset=cgvec))
        ctrl = (jnp.zeros(2), jnp.zeros(2))
        ok_run = best = 0
        success_at = died_at = None
        for t in range(args.steps):
            act, ctrl = controller(state, cgvec, gains, ctrl)
            state, out = step(state, act.astype(jnp.float32))
            tilt = float(out.tilt)
            w = float(out.angular_velocity_mag)
            alt = float(out.altitude)
            hv = float(jnp.linalg.norm(state.body.vel[:2]))
            vz = abs(float(state.body.vel[2]))
            good = (tilt < float(crit.max_tilt_angle)
                    and w < float(crit.max_angular_velocity)
                    and hv < float(crit.max_horizontal_velocity)
                    and float(crit.min_altitude) < alt < float(crit.max_altitude)
                    and vz < float(crit.max_vertical_velocity))
            ok_run = ok_run + 1 if good else 0
            best = max(best, ok_run)
            if verbose and t % 50 == 0:
                print(f"  t={t} tilt={math.degrees(tilt):.2f}deg |w|={w:.3f}"
                      f" alt={alt:.3f} hvel={hv:.3f} ok_run={ok_run}")
            if bool(out.mission_success):
                success_at = t
                break
            if bool(out.terminated):
                died_at = t
                break
        return success_at, died_at, best

    any_fail = False
    for cg_mag in args.cg:
        if args.search:
            grids = {
                "pd": ([3.0, 5.0, 8.0], [1.0, 2.0], [0.0], [0.0], [0.0]),
                "cascade": ([5.0], [2.0], [0.1, 0.2, 0.4], [0.0], [0.0]),
                "integral": ([5.0, 8.0], [1.5, 2.0], [0.15, 0.3, 0.5],
                             [0.3, 0.6, 1.2], [0.5, 1.0, 2.0]),
            }[args.variant]
            best_gain, best_result = None, (None, None, -1)
            for gains in itertools.product(*grids):
                s, d, b = rollout(cg_mag, gains)
                key = (s is not None, b)
                cur = (best_result[0] is not None, best_result[2])
                if key > cur:
                    best_gain, best_result = gains, (s, d, b)
                if s is not None:
                    break  # first passing gain set is enough
            success_at, died_at, best = best_result
            gain_part = f" gains={best_gain}"
        else:
            gains = (args.kp, args.kd, args.kv, args.kx, args.ki)
            success_at, died_at, best = rollout(cg_mag, gains, args.verbose)
            gain_part = ""
        status = (f"SUCCESS at t={success_at}" if success_at is not None
                  else f"died at t={died_at}" if died_at is not None
                  else "survived horizon, no window")
        if success_at is None:
            any_fail = True
        print(f"cg={cg_mag:.3f} [{args.variant}]: {status} "
              f"(best in-window run {best}/100){gain_part}")
    return 1 if any_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
