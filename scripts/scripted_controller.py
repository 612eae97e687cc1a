#!/usr/bin/env python
"""Scripted trim+PD controller: the classical-control feasibility probe.

Answers "can ANY controller pass the strict mission window under a fixed
CG offset?" without learning in the loop. Findings (RESULTS.md r3 final):

- at cg=0 the plain attitude PD passes the FULL 100-step strict window
  (success at t~99) — the criterion is reachable by classical control;
- at cg>=0.025 attitude PD + the EXACT trim feedforward (gimbal
  asin(2*cg), thrust line through the CG) fails: a PD holds a constant
  torque only with a steady-state error, the residual tilt drifts the
  vehicle laterally, and the touchdown converts lateral momentum into a
  topple about the friction-pinned base contact;
- a proportional velocity cascade (thrust target tipped against drift)
  fails the same way — true integral action is required.

With the reference's double-gravity quirk, thrust (35 N) < weight
(39.2 N), so hover is impossible and every success passes through ground
balance on the penalty-contact point (physics/integrator.py::contact_wrench).

Geometry (physics/integrator.py::thrust_body_vector, reference mapping
env/enhanced_rocket_tvc_env.py:539-543): action[0]=pitch drives body-y
force (torque_x = +0.5*T*sin(pitch)); action[1]=yaw drives body-x force
(torque_y = -0.5*T*sin(yaw)); the trim gimbal for cg=(dx,dy) is
pitch=asin(2*dy), yaw=asin(2*dx) (lever L=0.5 m).

Usage:
  python scripts/scripted_controller.py [--cpu] [--variant pd|cascade]
      [--cg 0.0 0.01 0.025 0.05] [--kp 5] [--kd 2] [--kv 0.2]
"""

import argparse
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cg", type=float, nargs="*",
                        default=[0.0, 0.01, 0.025, 0.05])
    parser.add_argument("--variant", choices=["pd", "cascade"], default="pd")
    parser.add_argument("--kp", type=float, default=5.0)
    parser.add_argument("--kd", type=float, default=2.0)
    parser.add_argument("--kv", type=float, default=0.2,
                        help="velocity-cascade gain (cascade variant)")
    parser.add_argument("--steps", type=int, default=900)
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
    max_gimbal = 0.314159  # 18 deg
    thrust = 35.0
    step = jax.jit(lambda s, a: rocket_env.step(s, a, params))

    def controller(state, cg):
        q = state.body.quat
        w = state.body.omega
        ff_pitch = jnp.arcsin(jnp.clip(2.0 * cg[1], -0.9, 0.9))
        ff_yaw = jnp.arcsin(jnp.clip(2.0 * cg[0], -0.9, 0.9))
        # body-frame thrust direction at the trim gimbal
        f_hat = jnp.array([jnp.sin(ff_yaw), jnp.sin(ff_pitch),
                           jnp.cos(ff_pitch) * jnp.cos(ff_yaw)])
        f_world = quat.rotate(q, f_hat)
        tgt = jnp.array([0.0, 0.0, 1.0])
        if args.variant == "cascade":
            v = state.body.vel
            tgt = jnp.array([-args.kv * v[0], -args.kv * v[1], 1.0])
            tgt = tgt / jnp.linalg.norm(tgt)
        e = jnp.cross(f_world, tgt)  # drive the thrust line onto the target
        tau = args.kp * e - args.kd * w
        sp = jnp.clip(tau[0] / (0.5 * thrust), -0.9, 0.9)
        sy = jnp.clip(-tau[1] / (0.5 * thrust), -0.9, 0.9)
        act = jnp.array([(jnp.arcsin(sp) + ff_pitch) / max_gimbal,
                         (jnp.arcsin(sy) + ff_yaw) / max_gimbal])
        return jnp.clip(act, -1.0, 1.0)

    any_fail = False
    for cg_mag in args.cg:
        cgvec = jnp.array([cg_mag, 0.0, 0.0], jnp.float32)
        state, _ = rocket_env.reset(jax.random.PRNGKey(0), params)
        state = dc.replace(state, dr=dc.replace(state.dr, cg_offset=cgvec))
        ok_run = best = 0
        success_at = died_at = None
        for t in range(args.steps):
            act = controller(state, cgvec)
            state, out = step(state, act.astype(jnp.float32))
            tilt = float(out.tilt)
            w = float(out.angular_velocity_mag)
            alt = float(out.altitude)
            hv = float(jnp.linalg.norm(state.body.vel[:2]))
            vz = abs(float(state.body.vel[2]))
            good = (tilt < 0.087 and w < 0.1 and hv < 0.5
                    and 0.2 < alt < 2.0 and vz < 2.0)
            ok_run = ok_run + 1 if good else 0
            best = max(best, ok_run)
            if args.verbose and t % 50 == 0:
                print(f"  t={t} tilt={math.degrees(tilt):.2f}deg |w|={w:.3f}"
                      f" alt={alt:.3f} hvel={hv:.3f} ok_run={ok_run}")
            if bool(out.mission_success):
                success_at = t
                break
            if bool(out.terminated):
                died_at = t
                break
        status = (f"SUCCESS at t={success_at}" if success_at is not None
                  else f"died at t={died_at}" if died_at is not None
                  else "survived horizon, no window")
        if success_at is None:
            any_fail = True
        print(f"cg={cg_mag:.3f} [{args.variant}]: {status} "
              f"(best in-window run {best}/100)")
    return 1 if any_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
