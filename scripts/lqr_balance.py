#!/usr/bin/env python
"""LQR ground-balance synthesis: the definitive CG-axis feasibility probe.

The r3 forensics established that hand-structured PID controllers (trim
feedforward, velocity cascade, attitude+drift integral — see
scripts/scripted_controller.py) all fail the strict 100-step window at any
cg offset > 0. This script replaces hand structure with synthesis from the
TRUE dynamics: because the simulator is a differentiable JAX function, we

1. solve the standing equilibrium exactly (with double gravity, thrust
   35 N < weight 39.24 N, so every success is GROUND balance on the
   penalty point contact; at zero slip velocity the regularized friction
   vanishes, so equilibrium requires the thrust world-vector vertical:
   gimbal u* = -theta*, and torque balance about the contact gives
   tan(theta*) = -2*T*d/(m*g_eff) — the body tips AWAY from the cg offset,
   inside the 5-degree window for |d| <= ~0.049);
2. linearize the exact 50 Hz step map about the equilibrium with
   jax.jacobian (planar reduction: the cg-offset dynamics are exactly
   planar), and
3. synthesize a discrete LQR, then verify it on the full nonlinear env
   (tvc_ai_tpu.env.rocket_env.step) across the cg range.

Two controller modes:
- "privileged": gains + equilibrium shift computed from the true d
  (upper feasibility bound);
- "blind": single LQR about the d=0 equilibrium. Position feedback IS
  integral-of-velocity feedback, so a constant torque disturbance shifts
  the closed-loop rest point (position offset, tilt settles onto the true
  theta*(d)) without any steady velocity — exactly the integral action the
  r3 forensics prescribed, and the form a policy with a drift-integral
  observation channel can represent.

The blind mode doubles as the demonstration policy for replay seeding
(tvc_ai_tpu/training/demos.py).

Usage:
  python scripts/lqr_balance.py [--cpu] [--mode blind|privileged]
      [--cg 0.0 0.01 0.025 0.04] [--steps 900] [--verbose]
"""

import argparse
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cg", type=float, nargs="*",
                        default=[0.0, 0.01, 0.025, 0.04, 0.045])
    parser.add_argument("--mode", choices=["blind", "privileged"],
                        default="blind")
    parser.add_argument("--steps", type=int, default=900)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses as _dc  # noqa: F401 (flax struct replace below)
    import jax.numpy as jnp
    import numpy as np
    from flax.struct import dataclass as _sd  # noqa: F401

    import dataclasses
    dc = dataclasses

    from tvc_ai_tpu.env import rocket_env
    from tvc_ai_tpu.env.types import EnvParams
    from tvc_ai_tpu.physics import integrator, quaternion as quat
    from tvc_ai_tpu.physics.types import RigidBodyState
    from tvc_ai_tpu.training import demos

    params = EnvParams()
    rp = params.rocket
    crit = params.success

    # ---- equilibrium + linearization + LQR live in training/demos.py so the
    # demo policy and this probe share one implementation ----
    design = demos.design_lqr(params)
    K = design.gain
    if args.verbose:
        theta0 = demos.equilibrium_tilt(params, 0.025)
        print(f"equilibrium tilt at d=0.025: {math.degrees(theta0):.3f} deg "
              f"(analytic -2Td/mg: "
              f"{math.degrees(math.atan(-2 * 35 * 0.025 / (2 * 2 * 9.81))):.3f})")
        print("LQR gain:", np.asarray(K))

    step = jax.jit(lambda s, a: rocket_env.step(s, a, params))

    any_fail = False
    for cg_mag in args.cg:
        cgvec = jnp.array([cg_mag, 0.0, 0.0], jnp.float32)
        state, _ = rocket_env.reset(jax.random.PRNGKey(args.seed), params)
        state = dc.replace(state, dr=dc.replace(state.dr, cg_offset=cgvec))
        d_known = cgvec if args.mode == "privileged" else jnp.zeros(3)
        ok_run = best = 0
        success_at = died_at = None
        for t in range(args.steps):
            act = demos.lqr_action(state.body, design, d_known, rp)
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
            if args.verbose and t % 50 == 0:
                print(f"  t={t} tilt={math.degrees(tilt):.2f}deg |w|={w:.3f}"
                      f" alt={alt:.3f} hvel={hv:.3f} vz={vz:.3f} ok={ok_run}")
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
        print(f"cg={cg_mag:.3f} [lqr/{args.mode}]: {status} "
              f"(best in-window run {best}/100)")
    return 1 if any_fail else 0


if __name__ == "__main__":
    sys.exit(main())
