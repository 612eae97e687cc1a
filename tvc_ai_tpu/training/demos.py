"""LQR ground-balance demonstration policy (CG-axis replay seeding).

The strict success window (env.types.SuccessConfig; ref
env/enhanced_rocket_tvc_env.py:31-61) under the double-gravity quirk is a
GROUND-balance regime: thrust (35 N) < effective weight (39.24 N), so the
vehicle must stand on the penalty point contact
(physics/integrator.py::contact_wrench) holding tilt < 5 deg and
|omega| < 0.1 for 100 consecutive steps. With a lateral CG offset d the
standing equilibrium is:

- thrust world-vector vertical (at zero slip the regularized friction
  vanishes, so lateral force balance needs zero lateral thrust):
  gimbal u* = -theta*;
- torque balance about the contact point:
  0.5*m*g_eff*sin(theta) + d*T*cos(u) = 0, i.e.
  tan(theta*) = -2*T*d/(m*g_eff) ~ -1.784*d — the body tips AWAY from the
  offset, inside the 5-degree window for |d| <= ~0.049 (this bound
  supersedes the r3 hover-feasibility ceiling atan(d/L): hover is
  unreachable, ground balance is the real regime).

While the base sticks, gimbal torque about the pivot is ~d*T*cos(u) —
essentially NO control authority; control enters by sliding the base
through the friction cone (|lateral thrust| > mu*fn ~ 3.4 N), broomstick
style. Hand-tuned PID around the HOVER trim fails this plant
(scripts/scripted_controller.py, all variants). This module synthesizes
the controller from the TRUE dynamics instead: jax.jacobian of the exact
50 Hz step map about the standing equilibrium -> discrete LQR.

Key property of the BLIND controller (single LQR about the d=0
equilibrium, no knowledge of d): position feedback is integral-of-velocity
feedback, so a constant torque disturbance shifts the closed-loop rest
point — the vehicle settles at a position offset with tilt ON the true
theta*(d), zero velocity, zero steady gimbal rate. That is exactly the
"second, slower integral loop around the attitude reflex" the r3
forensics prescribed, in linear-feedback form a policy with a
drift-integral observation channel can represent.

Linearization detail: the regularized Coulomb friction
ft = -mu*fn*v/(|v|+eps) with eps = 1e-3 m/s has slope mu*fn/eps ~ 1700/s
at zero slip — far above the 200 Hz substep Nyquist, so the exact
Jacobian at stick is dominated by (explicit-integration) friction chatter
and useless for synthesis. We linearize at a small slip velocity
(0.02 m/s, where the friction slope is a mild ~8/s) and validate the
gains on the true nonlinear plant (scripts/lqr_balance.py).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tvc_ai_tpu.env import rocket_env
from tvc_ai_tpu.env.types import EnvParams
from tvc_ai_tpu.physics import integrator, quaternion as quat
from tvc_ai_tpu.physics.types import RigidBodyState, RocketParams


class LQRDesign(NamedTuple):
    """Per-plane gains + equilibrium for the ground-balance LQR.

    Planar state layout (yaw plane): [x, z, theta, vx, vz, omega_y] where
    theta tips body +z toward +x; control = gimbal yaw (radians).
    Pitch plane mirrors it: [y, z, phi, vy, vz, omega_x] with phi tipping
    body +z toward -y (rotation about +x); control = gimbal pitch.
    """

    gain: jnp.ndarray        # (6,) yaw-plane LQR gain
    gain_pitch: jnp.ndarray  # (6,) pitch-plane LQR gain
    z_eq: jnp.ndarray        # equilibrium CG altitude (standing, d=0)
    trim_slope: jnp.ndarray        # d(theta*)/d(dx), yaw plane
    trim_slope_pitch: jnp.ndarray  # d(phi*)/d(dy), pitch plane


def _embed_yaw(s: jnp.ndarray) -> RigidBodyState:
    half = s[2] * 0.5
    return RigidBodyState(
        pos=jnp.array([s[0], 0.0, s[1]]),
        quat=jnp.array([0.0, jnp.sin(half), 0.0, jnp.cos(half)]),
        vel=jnp.array([s[3], 0.0, s[4]]),
        omega=jnp.array([0.0, s[5], 0.0]),
    )


def _embed_pitch(s: jnp.ndarray) -> RigidBodyState:
    half = s[2] * 0.5
    return RigidBodyState(
        pos=jnp.array([0.0, s[0], s[1]]),
        quat=jnp.array([jnp.sin(half), 0.0, 0.0, jnp.cos(half)]),
        vel=jnp.array([0.0, s[3], s[4]]),
        omega=jnp.array([s[5], 0.0, 0.0]),
    )


def _plane_step(s, u, d, rp: RocketParams, pitch: bool) -> jnp.ndarray:
    """Exact 50 Hz control-step map restricted to one tilt plane."""
    if pitch:
        body = _embed_pitch(s)
        gimbal = jnp.array([u, 0.0])
        cg = jnp.array([0.0, d, 0.0])
    else:
        body = _embed_yaw(s)
        gimbal = jnp.array([0.0, u])
        cg = jnp.array([d, 0.0, 0.0])
    control = integrator.ThrustControl(
        gimbal=gimbal, thrust_active=jnp.float32(1.0)
    )
    nxt = integrator.step(body, control, rp, cg_offset=cg)
    if pitch:
        ang = 2.0 * jnp.arctan2(nxt.quat[0], nxt.quat[3])
        return jnp.array(
            [nxt.pos[1], nxt.pos[2], ang, nxt.vel[1], nxt.vel[2], nxt.omega[0]]
        )
    ang = 2.0 * jnp.arctan2(nxt.quat[1], nxt.quat[3])
    return jnp.array(
        [nxt.pos[0], nxt.pos[2], ang, nxt.vel[0], nxt.vel[2], nxt.omega[1]]
    )


def _static_residual(q3, d, rp: RocketParams, pitch: bool) -> jnp.ndarray:
    """(lateral force, vertical force, plane torque) at rest — zero at the
    standing equilibrium (theta, u, depth)."""
    theta, u, depth = q3[0], q3[1], q3[2]
    z = 0.5 * rp.length * jnp.cos(theta) - depth
    s = jnp.array([0.0, z, theta, 0.0, 0.0, 0.0])
    body = _embed_pitch(s) if pitch else _embed_yaw(s)
    if pitch:
        gimbal = jnp.array([u, 0.0])
        cg = jnp.array([0.0, d, 0.0])
    else:
        gimbal = jnp.array([0.0, u])
        cg = jnp.array([d, 0.0, 0.0])
    control = integrator.ThrustControl(
        gimbal=gimbal, thrust_active=jnp.float32(1.0)
    )
    mass = rp.mass
    wrench = integrator.accumulate_forces(
        body, control, rp, mass, jnp.float32(1.0), cg, jnp.zeros(3)
    )
    contact = integrator.contact_wrench(body, rp, mass)
    force = wrench.force + contact.force
    force = force.at[2].add(-rp.gravity * mass)  # engine gravity half
    torque = wrench.torque + contact.torque
    if pitch:
        return jnp.array([force[1], force[2], torque[0]])
    return jnp.array([force[0], force[2], torque[1]])


def solve_equilibrium(rp: RocketParams, d: float, pitch: bool = False):
    """Standing equilibrium (theta*, u*, depth*) at cg offset d.

    Structure (derivation in the module docstring): at zero slip the
    regularized friction vanishes, so lateral force balance needs the
    thrust world-vector vertical (fixes u as a function of theta); the
    normal balance fn = m*g_eff - T fixes the penetration depth; torque
    balance fixes theta (analytically tan(theta*) = -2*T*d/(m*g_eff) in
    the yaw plane). Solved by forward-only nested bisection on the exact
    static residual — NOT Newton, because jax.jacobian through the
    contact/aero norms at exactly-zero velocity is NaN-poisoned, and
    forward-only also sidesteps per-plane sign conventions.
    """
    g_eff = 2.0 * float(rp.gravity)  # double gravity
    depth = (float(rp.mass) * g_eff - float(rp.thrust)) / float(
        rp.contact_stiffness
    )

    res_jit = jax.jit(lambda q: _static_residual(q, jnp.float32(d), rp, pitch))

    def residual(theta: float, u: float) -> np.ndarray:
        return np.asarray(res_jit(jnp.array([theta, u, depth], jnp.float32)))

    def bisect(f, lo: float, hi: float, iters: int = 40) -> float:
        flo = f(lo)
        if flo * f(hi) > 0:
            raise AssertionError(
                f"no sign change in [{lo}, {hi}] at d={d} pitch={pitch}"
            )
        for _ in range(iters):
            mid = 0.5 * (lo + hi)
            if flo * f(mid) <= 0:
                hi = mid
            else:
                lo, flo = mid, f(mid)
        return 0.5 * (lo + hi)

    def u_for(theta: float) -> float:
        # null the lateral thrust component (|u| < gimbal range)
        return bisect(lambda u: float(residual(theta, u)[0]), -0.3, 0.3)

    theta = bisect(
        lambda th: float(residual(th, u_for(th))[2]), -0.25, 0.25
    )
    u = u_for(theta)
    res = residual(theta, u)
    if np.max(np.abs(res)) > 0.05:  # N / N·m — forward sanity check
        raise AssertionError(
            f"equilibrium residual {res} too large at d={d} pitch={pitch}"
        )
    return np.array([theta, u, depth], np.float64)


def equilibrium_tilt(params: EnvParams, d: float) -> float:
    """Standing-equilibrium tilt magnitude at cg offset d (radians)."""
    return abs(float(solve_equilibrium(params.rocket, d)[0]))


def _dlqr(a: np.ndarray, b: np.ndarray, q: np.ndarray, r: np.ndarray):
    """Discrete-time LQR via Riccati fixed-point iteration.

    Diverging iterations (unstabilizable plants — e.g. friction-pinned
    cells of the DR grid, where the linearized contact has an
    uncontrollable unstable mode) return a zero gain instead of
    overflowing: callers that verify candidates empirically
    (``_verify_schedule``) then score the cell 0 and fill it from the
    nearest stabilizable cell.
    """
    p = q.copy()
    for _ in range(3000):
        btp = b.T @ p
        k = np.linalg.solve(r + btp @ b, btp @ a)
        p_next = q + a.T @ p @ (a - b @ k)
        p_next = 0.5 * (p_next + p_next.T)
        if not np.all(np.isfinite(p_next)) or np.max(np.abs(p_next)) > 1e12:
            return np.zeros((b.shape[1], a.shape[0]), a.dtype)
        if np.max(np.abs(p_next - p)) < 1e-9 * (1.0 + np.max(np.abs(p))):
            p = p_next
            break
        p = p_next
    btp = b.T @ p
    return np.linalg.solve(r + btp @ b, btp @ a)


# LQR weights, scaled ~1/limit^2 against the success-window criteria
# (tilt 0.087, |omega| 0.1, hvel 0.5) with light position cost — position
# feedback is what provides the integral action, so it must be nonzero
# but slow. Altitude (z, vz) carries ~zero weight: with fixed thrust the
# vertical channel is uncontrollable, and any real z-weight makes the LQR
# "control" altitude by tilting (gimbal saturates at the airborne spawn).
_Q_DIAG = (1.0, 1e-4, 625.0, 16.0, 1e-4, 400.0)
_R = 100.0
# linearize at this slip speed: friction slope mu*fn*eps/(v+eps)^2 is a
# mild ~8/s here vs ~1700/s at stick (see module docstring). The small
# spin keeps jax.jacobian off the |omega|=0 nondifferentiability in the
# quaternion exponential.
_LIN_SLIP = 0.02
_LIN_SPIN = 0.01


def design_lqr(params: EnvParams) -> LQRDesign:
    """Synthesize per-plane ground-balance LQR gains from the true step map.

    Pinned to the host CPU backend: the synthesis is hundreds of TINY jitted
    calls (nested-bisection residual evals, 6×6 Jacobians) — on a TPU
    backend each pays device-dispatch/tunnel latency and the whole design
    takes minutes instead of seconds, while the result is a handful of
    scalars consumed at trace time.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        return _design_lqr_impl(params)


def _design_lqr_impl(params: EnvParams) -> LQRDesign:
    rp = params.rocket
    gains = []
    slopes = []
    z_eq = None
    for pitch in (False, True):
        theta_e, u_e, depth_e = solve_equilibrium(rp, 0.0, pitch)
        z0 = 0.5 * float(rp.length) * np.cos(theta_e) - depth_e
        if not pitch:
            z_eq = z0
        u_star = jnp.float32(u_e)
        f = lambda s, u: _plane_step(s, u, jnp.float32(0.0), rp, pitch)
        # Average the Jacobians over the four (±slip, ±spin) corners: the
        # friction couplings (e.g. d omega'/d z through fn -> friction
        # torque) are ODD in the slip sign, so a one-sided linearization
        # bakes a direction-specific friction feedforward into the gains;
        # averaging keeps only the symmetric dynamics.
        a = np.zeros((6, 6))
        b = np.zeros((6, 1))
        for slip in (_LIN_SLIP, -_LIN_SLIP):
            for spin in (_LIN_SPIN, -_LIN_SPIN):
                s_star = jnp.array([0.0, z0, theta_e, slip, 0.0, spin])
                a += 0.25 * np.asarray(
                    jax.jacobian(f, argnums=0)(s_star, u_star), np.float64
                )
                b += 0.25 * np.asarray(
                    jax.jacobian(f, argnums=1)(s_star, u_star), np.float64
                ).reshape(6, 1)
        k = _dlqr(a, b, np.diag(_Q_DIAG), np.array([[_R]]))
        gains.append(jnp.asarray(k[0], jnp.float32))
        # numeric trim slope d(theta*)/dd from the Newton solve at d=0.02
        th_d, _, _ = solve_equilibrium(rp, 0.02, pitch)
        slopes.append(jnp.float32((th_d - theta_e) / 0.02))
    return LQRDesign(
        gain=gains[0],
        gain_pitch=gains[1],
        z_eq=jnp.float32(z_eq),
        trim_slope=slopes[0],
        trim_slope_pitch=slopes[1],
    )


class LQRSchedule(NamedTuple):
    """Gain-scheduled ground-balance LQR over the (mass, thrust-scale) DR
    grid — the privileged teacher for robustness distillation.

    Measured motivation (scripts/suite_feasibility.py + per-axis ablation,
    RESULTS.md r4): the single nominal-plant LQR scores 100 % under 3 N
    wind and ~77 % under either mass ±30 % or thrust ±20 % ALONE, but 3 %
    on the full robustness suite — the off-nominal (mass, thrust) draws
    shift the standing equilibrium (z_eq, trim slope ∂θ*/∂d AND the
    thrust-to-weight ratio the gains were tuned for) far enough that the
    fixed gains destabilize when the axes combine with a CG offset. The
    fix is classical gain scheduling: synthesize the SAME design at each
    grid point of the drawn-parameter box and bilinearly interpolate.
    The schedule is privileged (it reads each episode's true mass and
    thrust draw) — it exists to LABEL data for a blind history-conditioned
    student (RMA-style teacher-student distillation), and as the
    feasibility oracle for the evaluation suites.
    """

    mass_grid: jnp.ndarray          # (M,) kg
    tscale_grid: jnp.ndarray        # (T,)
    gain: jnp.ndarray               # (M, T, 6) yaw-plane gains
    gain_pitch: jnp.ndarray         # (M, T, 6)
    z_eq: jnp.ndarray               # (M, T)
    trim_slope: jnp.ndarray         # (M, T)
    trim_slope_pitch: jnp.ndarray   # (M, T)
    # empirical verification artifacts (design_lqr_schedule(verify=True)):
    # strict-window success of the SELECTED design on its own plant from
    # tilt-perturbed starts, and the cells that pass. Cells that fail get
    # their GAINS replaced by the nearest passing cell's (their z_eq /
    # trim_slope stay the true plant's), so bilinear interpolation never
    # blends a destabilizing design into a feasible query.
    cell_success: jnp.ndarray | None = None   # (M, T)
    feasible: jnp.ndarray | None = None       # (M, T) bool


def design_lqr_schedule(
    params: EnvParams,
    n_mass: int = 7,
    n_tscale: int = 7,
    ttw_margin: float = 0.95,
    verify: bool = True,
    verify_rollouts: int = 8,
    verify_horizon: int = 600,
    verify_tilt: float = 0.02,
    fill_threshold: float = 0.3,
) -> LQRSchedule:
    """Synthesize the LQR at every (mass, thrust-scale) grid point of the
    env's DR box (mass uniform ±mass_variation, thrust normal clipped to
    ±2·thrust_variation — env/randomization.py:36-42).

    Grid points where the drawn thrust exceeds ``ttw_margin`` × the
    double-gravity weight have no standing equilibrium (the vehicle climbs
    away; those episodes are unwinnable by any controller) — the design
    clamps the thrust down to the margin so the schedule stays rectangular;
    interpolated gains near the boundary inherit the nearest feasible
    design.

    Fast path (vs the nested-bisection ``solve_equilibrium`` the single
    design uses): at d = 0 the standing equilibrium is analytic by symmetry
    — theta* = 0, u* = 0, depth* = (m·g_eff − T)/k_contact — and the trim
    slope follows from the implicit function theorem on the static torque
    residual with the lateral-balance constraint u = −theta substituted:
    dθ*/dd = −F_d/F_θ (central finite differences; jax.jacobian through
    the contact/friction norms at rest is NaN-poisoned, plain evaluation
    is not). All grid cells run in ONE vmapped XLA program per plane; only
    the 6×6 Riccati iterations stay on host. ~50× faster than bisection
    per cell, validated against ``design_lqr`` at the nominal cell
    (tests/test_training_subsystems.py).

    Empirical verification (``verify=True``, the default — measured r4):
    a designed cell is NOT presumed stable. Ground balance acts by sliding
    the base through the friction cone, so control authority exists only
    while lateral thrust can exceed stiction: μ·(m·g_eff − T) <
    T·sin(max_gimbal), i.e. a thrust-scale band ≈ (0.40·m, 0.53·m) for the
    default plant — BELOW it the base is friction-pinned (measured: every
    design scores 0 % at tscale 0.8), ABOVE it the vehicle climbs away.
    Each cell's design (plus gentler/stiffer R variants and the
    nominal-cell gains) is therefore rolled on its own true plant from
    tilt-perturbed starts; the best variant wins the cell, and cells where
    every variant fails (physically uncontrollable, or marginal like
    m=2.6/tscale=1.0 where the raw design amplifies a 1e-8 asymmetry to
    gimbal saturation within 100 steps) have their gains replaced by the
    nearest passing cell's so interpolation never crosses a destabilizing
    design. ``cell_success``/``feasible`` record the measurement — the
    schedule is also the empirical feasibility oracle for the evaluation
    suites.
    """
    rp = params.rocket
    rnd = params.randomization
    g_eff = 2.0 * float(rp.gravity)
    mv = float(rnd.mass_variation)
    tv = float(rnd.thrust_variation)
    m0 = float(rp.mass)
    t0 = float(rp.thrust)
    mass_grid = np.linspace(m0 * (1.0 - mv), m0 * (1.0 + mv), n_mass)
    tscale_grid = np.linspace(1.0 - 2.0 * tv, 1.0 + 2.0 * tv, n_tscale)
    mm, tt = np.meshgrid(mass_grid, tscale_grid, indexing="ij")
    mass_flat = jnp.asarray(mm.ravel(), jnp.float32)
    thrust_flat = jnp.asarray(
        np.minimum(tt.ravel() * t0, ttw_margin * mm.ravel() * g_eff),
        jnp.float32,
    )
    stiffness = float(rp.contact_stiffness)
    length = float(rp.length)

    cpu = jax.devices("cpu")[0]
    shape = (n_mass, n_tscale)
    out = {}
    ab_planes = {}
    with jax.default_device(cpu):
        for pitch in (False, True):

            def cell(m, t):
                rp_c = rp.replace(mass=m, thrust=t)
                depth = (m * g_eff - t) / stiffness
                z0 = 0.5 * length - depth

                def f(s, u):
                    return _plane_step(s, u, jnp.float32(0.0), rp_c, pitch)

                a = jnp.zeros((6, 6))
                b = jnp.zeros((6,))
                for slip in (_LIN_SLIP, -_LIN_SLIP):
                    for spin in (_LIN_SPIN, -_LIN_SPIN):
                        s_star = jnp.array(
                            [0.0, 0.0, 0.0, slip, 0.0, spin]
                        ) + z0 * jnp.array([0.0, 1.0, 0.0, 0.0, 0.0, 0.0])
                        a = a + 0.25 * jax.jacobian(f, argnums=0)(
                            s_star, jnp.float32(0.0)
                        )
                        b = b + 0.25 * jax.jacobian(f, argnums=1)(
                            s_star, jnp.float32(0.0)
                        )

                # trim slope dtheta*/dd = -F_d/F_theta on the static torque
                # residual with u = -theta (lateral balance) substituted
                def torque_res(theta, d):
                    q3 = jnp.stack([theta, -theta, depth])
                    return _static_residual(q3, d, rp_c, pitch)[2]

                eps = jnp.float32(1e-3)
                zero = jnp.float32(0.0)
                f_th = (torque_res(eps, zero) - torque_res(-eps, zero)) / (
                    2.0 * eps
                )
                f_d = (torque_res(zero, eps) - torque_res(zero, -eps)) / (
                    2.0 * eps
                )
                return a, b, z0, -f_d / f_th

            a_all, b_all, z0_all, slope_all = jax.jit(jax.vmap(cell))(
                mass_flat, thrust_flat
            )
            a_np = np.asarray(a_all, np.float64)
            b_np = np.asarray(b_all, np.float64).reshape(-1, 6, 1)
            ab_planes[pitch] = (a_np, b_np)
            gains = np.stack(
                [
                    _dlqr(a_np[i], b_np[i], np.diag(_Q_DIAG), np.array([[_R]]))[0]
                    for i in range(a_np.shape[0])
                ]
            )
            suffix = "_pitch" if pitch else ""
            out["gain" + suffix] = gains.reshape(shape + (6,)).astype(
                np.float32
            )
            out["trim_slope" + suffix] = (
                np.asarray(slope_all).reshape(shape).astype(np.float32)
            )
            if not pitch:
                out["z_eq"] = np.asarray(z0_all).reshape(shape).astype(
                    np.float32
                )
    sched = LQRSchedule(
        mass_grid=jnp.asarray(mass_grid, jnp.float32),
        tscale_grid=jnp.asarray(tscale_grid, jnp.float32),
        **{k: jnp.asarray(v) for k, v in out.items()},
    )
    if not verify:
        return sched
    return _verify_schedule(
        params,
        sched,
        ab_planes,
        tscale_true=np.asarray(tt.ravel(), np.float32),
        rollouts=verify_rollouts,
        horizon=verify_horizon,
        tilt0=verify_tilt,
        fill_threshold=fill_threshold,
    )


# extra control-cost variants tried per cell during schedule verification:
# R/4 slides the base harder through stiction (helps friction-marginal
# cells), R*4 calms designs that chatter against the contact
_VERIFY_R_SCALES = (1.0, 0.25, 4.0)


def _verify_schedule(
    params: EnvParams,
    sched: LQRSchedule,
    ab_planes: dict,
    tscale_true: np.ndarray,
    rollouts: int,
    horizon: int,
    tilt0: float,
    fill_threshold: float,
    key: jnp.ndarray | None = None,
) -> LQRSchedule:
    """Roll every cell's candidate gain sets on the cell's TRUE plant
    (unclamped thrust, cg = wind = 0, tilt-perturbed starts), keep the best
    variant per cell, and overwrite failing cells' gains with the nearest
    passing cell's. Runs as one batched scan on the host CPU backend."""
    n_mass = sched.mass_grid.shape[0]
    n_tscale = sched.tscale_grid.shape[0]
    cells = n_mass * n_tscale
    mass_flat = np.repeat(np.asarray(sched.mass_grid, np.float32), n_tscale)

    # candidate gains per (cell, variant, plane)
    variants: list[np.ndarray] = []          # each (cells, 6) yaw
    variants_pitch: list[np.ndarray] = []
    base_gain = np.asarray(sched.gain, np.float32).reshape(cells, 6)
    base_gain_p = np.asarray(sched.gain_pitch, np.float32).reshape(cells, 6)
    for r_scale in _VERIFY_R_SCALES:
        if r_scale == 1.0:
            variants.append(base_gain)
            variants_pitch.append(base_gain_p)
            continue
        r_mat = np.array([[_R * r_scale]])
        g_yaw = np.stack([
            _dlqr(ab_planes[False][0][i], ab_planes[False][1][i],
                  np.diag(_Q_DIAG), r_mat)[0]
            for i in range(cells)
        ]).astype(np.float32)
        g_pit = np.stack([
            _dlqr(ab_planes[True][0][i], ab_planes[True][1][i],
                  np.diag(_Q_DIAG), r_mat)[0]
            for i in range(cells)
        ]).astype(np.float32)
        variants.append(np.nan_to_num(g_yaw))
        variants_pitch.append(np.nan_to_num(g_pit))
    # the nominal cell's base design as a cross-plant fallback (the single
    # fixed LQR is stable on a band around nominal — measured _dbg_stab)
    i_nom = (n_mass // 2) * n_tscale + (n_tscale // 2)
    variants.append(np.broadcast_to(base_gain[i_nom], (cells, 6)).copy())
    variants_pitch.append(
        np.broadcast_to(base_gain_p[i_nom], (cells, 6)).copy()
    )
    n_var = len(variants)

    # flatten (cell, variant, rollout) into one batched verification run
    z_eq_flat = np.asarray(sched.z_eq, np.float32).reshape(cells)
    rows = cells * n_var * rollouts
    gain_rows = np.repeat(np.stack(variants, 1).reshape(-1, 6), rollouts, 0)
    gain_p_rows = np.repeat(
        np.stack(variants_pitch, 1).reshape(-1, 6), rollouts, 0
    )
    mass_rows = np.repeat(mass_flat, n_var * rollouts)
    tsc_rows = np.repeat(tscale_true, n_var * rollouts)
    zeq_rows = np.repeat(z_eq_flat, n_var * rollouts)
    design_rows = LQRDesign(
        gain=jnp.asarray(gain_rows),
        gain_pitch=jnp.asarray(gain_p_rows),
        z_eq=jnp.asarray(zeq_rows),
        trim_slope=jnp.zeros(rows, jnp.float32),
        trim_slope_pitch=jnp.zeros(rows, jnp.float32),
    )

    rnd_off = params.randomization.replace(
        enabled=False,
        sensor_noise_enabled=False,
        sensor_noise_uniform=False,
        progress_rate_randomized=False,
    )
    v_params = params.replace(randomization=rnd_off)
    if key is None:
        key = jax.random.PRNGKey(0)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        succ = _verify_rollouts(
            v_params,
            jnp.asarray(mass_rows),
            jnp.asarray(tsc_rows),
            design_rows,
            key,
            horizon,
            tilt0,
        )
    success = np.asarray(succ, np.float32).reshape(cells, n_var, rollouts)
    success = success.mean(-1)                       # (cells, n_var)
    best_var = success.argmax(1)
    best_succ = success[np.arange(cells), best_var]
    sel_gain = np.stack(variants, 1)[np.arange(cells), best_var]
    sel_gain_p = np.stack(variants_pitch, 1)[np.arange(cells), best_var]

    # fill failing cells' gains from the nearest passing cell
    ok = best_succ >= fill_threshold
    if ok.any() and not ok.all():
        ii, jj = np.divmod(np.arange(cells), n_tscale)
        ok_idx = np.flatnonzero(ok)
        for c in np.flatnonzero(~ok):
            dist = (ii[ok_idx] - ii[c]) ** 2 + (jj[ok_idx] - jj[c]) ** 2
            src = ok_idx[dist.argmin()]
            sel_gain[c] = sel_gain[src]
            sel_gain_p[c] = sel_gain_p[src]

    shape = (n_mass, n_tscale)
    return sched._replace(
        gain=jnp.asarray(sel_gain.reshape(shape + (6,))),
        gain_pitch=jnp.asarray(sel_gain_p.reshape(shape + (6,))),
        cell_success=jnp.asarray(best_succ.reshape(shape)),
        feasible=jnp.asarray(ok.reshape(shape)),
    )


def _verify_rollouts(
    params: EnvParams,
    mass_r: jnp.ndarray,
    tsc_r: jnp.ndarray,
    design_r: LQRDesign,
    key: jnp.ndarray,
    horizon: int,
    tilt0: float,
) -> jnp.ndarray:
    """First-episode strict success of per-row controllers on per-row
    (mass, thrust-scale) plants, from starts perturbed by ``tilt0`` about a
    random horizontal axis (the symmetric suite reset balances ANY gain set
    on the knife edge — zero state → zero action — which masked the raw
    schedule's instability for a whole session)."""
    n = mass_r.shape[0]
    rp = params.rocket
    keys = jax.random.split(key, n)
    states, _ = jax.vmap(rocket_env.reset, in_axes=(0, None))(keys, params)
    zeros3 = jnp.zeros((n, 3), jnp.float32)
    states = states.replace(
        dr=states.dr.replace(
            mass=mass_r, thrust_scale=tsc_r, cg_offset=zeros3, wind=zeros3
        )
    )
    ang = jax.vmap(lambda k: jax.random.uniform(k, (), minval=0.0, maxval=2.0 * jnp.pi))(keys)
    axis = jnp.stack([jnp.cos(ang), jnp.sin(ang), jnp.zeros_like(ang)], -1)
    half = jnp.float32(tilt0 / 2.0)
    dq = jnp.concatenate(
        [axis * jnp.sin(half), jnp.full((n, 1), jnp.cos(half))], -1
    )
    states = states.replace(
        body=states.body.replace(
            quat=jax.vmap(quat.multiply)(dq, states.body.quat)
        )
    )
    d0 = jnp.zeros((n, 3), jnp.float32)

    @jax.jit
    def roll(states):
        def step_fn(carry, _):
            st, done, succ = carry
            act = lqr_action(st.body, design_r, d0, rp)
            nxt, out, _ = rocket_env.batched_step_autoreset(
                st, act, params, use_pallas=False
            )
            ep_done = out.terminated | out.truncated
            succ = jnp.where(~done & ep_done, out.mission_success, succ)
            done = done | ep_done
            return (nxt, done, succ), None

        init = (states, jnp.zeros(n, bool), jnp.zeros(n, bool))
        (st, done, succ), _ = jax.lax.scan(
            step_fn, init, None, length=horizon
        )
        # an episode still running at the horizon counts as its current
        # window state (matches scripts/suite_feasibility.py accounting)
        return jnp.where(done, succ, st.mission_success)

    return roll(states)


def interp_design(
    sched: LQRSchedule, mass: jnp.ndarray, thrust_scale: jnp.ndarray
) -> LQRDesign:
    """Bilinear interpolation of the schedule at per-env (mass, thrust
    scale) draws → a batched LQRDesign pytree ``lqr_action`` consumes
    directly (its einsum/broadcast forms accept leading batch axes)."""

    def axis_coords(grid, x):
        x = jnp.clip(x, grid[0], grid[-1])
        # degenerate axis (zero-width DR box, e.g. mass_variation=0):
        # every grid point is identical — pin to cell 0 with weight 0
        # instead of dividing by the zero extent
        extent = grid[-1] - grid[0]
        f = jnp.where(
            extent > 0,
            (x - grid[0]) / jnp.where(extent > 0, extent, 1.0)
            * (grid.shape[0] - 1),
            0.0,
        )
        i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, grid.shape[0] - 2)
        return i0, f - i0

    mi, mw = axis_coords(sched.mass_grid, mass)
    ti, tw = axis_coords(sched.tscale_grid, thrust_scale)

    def bilerp(table):
        c00 = table[mi, ti]
        c01 = table[mi, ti + 1]
        c10 = table[mi + 1, ti]
        c11 = table[mi + 1, ti + 1]
        wm = mw[..., None] if table.ndim == 3 else mw
        wt = tw[..., None] if table.ndim == 3 else tw
        c0 = c00 * (1 - wt) + c01 * wt
        c1 = c10 * (1 - wt) + c11 * wt
        return c0 * (1 - wm) + c1 * wm

    return LQRDesign(
        gain=bilerp(sched.gain),
        gain_pitch=bilerp(sched.gain_pitch),
        z_eq=bilerp(sched.z_eq),
        trim_slope=bilerp(sched.trim_slope),
        trim_slope_pitch=bilerp(sched.trim_slope_pitch),
    )


def lqr_action_scheduled(
    body: RigidBodyState,
    sched: LQRSchedule,
    mass: jnp.ndarray,
    thrust_scale: jnp.ndarray,
    d_known: jnp.ndarray,
    rp: RocketParams,
) -> jnp.ndarray:
    """Gain-scheduled teacher action: interpolate the per-episode design
    from the true (mass, thrust) draw, stay blind to the cg offset
    (``d_known`` zeros — position-integral action finds that trim)."""
    return lqr_action(body, interp_design(sched, mass, thrust_scale), d_known, rp)


def generate_demonstrations(
    key: jnp.ndarray,
    env_params: EnvParams,
    design: LQRDesign,
    num_envs: int,
    num_steps: int,
    privileged: bool = False,
    history_len: int = 1,
) -> tuple[dict[str, jnp.ndarray], dict[str, float]]:
    """Roll the LQR demonstration policy in a batch of envs and return
    replay-ready transitions.

    The envs run with ``env_params`` exactly as training will (domain
    randomization draws, autoreset, observation channels incl. trim/drift),
    so the stored (obs, action, reward, next_obs, done) tuples live in the
    SAME observation space the learner trains on — the LQR itself acts on
    the privileged body state, but nothing privileged leaks into the data.
    With ``history_len > 1`` the stored views are the stacked
    [oldest..newest] windows exactly as training.loop builds them.
    ``privileged=True`` additionally tells the controller each episode's
    true cg offset — MEASURED WORSE than blind (the trim feedforward
    fights the touchdown transient; the blind LQR's position-integral
    action finds the equilibrium naturally), kept for probes only.

    Returns ``(transitions, stats)`` where transitions have shape
    (num_steps, num_envs, ...) — the leading step axis lets the replay
    write reuse the ring buffer's per-batch ``add_batch`` path — and
    stats reports the demo success rate. Measured teacher quality (blind
    LQR, nominal starts): 100 % at |cg_xy| < 0.02, ~42 % over uniform
    2-axis draws at cg_offset_max 0.04 (direction-dependent marginal
    stability in mixed-ratio quadrants; pure-axis and 45-degree diagonals
    pass up to the ~0.049 ground-balance ceiling).
    """
    rp = env_params.rocket
    env_keys = jax.random.split(key, num_envs)
    states, obs = jax.vmap(rocket_env.reset, in_axes=(0, None))(
        env_keys, env_params
    )
    window = None
    if history_len > 1:
        window = jnp.tile(obs[:, None, :], (1, history_len, 1))

    def step_fn(carry, _):
        states, obs, window = carry
        d_known = (
            states.dr.cg_offset
            if privileged
            else jnp.zeros((num_envs, 3), jnp.float32)
        )
        actions = lqr_action(states.body, design, d_known, rp)
        nxt_states, out, next_obs = rocket_env.batched_step_autoreset(
            states, actions, env_params, use_pallas=False
        )
        done = out.terminated | out.truncated
        if history_len > 1:
            stored_obs = window.reshape(num_envs, -1)
            shifted = jnp.concatenate(
                [window[:, 1:], out.obs[:, None, :]], axis=1
            )
            stored_next = shifted.reshape(num_envs, -1)
            fresh = jnp.tile(next_obs[:, None, :], (1, history_len, 1))
            nxt_window = jnp.where(done[:, None, None], fresh, shifted)
        else:
            stored_obs, stored_next, nxt_window = obs, out.obs, None
        trans = {
            "obs": stored_obs,
            "action": actions,
            "reward": out.reward,
            # the TRUE next view (pre-autoreset); terminated-only done so
            # truncation bootstraps — matches the fused loop's replay write
            "next_obs": stored_next,
            "done": out.terminated.astype(jnp.float32),
        }
        ep_done = done.astype(jnp.int32)
        ep_succ = (done & out.mission_success).astype(jnp.int32)
        return (nxt_states, next_obs, nxt_window), (trans, ep_done, ep_succ)

    (_, _, _), (transitions, ep_done, ep_succ) = jax.lax.scan(
        step_fn, (states, obs, window), None, length=num_steps
    )
    episodes = int(jnp.sum(ep_done))
    successes = int(jnp.sum(ep_succ))
    stats = {
        "demo_transitions": float(num_steps * num_envs),
        "demo_episodes": float(episodes),
        "demo_success_rate": successes / max(episodes, 1),
    }
    return transitions, stats


def seed_replay_buffer(buffer, transitions: dict[str, jnp.ndarray]):
    """Write (T, B, ...) demonstration transitions into a ring replay buffer
    one step-batch at a time (keeps ``add_batch``'s no-straddle invariant:
    capacity must be a multiple of B, which the trainer guarantees by
    generating demos with B = num_envs)."""
    from tvc_ai_tpu.agents import replay as replay_mod

    num_steps = next(iter(transitions.values())).shape[0]

    def write(buf, batch):
        return replay_mod.add_batch(buf, batch), None

    buffer, _ = jax.lax.scan(
        write, buffer, transitions, length=num_steps
    )
    return buffer


def lqr_action(
    body: RigidBodyState,
    design: LQRDesign,
    d_known: jnp.ndarray,
    rp: RocketParams,
) -> jnp.ndarray:
    """Policy action [-1, 1]^2 from the full body state (jit/vmap-safe).

    ``d_known``: (.., 3) cg offset the controller is told (zeros = blind
    mode; the LQR's position feedback supplies the integral action that
    absorbs the unknown trim).
    """
    zhat = quat.rotate(body.quat, jnp.array([0.0, 0.0, 1.0]))
    theta_x = jnp.arctan2(zhat[..., 0], zhat[..., 2])
    phi = jnp.arctan2(-zhat[..., 1], zhat[..., 2])

    th_star = design.trim_slope * d_known[..., 0]
    ph_star = design.trim_slope_pitch * d_known[..., 1]

    sx = jnp.stack(
        [
            body.pos[..., 0],
            body.pos[..., 2],
            theta_x,
            body.vel[..., 0],
            body.vel[..., 2],
            body.omega[..., 1],
        ],
        axis=-1,
    )
    sy = jnp.stack(
        [
            body.pos[..., 1],
            body.pos[..., 2],
            phi,
            body.vel[..., 1],
            body.vel[..., 2],
            body.omega[..., 0],
        ],
        axis=-1,
    )
    sx_star = jnp.stack(
        [
            jnp.zeros_like(th_star),
            jnp.broadcast_to(design.z_eq, th_star.shape),
            th_star,
            jnp.zeros_like(th_star),
            jnp.zeros_like(th_star),
            jnp.zeros_like(th_star),
        ],
        axis=-1,
    )
    sy_star = jnp.stack(
        [
            jnp.zeros_like(ph_star),
            jnp.broadcast_to(design.z_eq, ph_star.shape),
            ph_star,
            jnp.zeros_like(ph_star),
            jnp.zeros_like(ph_star),
            jnp.zeros_like(ph_star),
        ],
        axis=-1,
    )
    u_yaw = -th_star - jnp.sum(design.gain * (sx - sx_star), axis=-1)
    u_pitch = -ph_star - jnp.sum(design.gain_pitch * (sy - sy_star), axis=-1)
    act = jnp.stack([u_pitch, u_yaw], axis=-1) / rp.max_gimbal
    return jnp.clip(act, -1.0, 1.0)
