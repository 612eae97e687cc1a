"""Batched 6-DOF semi-implicit-Euler rigid-body integrator.

This module is the TPU-native replacement for PyBullet's C++ engine in the
reference (ref: env/enhanced_rocket_tvc_env.py:324-352, :477). Design:

- **Pure functions over pytrees**: ``step(state, control, params) -> state``
  with no Python-side state, so the whole thing vmaps over thousands of
  rockets and fuses into one XLA program with the agent update.
- **Force model mirrors the reference's step structure**: the Python layer
  there computes gravity/thrust/drag ONCE from the pre-step state and Bullet
  holds them constant across its 4 internal substeps; we do the same
  (``accumulate_forces`` once, then ``substep`` ×4 with constant external
  wrench + per-substep contact and damping).
- **Branch-free**: fuel gating, drag thresholding and contact are
  ``jnp.where`` selects — no data-dependent control flow, so XLA tiles the
  batch onto the VPU cleanly.

The per-substep state advance also exists as a Pallas kernel
(``tvc_ai_tpu.ops.pallas_step``) for the 4096-env hot path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from tvc_ai_tpu.physics import quaternion as quat
from tvc_ai_tpu.physics.types import ForceTorque, RigidBodyState, RocketParams


class ThrustControl(NamedTuple):
    """Per-step control input.

    gimbal: (..., 2) radians [pitch, yaw] — already scaled from the [-1,1]
    policy action by ``max_gimbal`` (ref scaling at
    env/enhanced_rocket_tvc_env.py:470-471).
    thrust_active: (...,) bool/float — fuel-available gate (ref :530).
    """

    gimbal: jnp.ndarray
    thrust_active: jnp.ndarray


def thrust_body_vector(gimbal: jnp.ndarray, thrust: jnp.ndarray) -> jnp.ndarray:
    """Body-frame thrust vector for gimbal [pitch, yaw].

    Mirrors the reference's mapping (env/enhanced_rocket_tvc_env.py:539-543):
    [T·sin(yaw), T·sin(pitch), T·cos(pitch)·cos(yaw)].
    """
    pitch = gimbal[..., 0]
    yaw = gimbal[..., 1]
    return jnp.stack(
        [
            thrust * jnp.sin(yaw),
            thrust * jnp.sin(pitch),
            thrust * jnp.cos(pitch) * jnp.cos(yaw),
        ],
        axis=-1,
    )


def gravity_wrench(params: RocketParams, mass: jnp.ndarray) -> ForceTorque:
    """Manually-applied gravity (the reference's double-gravity quirk half).

    The engine half is applied inside ``substep``; this half reproduces
    env/enhanced_rocket_tvc_env.py:524-527 and is zero when
    ``params.double_gravity`` is False.
    """
    g = jnp.where(params.double_gravity, params.gravity, 0.0)
    fz = -g * mass
    force = jnp.stack([jnp.zeros_like(fz), jnp.zeros_like(fz), fz], axis=-1)
    return ForceTorque(force=force, torque=jnp.zeros_like(force))


def thrust_wrench(
    state: RigidBodyState,
    control: ThrustControl,
    params: RocketParams,
    thrust_scale: jnp.ndarray,
    cg_offset: jnp.ndarray,
) -> ForceTorque:
    """Gimbaled thrust applied at the base (−0.5 m body z from the CG).

    torque = r × F with r the world-frame lever arm; ``cg_offset`` (body
    frame, from domain randomization) shifts the application point, modeling
    CG uncertainty (ref spec: config/config.yaml cg_offset_range ≤ 0.1).
    """
    thrust = params.thrust * thrust_scale
    if params.ground_effect:
        # plume reflection boosts effective thrust near the pad (opt-in;
        # ref config.yaml:357 flag, unimplemented in the reference)
        alt = jnp.maximum(state.pos[..., 2], 0.0)
        thrust = thrust * (
            1.0
            + params.ground_effect_strength
            * jnp.exp(-alt / params.ground_effect_height)
        )
    f_body = thrust_body_vector(control.gimbal, thrust)
    f_world = quat.rotate(state.quat, f_body)
    lever_body = params.thrust_offset - cg_offset
    lever_world = quat.rotate(state.quat, lever_body)
    active = control.thrust_active[..., None].astype(f_world.dtype)
    force = f_world * active
    torque = jnp.cross(lever_world, force)
    return ForceTorque(force=force, torque=torque)


def aero_wrench(state: RigidBodyState, params: RocketParams) -> ForceTorque:
    """Exponential-atmosphere quadratic drag + aerodynamic angular damping.

    Mirrors env/enhanced_rocket_tvc_env.py:561-585: drag only above
    0.1 m/s, applied at the CG (no aero torque from drag), plus a linear
    angular damping torque −0.02·ρ·ω.
    """
    rho = params.rho0 * jnp.exp(-state.pos[..., 2] / params.atmosphere_scale_height)
    speed = jnp.linalg.norm(state.vel, axis=-1)
    area = jnp.pi * params.radius**2
    drag_mag = 0.5 * rho * speed**2 * params.drag_coeff * area
    # branch-free: direction = -v/|v| guarded, zeroed below the threshold
    inv_speed = jnp.where(speed > 1e-9, 1.0 / jnp.maximum(speed, 1e-9), 0.0)
    drag = -state.vel * (drag_mag * inv_speed)[..., None]
    drag = jnp.where((speed > params.drag_min_speed)[..., None], drag, 0.0)
    damping_torque = -(params.aero_angular_damping * rho)[..., None] * state.omega
    force = drag
    if params.magnus_effect:
        # Kutta–Joukowski lift for the rotating cylinder (opt-in; ref
        # config.yaml:356 flag, unimplemented in the reference):
        # F = C_m · ρ · π r² l · (ω × v), applied at the CG
        area_vol = jnp.pi * params.radius**2 * params.length
        magnus = (
            (params.magnus_coeff * rho * area_vol)[..., None]
            * jnp.cross(state.omega, state.vel)
        )
        force = force + magnus
    return ForceTorque(force=force, torque=damping_torque)


def contact_wrench(state: RigidBodyState, params: RocketParams,
                   mass: jnp.ndarray) -> ForceTorque:
    """Penalty-based ground contact at the cylinder's two axis endpoints.

    Replaces the PyBullet ground plane (ref :347-352). Spring-damper normal
    force + regularized Coulomb friction at each endpoint that penetrates
    z=0; branch-free via clamping to zero when not in contact.
    """
    half = params.length * 0.5

    def endpoint(sign: float) -> ForceTorque:
        r_body = jnp.stack(
            [jnp.zeros_like(half), jnp.zeros_like(half), sign * half], axis=-1
        )
        r_world = quat.rotate(state.quat, r_body)
        p_world = state.pos + r_world
        v_point = state.vel + jnp.cross(state.omega, r_world)
        depth = jnp.maximum(-p_world[..., 2], 0.0)
        in_contact = depth > 0.0
        fn = params.contact_stiffness * depth - params.contact_damping * v_point[..., 2]
        fn = jnp.where(in_contact, jnp.maximum(fn, 0.0), 0.0)
        v_t = v_point[..., :2]
        v_t_mag = jnp.linalg.norm(v_t, axis=-1, keepdims=True)
        # regularized Coulomb friction (smooth near zero slip)
        ft = -params.contact_friction[..., None] * fn[..., None] * v_t / (
            v_t_mag + 1e-3
        )
        force = jnp.concatenate([ft, fn[..., None]], axis=-1)
        torque = jnp.cross(r_world, force)
        return ForceTorque(force=force, torque=torque)

    return endpoint(-1.0) + endpoint(1.0)


def accumulate_forces(
    state: RigidBodyState,
    control: ThrustControl,
    params: RocketParams,
    mass: jnp.ndarray,
    thrust_scale: jnp.ndarray,
    cg_offset: jnp.ndarray,
    wind: jnp.ndarray,
) -> ForceTorque:
    """External wrench computed once per control step from the pre-step state.

    (Matches the reference, which computes these in Python before
    p.stepSimulation and lets Bullet hold them constant over substeps.)
    """
    total = gravity_wrench(params, mass)
    total = total + thrust_wrench(state, control, params, thrust_scale, cg_offset)
    total = total + aero_wrench(state, params)
    total = total + ForceTorque(force=wind, torque=jnp.zeros_like(wind))
    return total


def substep(
    state: RigidBodyState,
    wrench: ForceTorque,
    params: RocketParams,
    mass: jnp.ndarray,
    dt: jnp.ndarray | float,
) -> RigidBodyState:
    """One semi-implicit Euler substep with engine gravity, body damping,
    contact, and quaternion-exponential orientation advance."""
    inertia = params.inertia_body(mass)

    contact = contact_wrench(state, params, mass)
    force = wrench.force + contact.force
    torque = wrench.torque + contact.torque
    # engine gravity (always on — p.setGravity at ref :338)
    force = force.at[..., 2].add(-params.gravity * mass)

    inv_mass = (1.0 / mass)[..., None]
    vel = state.vel + force * inv_mass * dt

    # ω' = ω + I_w⁻¹ τ dt with I_w⁻¹ = R diag(1/I_b) Rᵀ (inertia is diagonal
    # in the body frame, so no linear solve — rotate, scale, rotate back)
    torque_body = quat.rotate_inverse(state.quat, torque)
    if params.gyroscopic:
        # full Euler equations: I ω̇_b = τ_b − ω_b × (I ω_b)
        # (opt-in; Bullet/the reference run with this term disabled)
        omega_body = quat.rotate_inverse(state.quat, state.omega)
        torque_body = torque_body - jnp.cross(omega_body, inertia * omega_body)
    ang_acc = quat.rotate(state.quat, torque_body / inertia)
    omega = state.omega + ang_acc * dt

    # Bullet-style exponential body damping per substep
    vel = vel * (1.0 - params.linear_damping) ** dt
    omega = omega * (1.0 - params.angular_damping) ** dt

    pos = state.pos + vel * dt
    q = quat.integrate(state.quat, omega, dt)
    return RigidBodyState(pos=pos, quat=q, vel=vel, omega=omega)


def step(
    state: RigidBodyState,
    control: ThrustControl,
    params: RocketParams,
    mass: jnp.ndarray | None = None,
    thrust_scale: jnp.ndarray | None = None,
    cg_offset: jnp.ndarray | None = None,
    wind: jnp.ndarray | None = None,
) -> RigidBodyState:
    """Advance one 0.02 s control step = ``params.substeps`` physics substeps.

    The optional per-env arrays (mass, thrust_scale, cg_offset, wind) carry
    domain randomization; they default to the nominal parameters.
    """
    if mass is None:
        mass = jnp.broadcast_to(params.mass, state.pos.shape[:-1])
    if thrust_scale is None:
        thrust_scale = jnp.ones_like(mass)
    if cg_offset is None:
        cg_offset = jnp.zeros(state.pos.shape[:-1] + (3,), state.pos.dtype)
    if wind is None:
        wind = jnp.zeros(state.pos.shape[:-1] + (3,), state.pos.dtype)

    wrench = accumulate_forces(
        state, control, params, mass, thrust_scale, cg_offset, wind
    )
    dt_sub = params.dt / params.substeps
    for _ in range(params.substeps):  # static unroll: substeps is a Python int
        state = substep(state, wrench, params, mass, dt_sub)
    return state
