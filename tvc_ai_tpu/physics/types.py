"""Pytree state/parameter containers for the rigid-body core.

These are ``flax.struct`` dataclasses so they flow through ``jit``/``vmap``/
``scan``/``pjit`` as pytrees. All fields are plain arrays (no Python objects)
so a batch of N rockets is just the same pytree with a leading axis — the
TPU-native replacement for the reference's one-PyBullet-client-per-process
design (ref: env/enhanced_rocket_tvc_env.py:324-352).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RigidBodyState:
    """State of one rigid body (or a batch, with leading axes).

    pos/vel/omega are world frame; quat is body->world in xyzw layout.
    """

    pos: jnp.ndarray    # (..., 3) m
    quat: jnp.ndarray   # (..., 4) xyzw, unit
    vel: jnp.ndarray    # (..., 3) m/s
    omega: jnp.ndarray  # (..., 3) rad/s, world frame (PyBullet convention)

    @staticmethod
    def create(pos=(0.0, 0.0, 1.0)) -> "RigidBodyState":
        return RigidBodyState(
            pos=jnp.asarray(pos, jnp.float32),
            quat=jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
            vel=jnp.zeros(3, jnp.float32),
            omega=jnp.zeros(3, jnp.float32),
        )


@struct.dataclass
class RocketParams:
    """Static physical parameters of the rocket + world.

    Defaults mirror the reference digital twin's constants
    (ref: env/enhanced_rocket_tvc_env.py:409-464 rocket body,
    :338-345 engine parameters, :524-585 forces):

    - cylinder: mass 2.0 kg, length 1.0 m, radius 0.05 m
    - inertia: Ixx=Iyy=(1/12)m(3r²+l²), Izz=½mr²  (:431-432)
    - thrust 35 N at the base (-0.5 m from CG), gimbal ±18°  (:463,471,550)
    - fuel burn 0.001 per 0.02 s control step  (:532)
    - drag: Cd 0.47, frontal area πr², exponential atmosphere ρ=1.225·e^(−h/8400)
    - angular damping torque −0.02·ρ·ω  (:583-585)
    - Bullet body damping: linear 0.01 / angular 0.02 per substep  (:451-453)
    - ``double_gravity``: the reference applies gravity BOTH via the engine
      (:338) and manually every step (:524-527) — effective 2g. Kept as a
      flag (default True) so trajectories match the reference; set False for
      physically-correct single gravity.

    Per-episode *randomized* quantities (mass/thrust scale, CG offset, wind)
    are NOT here — they live in ``env.types.DomainParams`` so each vmapped
    env can carry its own draw.
    """

    mass: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(2.0))
    length: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    radius: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.05))
    thrust: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(35.0))
    max_gimbal: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(jnp.deg2rad(18.0))
    )
    fuel_burn_rate: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.001))
    thrust_offset: jnp.ndarray = struct.field(  # thrust application point, body frame
        default_factory=lambda: jnp.array([0.0, 0.0, -0.5], jnp.float32)
    )

    gravity: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(9.81))
    double_gravity: bool = struct.field(pytree_node=False, default=True)
    # Euler gyroscopic term ω_b × (I ω_b) in the angular update. Default
    # OFF: Bullet leaves it disabled unless explicitly enabled, and the
    # reference uses the default (ref :324-352 never calls
    # changeDynamics with gyroscopic flags), so parity = off. Turning it on
    # gives physically-correct torque-free precession (see
    # tests/test_physics_fidelity.py's analytic symmetric-top case).
    gyroscopic: bool = struct.field(pytree_node=False, default=False)
    # Magnus force on the spinning body (ref config/config.yaml:356 sets
    # ``magnus_effect: true`` but the reference env never implements it —
    # implemented here, opt-in). Model: Kutta–Joukowski lift for a rotating
    # cylinder, F = C_m · ρ · π r² l · (ω × v), applied at the CG.
    magnus_effect: bool = struct.field(pytree_node=False, default=False)
    magnus_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    # Ground-effect thrust augmentation (ref config/config.yaml:357, also
    # unimplemented there): plume reflection boosts effective thrust near
    # the pad, thrust_eff = thrust · (1 + strength · exp(−alt / height)).
    ground_effect: bool = struct.field(pytree_node=False, default=False)
    ground_effect_strength: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.1)
    )
    ground_effect_height: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.5)
    )

    # aerodynamics
    drag_coeff: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.47))
    rho0: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.225))
    atmosphere_scale_height: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(8400.0)
    )
    aero_angular_damping: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.02)
    )
    drag_min_speed: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.1))

    # Bullet-style body damping (applied per substep as v *= (1-d)^dt)
    linear_damping: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.01))
    angular_damping: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.02))

    # integration: 50 Hz control step, 4 substeps (ref :339-345)
    dt: float = struct.field(pytree_node=False, default=0.02)
    substeps: int = struct.field(pytree_node=False, default=4)

    # penalty ground contact (replaces the PyBullet plane, ref :347-352)
    contact_stiffness: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(4000.0)
    )
    contact_damping: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(60.0))
    contact_friction: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.8))

    def inertia_body(self, mass: jnp.ndarray | None = None) -> jnp.ndarray:
        """Diagonal body-frame inertia [Ixx, Iyy, Izz] for a solid cylinder."""
        m = self.mass if mass is None else mass
        i_xx = (1.0 / 12.0) * m * (3.0 * self.radius**2 + self.length**2)
        i_zz = 0.5 * m * self.radius**2
        return jnp.stack([i_xx, i_xx, i_zz], axis=-1)


@struct.dataclass
class ForceTorque:
    """Accumulated world-frame external force and torque about the CG."""

    force: jnp.ndarray   # (..., 3) N
    torque: jnp.ndarray  # (..., 3) N·m

    @staticmethod
    def zero(shape=()) -> "ForceTorque":
        return ForceTorque(
            force=jnp.zeros(shape + (3,), jnp.float32),
            torque=jnp.zeros(shape + (3,), jnp.float32),
        )

    def __add__(self, other: "ForceTorque") -> "ForceTorque":
        return ForceTorque(self.force + other.force, self.torque + other.torque)
