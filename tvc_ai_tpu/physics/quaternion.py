"""Quaternion algebra for the 6-DOF rigid-body core.

Convention: quaternions are stored **[x, y, z, w]** (vector part first), the
same layout PyBullet reports from ``getBasePositionAndOrientation`` — the
reference environment exposes raw ``orn[0..3]`` as the first four observation
dims (ref: env/enhanced_rocket_tvc_env.py:598-604), so keeping the layout
makes observations bit-compatible.

All functions are shape-polymorphic over leading batch dimensions: they accept
``(..., 4)`` / ``(..., 3)`` arrays and are safe under ``vmap``/``jit``.
"""

from __future__ import annotations

import jax.numpy as jnp

# ------------------------------------------------------------------ basics

IDENTITY = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Return the unit quaternion, guarding the zero quaternion."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b in xyzw layout."""
    ax, ay, az, aw = jnp.moveaxis(a, -1, 0)
    bx, by, bz, bw = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v from body frame to world frame by unit quaternion q.

    Uses the expanded Rodrigues form (2 cross products) — cheaper than
    building the 3x3 matrix when rotating a single vector on the VPU.
    """
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def rotate_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v from world frame to body frame."""
    return rotate(conjugate(q), v)


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> (..., 3, 3) rotation matrix (body->world)."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit rotation quaternion from (unit) axis and angle (radians)."""
    half = 0.5 * angle[..., None]
    return jnp.concatenate([axis * jnp.sin(half), jnp.cos(half)], axis=-1)


def exp_map(omega_dt: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Quaternion exponential of a rotation vector ω·dt.

    Branch-free small-angle-safe form: sin(θ/2)/θ is computed via
    ``jnp.sinc`` so θ→0 yields the identity quaternion exactly.
    """
    theta = jnp.linalg.norm(omega_dt, axis=-1, keepdims=True)
    # sin(theta/2)/theta  ==  0.5*sinc(theta/(2*pi))
    k = 0.5 * jnp.sinc(theta / (2.0 * jnp.pi))
    return jnp.concatenate([omega_dt * k, jnp.cos(0.5 * theta)], axis=-1)


def integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Advance orientation by world-frame angular velocity over dt.

    q' = exp(ω_world·dt) ⊗ q (left multiplication for world-frame rates),
    renormalized — mirrors how PyBullet's Bullet core advances orientation
    (ref behavior: env/enhanced_rocket_tvc_env.py:477 `p.stepSimulation`).
    """
    dq = exp_map(omega_world * dt)
    return normalize(multiply(dq, q))


# ------------------------------------------------------------- euler / tilt


def to_euler_zyx(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> (roll, pitch, yaw) matching PyBullet's getEulerFromQuaternion.

    PyBullet extracts ZYX (yaw-pitch-roll) Tait-Bryan angles and returns
    them ordered [roll, pitch, yaw]. The reference derives its "tilt angle"
    from these (ref: env/enhanced_rocket_tvc_env.py:614-616).
    """
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    s = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(s)
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def tilt_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Reference-compatible tilt: sqrt(pitch² + yaw²) of the ZYX euler angles.

    NOTE: this reproduces the reference's (questionable) definition at
    env/enhanced_rocket_tvc_env.py:616 — it mixes pitch with *yaw* (heading)
    rather than roll. Kept for behavioral parity; see ``tilt_from_up`` for
    the physically meaningful tilt.
    """
    e = to_euler_zyx(q)
    return jnp.sqrt(e[..., 1] ** 2 + e[..., 2] ** 2)


def tilt_from_up(q: jnp.ndarray) -> jnp.ndarray:
    """Physical tilt: angle between the body +Z axis and world +Z axis."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    # third column of the rotation matrix, z component: R[2,2]
    up_z = 1.0 - 2.0 * (x * x + y * y)
    return jnp.arccos(jnp.clip(up_z, -1.0, 1.0))


def random_tilt_quaternion(key, max_tilt: jnp.ndarray) -> jnp.ndarray:
    """Sample a quaternion tilted from vertical by up to ``max_tilt`` radians.

    Used for curriculum-staged initial-attitude randomization (the reference
    specs per-stage `initial_tilt_range`, config/config.yaml:240-286).
    """
    import jax

    k1, k2 = jax.random.split(key)
    angle = jax.random.uniform(k1, (), minval=0.0, maxval=max_tilt)
    azimuth = jax.random.uniform(k2, (), minval=0.0, maxval=2.0 * jnp.pi)
    axis = jnp.array([jnp.cos(azimuth), jnp.sin(azimuth), 0.0])
    return from_axis_angle(axis, angle)
