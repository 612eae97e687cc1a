"""PyBullet trajectory parity gate (BASELINE config #1).

Compares the JAX integrator against a PyBullet simulation constructed
exactly like the reference env (cylinder body, analytic inertia, engine
gravity + manual gravity double-apply, thrust at the base, exponential-
atmosphere drag, angular damping — env/enhanced_rocket_tvc_env.py:324-585).

PyBullet is NOT installed in the CI image (SURVEY notes it as third-party
C++); the whole module skips cleanly there and runs wherever
``import pybullet`` works. Free-flight and thrust phases are compared with
tolerances; contact-phase parity is intentionally excluded (penalty contact
vs LCP solver differ by design, documented in physics/types.py).
"""

import importlib.util
import math

import numpy as np
import pytest

HAS_PYBULLET = importlib.util.find_spec("pybullet") is not None

pytestmark = pytest.mark.skipif(not HAS_PYBULLET, reason="pybullet not installed")


def pybullet_trajectory(actions, steps, start_pos=(0.0, 0.0, 10.0)):
    import pybullet as p

    cid = p.connect(p.DIRECT)
    try:
        p.setGravity(0, 0, -9.81)
        p.setPhysicsEngineParameter(fixedTimeStep=0.02, numSubSteps=4)
        mass, length, radius = 2.0, 1.0, 0.05
        col = p.createCollisionShape(p.GEOM_CYLINDER, radius=radius, height=length)
        body = p.createMultiBody(
            baseMass=mass, baseCollisionShapeIndex=col, basePosition=start_pos
        )
        i_xx = (1 / 12) * mass * (3 * radius**2 + length**2)
        i_zz = 0.5 * mass * radius**2
        p.changeDynamics(body, -1, localInertiaDiagonal=[i_xx, i_xx, i_zz],
                         linearDamping=0.01, angularDamping=0.02)
        thrust = 35.0
        traj = []
        fuel = 1.0
        for action in actions:
            pos, orn = p.getBasePositionAndOrientation(body)
            vel, ang = p.getBaseVelocity(body)
            traj.append(np.array(list(pos) + list(orn) + list(vel) + list(ang)))
            # manual gravity (the double-apply quirk)
            p.applyExternalForce(body, -1, [0, 0, -9.81 * mass], pos, p.WORLD_FRAME)
            if fuel > 0:
                fuel = max(0.0, fuel - 0.001)
                pitch, yaw = np.asarray(action) * math.radians(18.0)
                local = np.array([
                    thrust * math.sin(yaw),
                    thrust * math.sin(pitch),
                    thrust * math.cos(pitch) * math.cos(yaw),
                ])
                rot = np.array(p.getMatrixFromQuaternion(orn)).reshape(3, 3)
                world = rot @ local
                at = np.array(pos) + rot @ np.array([0, 0, -0.5])
                p.applyExternalForce(body, -1, world.tolist(), at.tolist(),
                                     p.WORLD_FRAME)
            # aerodynamics
            v = np.array(vel)
            speed = np.linalg.norm(v)
            rho = 1.225 * math.exp(-pos[2] / 8400)
            if speed > 0.1:
                drag = 0.5 * rho * speed**2 * 0.47 * math.pi * radius**2
                p.applyExternalForce(body, -1, (-drag * v / speed).tolist(),
                                     pos, p.WORLD_FRAME)
            p.applyExternalTorque(body, -1, (-0.02 * rho * np.array(ang)).tolist(),
                                  p.WORLD_FRAME)
            p.stepSimulation()
        return np.stack(traj)
    finally:
        p.disconnect(cid)


def jax_trajectory(actions, steps, start_pos=(0.0, 0.0, 10.0)):
    import jax.numpy as jnp

    from tvc_ai_tpu.physics import (
        RigidBodyState, RocketParams, ThrustControl, step,
    )

    params = RocketParams(double_gravity=True)
    state = RigidBodyState.create(pos=start_pos)
    fuel = 1.0
    traj = []
    for action in actions:
        traj.append(
            np.concatenate([
                np.asarray(state.pos), np.asarray(state.quat),
                np.asarray(state.vel), np.asarray(state.omega),
            ])
        )
        gimbal = jnp.asarray(np.asarray(action) * math.radians(18.0), jnp.float32)
        state = step(
            state,
            ThrustControl(gimbal=gimbal, thrust_active=jnp.bool_(fuel > 0)),
            params,
        )
        fuel = max(0.0, fuel - 0.001)
    return np.stack(traj)


@pytest.mark.parametrize(
    "actions_fn,steps,pos_tol",
    [
        (lambda n: np.zeros((n, 2)), 50, 0.05),              # ballistic w/ thrust
        (lambda n: np.full((n, 2), 0.2), 40, 0.08),           # constant gimbal
        (
            lambda n: 0.3 * np.sin(np.arange(n)[:, None] * [0.1, 0.17]),
            40,
            0.1,
        ),                                                    # oscillating gimbal
    ],
)
def test_free_flight_parity(actions_fn, steps, pos_tol):
    actions = actions_fn(steps)
    ref = pybullet_trajectory(actions, steps)
    ours = jax_trajectory(actions, steps)
    # position parity
    np.testing.assert_allclose(ours[:, :3], ref[:, :3], atol=pos_tol,
                               err_msg="position")
    # attitude parity (quaternion dot, sign-invariant)
    dots = np.abs(np.sum(ours[:, 3:7] * ref[:, 3:7], axis=1))
    assert dots.min() > 0.999, f"quaternion divergence: min dot {dots.min()}"
