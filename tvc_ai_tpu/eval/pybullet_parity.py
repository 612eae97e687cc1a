"""PyBullet trajectory-parity harness (BASELINE gate #1), packaged so the
gate can run anywhere:

- On a machine WITH pybullet: ``record_goldens(path)`` simulates the
  reference-identical PyBullet scene (cylinder body, analytic inertia,
  double-gravity quirk, thrust at the base, exponential-atmosphere drag,
  angular damping — reference env/enhanced_rocket_tvc_env.py:324-585) for
  every scenario and writes a self-describing ``.npz`` fixture.
- Anywhere (this image included): ``check_goldens(path)`` replays the
  recorded action sequences through the JAX integrator and produces a
  pass/fail report against the recorded trajectories — no pybullet needed.

One command each way: ``python scripts/pybullet_goldens.py record|check``.
The checked-in fixture format means goldens recorded once keep guarding the
integrator offline forever after (tests/test_pybullet_parity.py replays
``tests/fixtures/pybullet_goldens.npz`` when present).

Contact-phase parity is intentionally out of scope: penalty contact vs
PyBullet's LCP solver differ by design (documented in physics/types.py).
"""

from __future__ import annotations

import importlib.util
import math
from dataclasses import dataclass
from pathlib import Path

import numpy as np

FIXTURE_VERSION = 1
DEFAULT_FIXTURE = Path(__file__).resolve().parents[2] / (
    "tests/fixtures/pybullet_goldens.npz"
)

MASS, LENGTH, RADIUS = 2.0, 1.0, 0.05
THRUST = 35.0
MAX_GIMBAL_RAD = math.radians(18.0)


@dataclass(frozen=True)
class Scenario:
    """A recorded free-flight parity scenario.

    ``pos_tol`` is the absolute position tolerance (m) over the whole
    trajectory; attitude uses the sign-invariant quaternion dot
    (> ``quat_dot_min``). Tolerances widen with control activity because the
    two integrators split the 0.02 s step differently (4 substeps vs
    semi-implicit sub-integration)."""

    name: str
    steps: int
    pos_tol: float
    quat_dot_min: float = 0.999

    def actions(self) -> np.ndarray:
        n = self.steps
        if self.name == "ballistic_thrust":
            return np.zeros((n, 2))
        if self.name == "constant_gimbal":
            return np.full((n, 2), 0.2)
        if self.name == "oscillating_gimbal":
            return 0.3 * np.sin(np.arange(n)[:, None] * [0.1, 0.17])
        if self.name == "step_gimbal":
            a = np.zeros((n, 2))
            a[n // 2 :] = [0.4, -0.3]
            return a
        if self.name == "spin_up":
            return np.stack(
                [0.25 * np.cos(0.3 * np.arange(n)), 0.25 * np.sin(0.3 * np.arange(n))],
                axis=1,
            )
        raise KeyError(self.name)


SCENARIOS: tuple[Scenario, ...] = (
    Scenario("ballistic_thrust", steps=50, pos_tol=0.05),
    Scenario("constant_gimbal", steps=40, pos_tol=0.08),
    Scenario("oscillating_gimbal", steps=40, pos_tol=0.10),
    Scenario("step_gimbal", steps=40, pos_tol=0.10),
    Scenario("spin_up", steps=40, pos_tol=0.10),
)

START_POS = (0.0, 0.0, 10.0)


def has_pybullet() -> bool:
    return importlib.util.find_spec("pybullet") is not None


def pybullet_trajectory(
    actions: np.ndarray, start_pos=START_POS
) -> np.ndarray:
    """Reference-identical PyBullet rollout → (T, 13) [pos, quat, vel, ω]."""
    import pybullet as p

    cid = p.connect(p.DIRECT)
    try:
        p.setGravity(0, 0, -9.81)
        p.setPhysicsEngineParameter(fixedTimeStep=0.02, numSubSteps=4)
        col = p.createCollisionShape(p.GEOM_CYLINDER, radius=RADIUS, height=LENGTH)
        body = p.createMultiBody(
            baseMass=MASS, baseCollisionShapeIndex=col, basePosition=start_pos
        )
        i_xx = (1 / 12) * MASS * (3 * RADIUS**2 + LENGTH**2)
        i_zz = 0.5 * MASS * RADIUS**2
        p.changeDynamics(
            body,
            -1,
            localInertiaDiagonal=[i_xx, i_xx, i_zz],
            linearDamping=0.01,
            angularDamping=0.02,
        )
        traj = []
        fuel = 1.0
        for action in np.asarray(actions):
            pos, orn = p.getBasePositionAndOrientation(body)
            vel, ang = p.getBaseVelocity(body)
            traj.append(np.array(list(pos) + list(orn) + list(vel) + list(ang)))
            # manual gravity (the reference's double-apply quirk, :338+:524-527)
            p.applyExternalForce(
                body, -1, [0, 0, -9.81 * MASS], pos, p.WORLD_FRAME
            )
            if fuel > 0:
                fuel = max(0.0, fuel - 0.001)
                pitch, yaw = np.asarray(action) * MAX_GIMBAL_RAD
                local = np.array(
                    [
                        THRUST * math.sin(yaw),
                        THRUST * math.sin(pitch),
                        THRUST * math.cos(pitch) * math.cos(yaw),
                    ]
                )
                rot = np.array(p.getMatrixFromQuaternion(orn)).reshape(3, 3)
                world = rot @ local
                at = np.array(pos) + rot @ np.array([0, 0, -0.5])
                p.applyExternalForce(
                    body, -1, world.tolist(), at.tolist(), p.WORLD_FRAME
                )
            v = np.array(vel)
            speed = np.linalg.norm(v)
            rho = 1.225 * math.exp(-pos[2] / 8400)
            if speed > 0.1:
                drag = 0.5 * rho * speed**2 * 0.47 * math.pi * RADIUS**2
                p.applyExternalForce(
                    body, -1, (-drag * v / speed).tolist(), pos, p.WORLD_FRAME
                )
            p.applyExternalTorque(
                body, -1, (-0.02 * rho * np.array(ang)).tolist(), p.WORLD_FRAME
            )
            p.stepSimulation()
        return np.stack(traj)
    finally:
        p.disconnect(cid)


def jax_trajectory(actions: np.ndarray, start_pos=START_POS) -> np.ndarray:
    """JAX-integrator rollout of the same scene → (T, 13)."""
    import jax.numpy as jnp

    from tvc_ai_tpu.physics import (
        RigidBodyState,
        RocketParams,
        ThrustControl,
        step,
    )

    params = RocketParams(double_gravity=True)
    state = RigidBodyState.create(pos=start_pos)
    fuel = 1.0
    traj = []
    for action in np.asarray(actions):
        traj.append(
            np.concatenate(
                [
                    np.asarray(state.pos),
                    np.asarray(state.quat),
                    np.asarray(state.vel),
                    np.asarray(state.omega),
                ]
            )
        )
        gimbal = jnp.asarray(np.asarray(action) * MAX_GIMBAL_RAD, jnp.float32)
        state = step(
            state,
            ThrustControl(gimbal=gimbal, thrust_active=jnp.bool_(fuel > 0)),
            params,
        )
        fuel = max(0.0, fuel - 0.001)
    return np.stack(traj)


def record_goldens(path: str | Path = DEFAULT_FIXTURE) -> Path:
    """Run PyBullet for every scenario and write the golden fixture."""
    if not has_pybullet():
        raise RuntimeError(
            "pybullet is not importable here — run this on a machine with "
            "pybullet installed (pip install pybullet)"
        )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload: dict[str, np.ndarray] = {
        "fixture_version": np.int64(FIXTURE_VERSION),
        "start_pos": np.asarray(START_POS),
    }
    names = []
    for sc in SCENARIOS:
        actions = sc.actions()
        payload[f"{sc.name}/actions"] = actions
        payload[f"{sc.name}/trajectory"] = pybullet_trajectory(actions)
        payload[f"{sc.name}/pos_tol"] = np.float64(sc.pos_tol)
        payload[f"{sc.name}/quat_dot_min"] = np.float64(sc.quat_dot_min)
        names.append(sc.name)
    payload["scenarios"] = np.asarray(names)
    np.savez_compressed(path, **payload)
    return path


def compare_trajectories(
    ours: np.ndarray, ref: np.ndarray, pos_tol: float, quat_dot_min: float
) -> dict:
    """Tolerance comparison → metrics dict with a ``passed`` flag."""
    pos_err = float(np.max(np.abs(ours[:, :3] - ref[:, :3])))
    quat_dot = float(
        np.min(np.abs(np.sum(ours[:, 3:7] * ref[:, 3:7], axis=1)))
    )
    return {
        "max_pos_err_m": pos_err,
        "pos_tol_m": pos_tol,
        "min_quat_dot": quat_dot,
        "quat_dot_min": quat_dot_min,
        "passed": pos_err <= pos_tol and quat_dot >= quat_dot_min,
    }


def check_goldens(path: str | Path = DEFAULT_FIXTURE) -> dict:
    """Replay recorded goldens through the JAX integrator → report dict."""
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(
            f"no golden fixture at {path} — record one with "
            "`python scripts/pybullet_goldens.py record` on a pybullet machine"
        )
    data = np.load(path, allow_pickle=False)
    version = int(data["fixture_version"])
    if version != FIXTURE_VERSION:
        raise ValueError(
            f"fixture version {version} != supported {FIXTURE_VERSION}"
        )
    report: dict = {"fixture": str(path), "scenarios": {}, "passed": True}
    start_pos = tuple(data["start_pos"])
    for name in data["scenarios"]:
        name = str(name)
        result = compare_trajectories(
            jax_trajectory(data[f"{name}/actions"], start_pos=start_pos),
            data[f"{name}/trajectory"],
            float(data[f"{name}/pos_tol"]),
            float(data[f"{name}/quat_dot_min"]),
        )
        report["scenarios"][name] = result
        report["passed"] &= result["passed"]
    return report
