"""6-DOF quaternion rigid-body physics core (the PyBullet replacement)."""

from tvc_ai_tpu.physics import quaternion  # noqa: F401
from tvc_ai_tpu.physics.integrator import (  # noqa: F401
    ThrustControl,
    accumulate_forces,
    step,
    substep,
    thrust_body_vector,
)
from tvc_ai_tpu.physics.types import (  # noqa: F401
    ForceTorque,
    RigidBodyState,
    RocketParams,
)
