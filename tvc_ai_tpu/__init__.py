"""TVC-AI-TPU: a TPU-native rocket thrust-vector-control RL framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
project NIKHILSAI71/TVC-AI (a PyBullet + PyTorch deep-RL digital twin for
model-rocket TVC). Nothing here is a port: the PyBullet C++ physics engine is
replaced by a batched, jit/vmap-able 6-DOF quaternion rigid-body integrator;
the per-transition torch training loop is replaced by a fused
rollout+update `lax.scan` program sharded over a TPU mesh with `pjit`.

Layout
------
- ``physics``   6-DOF rigid-body core (quaternions, integrator, aero, contact)
- ``env``       functional batched environment + Gymnasium wrappers
- ``models``    flax networks (MLP, transformer policy, safety, curiosity, ...)
- ``agents``    SAC / PPO / TD3 / ensemble functional agents + replay
- ``ops``       Pallas TPU kernels for the hot inner loops
- ``parallel``  mesh construction and sharded train steps
- ``training``  trainer shell, curriculum, stability, hacking detection
- ``utils``     checkpointing (orbax), logging, metrics
- ``eval``      evaluation suites (standard / robustness / stress)
- ``export``    int8 TFLite-Micro export + C array generation
"""

__version__ = "0.1.0"

from tvc_ai_tpu import physics, env  # noqa: F401
