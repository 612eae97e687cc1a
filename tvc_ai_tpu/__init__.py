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

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the fused train program costs ~10-15 min
# to compile cold on the remote TPU backend; with the cache, a process
# re-running an already-seen program shape starts in seconds. Opt out with
# TVC_NO_COMPILE_CACHE=1 (e.g. when diagnosing compiler issues).
if not _os.environ.get("TVC_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "TVC_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "tvc_jax_cache"),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # cache is an optimization, never a requirement
        pass

from tvc_ai_tpu import physics, env  # noqa: F401
