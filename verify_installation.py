#!/usr/bin/env python
"""Installation verification — the reference's verify_installation.py, TPU-native.

Checks the Python version, core dependencies, and smoke-tests the actual
compute path (jit a physics step, run a tiny env episode) plus optional
features (TensorFlow export, TensorBoard, Optuna), mirroring
verify_installation.py:24-198 in the reference.
"""

from __future__ import annotations

import importlib.util
import sys

RESULTS: list[tuple[str, bool, str]] = []


def check(name: str, ok: bool, detail: str = "") -> None:
    RESULTS.append((name, ok, detail))
    mark = "ok  " if ok else "FAIL"
    print(f"[{mark}] {name}{': ' + detail if detail else ''}")


def main() -> int:
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    # --- python version
    v = sys.version_info
    check(
        "python >= 3.10",
        (v.major, v.minor) >= (3, 10),
        f"{v.major}.{v.minor}.{v.micro}",
    )

    # --- core deps
    for mod, minimum in [
        ("jax", "0.4"), ("flax", "0.8"), ("optax", "0.1"),
        ("orbax.checkpoint", ""), ("gymnasium", "0.26"), ("numpy", "1.24"),
        ("yaml", ""),
    ]:
        spec = importlib.util.find_spec(mod)
        if spec is None:
            check(mod, False, "not installed")
            continue
        try:
            imported = __import__(mod.split(".")[0])
            version = getattr(imported, "__version__", "?")
            check(mod, True, version)
        except Exception as exc:  # pragma: no cover
            check(mod, False, str(exc))

    # --- jax devices + jit smoke test
    try:
        import jax
        import jax.numpy as jnp

        devices = jax.devices()
        check("jax devices", len(devices) > 0, ", ".join(map(str, devices)))
        y = jax.jit(lambda x: jnp.sin(x) * 2)(jnp.ones(8))
        check("jit smoke test", bool(jnp.isfinite(y).all()))
    except Exception as exc:
        check("jax runtime", False, str(exc))

    # --- physics + env smoke test (the PyBullet-equivalent check)
    try:
        from tvc_ai_tpu.env import EnvParams, rocket_env
        import jax

        state, obs = rocket_env.reset(jax.random.PRNGKey(0), EnvParams())
        import jax.numpy as jnp

        state, out = jax.jit(rocket_env.step)(state, jnp.zeros(2), EnvParams())
        check("rocket env step", bool(jnp.isfinite(out.reward)),
              f"reward={float(out.reward):.2f}")
    except Exception as exc:
        check("rocket env", False, str(exc))

    # --- gymnasium registration
    try:
        import gymnasium as gym

        from tvc_ai_tpu.env import register_envs

        register_envs()
        env = gym.make("EnhancedRocketTVC-v0")
        env.reset()
        env.close()
        check("gymnasium registration", True)
    except Exception as exc:
        check("gymnasium registration", False, str(exc))

    # --- optional features
    for mod, feature in [
        ("tensorflow", "int8 TFLite export"),
        ("tensorboardX", "TensorBoard logging"),
        ("optuna", "Optuna HPO (falls back to built-in search)"),
        ("matplotlib", "plots"),
        ("psutil", "host telemetry"),
    ]:
        present = importlib.util.find_spec(mod) is not None
        print(f"[{'ok  ' if present else 'opt '}] optional: {feature} "
              f"({'available' if present else 'absent'})")

    failures = [n for n, ok, _ in RESULTS if not ok]
    print()
    if failures:
        print(f"FAILED checks: {failures}")
        return 1
    print("All required checks passed.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
