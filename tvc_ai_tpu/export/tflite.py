"""JAX → TFLite int8 export for microcontroller deployment.

Covers the reference's export pipeline (scripts/export_tflm.py) from JAX
instead of torch:

- ``build_keras_actor``: mirrors the flax ``GaussianActor`` deterministic
  path (Dense+ReLU stack → mean head → tanh) as a Keras model with weights
  copied in — the reference's param-name-walking converter (:49-180) is
  unnecessary because we own both sides.
- ``representative_dataset``: observations gathered from on-device policy
  rollouts (ref :183-223 samples 100 env states).
- ``convert_int8``: full-integer PTQ (TFLITE_BUILTINS_INT8, int8 in/out) at
  none/default/aggressive levels (ref :225-256).
- ``validate``: int8-vs-float action diff + latency benchmark via the TFLite
  interpreter (ref ModelValidator :259-408). Export parity threshold 0.1
  matches ref :174-180.

Gated on TensorFlow's presence — import errors surface as ``ExportError``
with a clear message rather than at import time.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


class ExportError(RuntimeError):
    pass


def _require_tf():
    try:
        import tensorflow as tf  # noqa: F401

        return tf
    except Exception as exc:  # pragma: no cover
        raise ExportError(
            "TensorFlow is required for TFLite export but is not available"
        ) from exc


@dataclasses.dataclass
class ExportResult:
    tflite_path: Path
    size_bytes: int
    max_action_diff: float
    mean_action_diff: float
    latency_us: float
    optimization: str


def actor_dense_stack(actor_params: Any) -> list[tuple[np.ndarray, np.ndarray]]:
    """Ordered (kernel, bias) list: hidden_0..hidden_{n-1}, mean_head."""
    p = actor_params["params"]
    names = sorted(
        (k for k in p if k.startswith("hidden_")),
        key=lambda s: int(s.split("_")[1]),
    )
    stack = [(np.asarray(p[n]["kernel"]), np.asarray(p[n]["bias"])) for n in names]
    stack.append(
        (np.asarray(p["mean_head"]["kernel"]), np.asarray(p["mean_head"]["bias"]))
    )
    return stack


def build_keras_actor(actor_params: Any, obs_dim: int):
    """Keras mirror of the deterministic actor: ReLU MLP → tanh(mean)."""
    tf = _require_tf()
    stack = actor_dense_stack(actor_params)
    inputs = tf.keras.Input(shape=(obs_dim,), dtype=tf.float32, name="obs")
    x = inputs
    for kernel, bias in stack[:-1]:
        x = tf.keras.layers.Dense(kernel.shape[1], activation="relu")(x)
    kernel, bias = stack[-1]
    x = tf.keras.layers.Dense(kernel.shape[1])(x)
    outputs = tf.keras.layers.Activation("tanh", name="gimbal")(x)
    model = tf.keras.Model(inputs, outputs)
    # copy weights layer by layer
    dense_layers = [l for l in model.layers if isinstance(l, tf.keras.layers.Dense)]
    for layer, (kernel, bias) in zip(dense_layers, stack):
        layer.set_weights([kernel, bias])
    return model


def collect_representative_obs(
    policy_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None,
    env_params,
    num_samples: int = 100,
    obs_dim: int = 10,
    seed: int = 0,
) -> np.ndarray:
    """Observations from batched env rollouts (random policy if none given)."""
    from tvc_ai_tpu.env import rocket_env

    n = min(num_samples, 64)
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, n)
    states, obs = jax.vmap(rocket_env.reset, in_axes=(0, None))(keys, env_params)
    batched = jax.jit(jax.vmap(rocket_env.step_autoreset, in_axes=(0, 0, None)))
    samples = [np.asarray(obs)[..., :obs_dim]]
    steps = max(num_samples // n, 1)
    for i in range(steps):
        key, k = jax.random.split(key)
        if policy_fn is None:
            actions = jax.random.uniform(k, (n, 2), minval=-1.0, maxval=1.0)
        else:
            actions = policy_fn(obs, k)
        states, out, obs = batched(states, actions, env_params)
        samples.append(np.asarray(obs)[..., :obs_dim])
    data = np.concatenate(samples, axis=0)[: max(num_samples, n)]
    return data.astype(np.float32)


def convert_int8(
    keras_model,
    representative_obs: np.ndarray,
    optimization: str = "default",
) -> bytes:
    """Full-int8 PTQ (ref TFLiteOptimizer :225-256)."""
    tf = _require_tf()
    converter = tf.lite.TFLiteConverter.from_keras_model(keras_model)
    if optimization == "none":
        return converter.convert()

    def rep_dataset():
        for row in representative_obs:
            yield [row[None, :]]

    converter.optimizations = [tf.lite.Optimize.DEFAULT]
    converter.representative_dataset = rep_dataset
    converter.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
    converter.inference_input_type = tf.int8
    converter.inference_output_type = tf.int8
    if optimization == "aggressive":
        converter.target_spec.supported_types = [tf.int8]
    return converter.convert()


class TFLiteActor:
    """Host-side int8 interpreter wrapper (quantize in, dequantize out)."""

    def __init__(self, model_bytes: bytes):
        tf = _require_tf()
        self.interpreter = tf.lite.Interpreter(model_content=model_bytes)
        self.interpreter.allocate_tensors()
        self.inp = self.interpreter.get_input_details()[0]
        self.out = self.interpreter.get_output_details()[0]

    def __call__(self, obs: np.ndarray) -> np.ndarray:
        obs = np.asarray(obs, np.float32)
        single = obs.ndim == 1
        if single:
            obs = obs[None]
        actions = []
        for row in obs:
            x = row[None, :]
            if self.inp["dtype"] == np.int8:
                scale, zp = self.inp["quantization"]
                x = np.clip(np.round(x / scale + zp), -128, 127).astype(np.int8)
            self.interpreter.set_tensor(self.inp["index"], x)
            self.interpreter.invoke()
            y = self.interpreter.get_tensor(self.out["index"])
            if self.out["dtype"] == np.int8:
                scale, zp = self.out["quantization"]
                y = (y.astype(np.float32) - zp) * scale
            actions.append(y[0])
        result = np.stack(actions)
        return result[0] if single else result


def validate_actions(
    tflite_actor: TFLiteActor,
    reference_fn: Callable[[np.ndarray], np.ndarray],
    obs_samples: np.ndarray,
) -> tuple[float, float]:
    """(max, mean) |Δaction| between int8 and float actor (ref :304-340)."""
    ref = np.asarray(reference_fn(obs_samples))
    quant = tflite_actor(obs_samples)
    diff = np.abs(ref - quant)
    return float(diff.max()), float(diff.mean())


def benchmark_latency(tflite_actor: TFLiteActor, obs: np.ndarray, n: int = 200) -> float:
    """Mean single-inference latency in µs (ref :370-408)."""
    import time

    tflite_actor(obs[0])  # warmup
    t0 = time.perf_counter()
    for i in range(n):
        tflite_actor(obs[i % len(obs)])
    return (time.perf_counter() - t0) / n * 1e6


def export_actor(
    actor_params: Any,
    obs_dim: int,
    env_params,
    output_dir: str | Path,
    optimization: str = "default",
    num_calibration_samples: int = 100,
    deterministic_fn: Callable[[np.ndarray], np.ndarray] | None = None,
) -> ExportResult:
    """Full pipeline: keras mirror → calibrate → int8 → validate → save."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    keras_model = build_keras_actor(actor_params, obs_dim)

    if deterministic_fn is None:
        stack = actor_dense_stack(actor_params)

        def deterministic_fn(obs):
            x = np.asarray(obs, np.float32)
            for kernel, bias in stack[:-1]:
                x = np.maximum(x @ kernel + bias, 0.0)
            kernel, bias = stack[-1]
            return np.tanh(x @ kernel + bias)

    rep = collect_representative_obs(
        None, env_params, num_calibration_samples, obs_dim
    )
    model_bytes = convert_int8(keras_model, rep, optimization)
    path = output_dir / f"tvc_actor_{optimization}.tflite"
    path.write_bytes(model_bytes)

    actor = TFLiteActor(model_bytes)
    max_diff, mean_diff = validate_actions(actor, deterministic_fn, rep[:64])
    latency = benchmark_latency(actor, rep)
    return ExportResult(
        tflite_path=path,
        size_bytes=len(model_bytes),
        max_action_diff=max_diff,
        mean_action_diff=mean_diff,
        latency_us=latency,
        optimization=optimization,
    )
