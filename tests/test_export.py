"""int8 TFLite export parity tests (gated on TensorFlow presence)."""

import importlib.util

import jax
import numpy as np
import pytest

from tvc_ai_tpu.agents.legacy import SACAgent, SACConfig
from tvc_ai_tpu.env.wrappers import RocketConfig

HAS_TF = importlib.util.find_spec("tensorflow") is not None

pytestmark = pytest.mark.skipif(not HAS_TF, reason="tensorflow not installed")


@pytest.fixture(scope="module")
def agent():
    return SACAgent(obs_dim=8, action_dim=2, config=SACConfig(hidden_dims=(32, 32)))


@pytest.fixture(scope="module")
def env_params():
    return RocketConfig().to_env_params(
        domain_randomization=False, sensor_noise=False, max_episode_steps=100
    )


def test_keras_mirror_matches_flax(agent):
    from tvc_ai_tpu.export.tflite import actor_dense_stack, build_keras_actor

    keras_model = build_keras_actor(agent.state.actor_params, obs_dim=8)
    obs = np.random.default_rng(0).standard_normal((16, 8)).astype(np.float32)
    keras_out = keras_model.predict(obs, verbose=0)
    flax_det = np.stack(
        [agent.select_action(o, deterministic=True) for o in obs]
    )
    assert np.abs(keras_out - flax_det).max() < 1e-4


@pytest.mark.slow
def test_int8_export_parity(agent, env_params, tmp_path):
    """BASELINE config #5: int8 action parity ≤ 0.1 (ref export threshold)."""
    from tvc_ai_tpu.export.tflite import export_actor

    result = export_actor(
        agent.state.actor_params,
        obs_dim=8,
        env_params=env_params,
        output_dir=tmp_path,
        optimization="default",
        num_calibration_samples=64,
    )
    assert result.tflite_path.exists()
    assert result.size_bytes < 1024 * 1024  # MCU flash budget (1 MB)
    assert result.max_action_diff <= 0.1
    assert result.latency_us > 0


@pytest.mark.slow
def test_c_array_generation(agent, env_params, tmp_path):
    from tvc_ai_tpu.export.c_array import generate_c_array, generate_tflm_example
    from tvc_ai_tpu.export.tflite import export_actor

    result = export_actor(
        agent.state.actor_params,
        obs_dim=8,
        env_params=env_params,
        output_dir=tmp_path,
        optimization="default",
        num_calibration_samples=64,
    )
    cc, h = generate_c_array(result.tflite_path.read_bytes(), tmp_path)
    example = generate_tflm_example(tmp_path, obs_dim=8, action_dim=2)
    text = cc.read_text()
    assert "tvc_model_data[]" in text
    assert f"tvc_model_data_len = {result.size_bytes}" in text
    assert "MicroInterpreter" in example.read_text()
    assert "tvc_infer" in example.read_text()
