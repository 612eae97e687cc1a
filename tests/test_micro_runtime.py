"""Native int8 MCU runtime: build with g++, validate parity via ctypes."""

import shutil

import numpy as np
import pytest

from tvc_ai_tpu.agents.legacy import SACAgent, SACConfig

HAS_GXX = shutil.which("g++") is not None

pytestmark = pytest.mark.skipif(not HAS_GXX, reason="g++ not available")


@pytest.fixture(scope="module")
def agent():
    return SACAgent(obs_dim=8, action_dim=2, config=SACConfig(hidden_dims=(32, 32)))


@pytest.fixture(scope="module")
def calib():
    rng = np.random.default_rng(0)
    obs = rng.standard_normal((256, 8)).astype(np.float32)
    obs[:, :4] /= np.linalg.norm(obs[:, :4], axis=1, keepdims=True)
    obs[:, 7] = rng.uniform(0, 1, 256)
    return obs


def float_actor(agent, obs):
    return np.stack([agent.select_action(o, deterministic=True) for o in obs])


def test_native_runtime_builds():
    from tvc_ai_tpu.export.micro import build_runtime

    lib = build_runtime()
    assert lib.exists()


def test_quantize_roundtrip_parity(agent, calib):
    from tvc_ai_tpu.export.micro import MicroActor, quantize_actor

    model_bytes = quantize_actor(agent.state.actor_params, calib)
    actor = MicroActor(model_bytes)
    assert actor.input_dim == 8
    assert actor.output_dim == 2

    test_obs = calib[:64]
    native = actor(test_obs)
    ref = float_actor(agent, test_obs)
    max_diff = np.abs(native - ref).max()
    # same budget as the TFLite export path (ref export threshold 0.1)
    assert max_diff <= 0.1, f"int8 parity {max_diff:.4f} > 0.1"
    assert np.abs(native - ref).mean() <= 0.03


def test_runtime_rejects_garbage():
    from tvc_ai_tpu.export.micro import MicroActor

    with pytest.raises(ValueError):
        MicroActor(b"not a model")


def test_export_micro_writes_artifact(agent, calib, tmp_path):
    from tvc_ai_tpu.export.micro import MicroActor, export_micro

    path = export_micro(agent.state.actor_params, calib, tmp_path)
    assert path.exists()
    assert path.stat().st_size < 1024 * 1024  # MCU flash budget
    actor = MicroActor(path.read_bytes())
    out = actor(calib[0])
    assert out.shape == (2,)
    assert np.all(np.abs(out) <= 1.0)
