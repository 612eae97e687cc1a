"""Trainer-shell integration tests: end-to-end run, resume, artifacts."""

import json

import pytest

from tvc_ai_tpu.config import load_config


def tiny_cfg(tmp_path, total=2048):
    return load_config(None, overrides=[
        f"globals.output_dir={tmp_path}",
        f"training.total_timesteps={total}",
        "training.num_envs=8",
        "training.rollout_steps=16",
        "training.updates_per_step=1",
        "training.eval_freq=1024",
        "training.eval_episodes=2",
        "training.early_stopping.enabled=false",
        "algorithms.sac.hidden_dims=[16,16]",
        "algorithms.sac.buffer_size=2048",
        "algorithms.sac.learning_starts=64",
        "algorithms.sac.batch_size=16",
        "curriculum.enabled=false",
        "logging.tensorboard=false",
    ])


@pytest.mark.integration
@pytest.mark.slow
def test_trainer_end_to_end_and_resume(tmp_path):
    from tvc_ai_tpu.training.trainer import Trainer

    cfg = tiny_cfg(tmp_path)
    t1 = Trainer(cfg, output_dir=tmp_path / "run1")
    result = t1.train()
    assert result["env_steps"] >= 2048
    assert result["stop_reason"] == "total_timesteps"
    assert (tmp_path / "run1" / "final_metrics.json").exists()
    assert (tmp_path / "run1" / "metrics.csv").exists()
    saved_steps = result["env_steps"]

    # resume continues the counters and trains further
    cfg2 = tiny_cfg(tmp_path, total=4096)
    t2 = Trainer(
        cfg2,
        output_dir=tmp_path / "run2",
        resume=tmp_path / "run1" / "checkpoints",
    )
    assert t2.env_steps == saved_steps  # full carry restored
    result2 = t2.train()
    assert result2["env_steps"] >= 4096
    metrics = json.loads(
        (tmp_path / "run2" / "final_metrics.json").read_text()
    )
    assert metrics["env_steps"] == result2["env_steps"]

    # resume also accepts a single STEP directory (warm-starting a new
    # campaign from another run's exact best checkpoint)
    import os

    step_dirs = sorted(
        d for d in os.listdir(tmp_path / "run1" / "checkpoints")
        if d.isdigit()
    )
    t3 = Trainer(
        tiny_cfg(tmp_path, total=4096),
        output_dir=tmp_path / "run3",
        resume=tmp_path / "run1" / "checkpoints" / step_dirs[0],
    )
    assert t3.env_steps == int(step_dirs[0])


def test_robust_metric_requires_robust_eval(tmp_path):
    """early_stopping.metric=eval_robust_* without the robust eval would
    silently track the nominal metric (round-2 advisor finding) — must fail
    loudly at init instead."""
    from tvc_ai_tpu.training.trainer import Trainer

    cfg = tiny_cfg(tmp_path)
    cfg.training.early_stopping.metric = "eval_robust_success_rate"
    with pytest.raises(ValueError, match="eval_domain_randomization"):
        Trainer(cfg, output_dir=tmp_path / "runx")
