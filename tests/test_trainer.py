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


# ---------------------------------------------------------------- eval gating
class _StubCkpt:
    """Records save calls; stands in for the orbax managers so gating tests
    exercise the host logic without disk writes or step-collision rules."""

    def __init__(self):
        self.saved_steps = []

    def save(self, step, carry, host, force=False):
        self.saved_steps.append(int(step))

    def wait(self):
        pass


@pytest.fixture(scope="module")
def gate_trainer(tmp_path_factory):
    """One tiny Trainer shared by the gating tests (init compiles the fused
    loop once); each test resets the host-side state it exercises."""
    from tvc_ai_tpu.training.trainer import Trainer

    tmp_path = tmp_path_factory.mktemp("gating")
    cfg = tiny_cfg(tmp_path)
    cfg.training.early_stopping.metric = "eval_robust_success_rate"
    cfg.training.eval_domain_randomization = True
    cfg.training.early_stopping.enabled = False
    cfg.curriculum.enabled = True
    cfg.env.domain_randomization.enabled = True
    return Trainer(cfg, output_dir=tmp_path / "run")


def _reset_gate_state(t):
    from tvc_ai_tpu.training.curriculum import CurriculumManager

    t.curriculum = CurriculumManager(t.cfg)
    t.best_metric = float("-inf")
    t.best_nominal_key = (float("-inf"), float("-inf"))
    t.best_significant_metric = float("-inf")
    t.eval_rounds_since_improvement = 0
    t.ckpt_best = _StubCkpt()
    t.ckpt_best_nominal = _StubCkpt()
    return t


def _metrics(nominal, stage=None, robust=None):
    m = {
        "eval_success_rate": nominal,
        "eval_reward_mean": 0.0,
        "eval_crash_rate": 0.0,
    }
    if stage is not None:
        m["eval_stage_success_rate"] = stage
    if robust is not None:
        m["eval_robust_success_rate"] = robust
    return m


@pytest.mark.slow
class TestEvalOutcomeGating:
    """Pin the host-side eval gating (training.trainer._apply_eval_outcome):
    the logic class that silently mispromoted for 137M steps in round 3
    (nominal-gated promotion gamed by the easy mixture) and froze best
    capture on a saturated metric."""

    def test_stage_eval_gates_promotion(self, gate_trainer):
        # 100% nominal must NOT promote while the stage's own distribution
        # scores 0 — the exact round-3 failure
        t = _reset_gate_state(gate_trainer)
        t.curriculum.steps_in_stage = t.curriculum.cur.min_stage_steps  # dwell done
        for _ in range(4):
            assert t._apply_eval_outcome(_metrics(1.0, stage=0.0)) is None
        assert t.curriculum.stage_idx == 0
        # once the STAGE eval demonstrates the threshold, promotion fires
        thr = t.curriculum.stage.success_threshold
        t._apply_eval_outcome(_metrics(1.0, stage=thr))
        t._apply_eval_outcome(_metrics(1.0, stage=thr))
        assert t.curriculum.stage_idx == 1

    def test_promotion_respects_dwell(self, gate_trainer):
        t = _reset_gate_state(gate_trainer)
        t.curriculum.cur.min_stage_steps = 10_000
        try:
            t.curriculum.steps_in_stage = 0  # dwell NOT satisfied
            thr = t.curriculum.stage.success_threshold
            for _ in range(5):
                t._apply_eval_outcome(_metrics(1.0, stage=thr))
            assert t.curriculum.stage_idx == 0
        finally:
            t.curriculum.cur.min_stage_steps = 0

    def test_lexicographic_nominal_capture(self, gate_trainer):
        # a saturated nominal metric must not freeze capture: ties on the
        # first component are broken by the robust/stage score
        t = _reset_gate_state(gate_trainer)
        t._apply_eval_outcome(_metrics(1.0, robust=0.2))
        assert t.best_nominal_key == (1.0, 0.2)
        n_saves = len(t.ckpt_best_nominal.saved_steps)
        t._apply_eval_outcome(_metrics(1.0, robust=0.1))  # worse tiebreak
        assert t.best_nominal_key == (1.0, 0.2)
        assert len(t.ckpt_best_nominal.saved_steps) == n_saves
        t._apply_eval_outcome(_metrics(1.0, robust=0.5))  # better tiebreak
        assert t.best_nominal_key == (1.0, 0.5)
        assert len(t.ckpt_best_nominal.saved_steps) == n_saves + 1

    def test_stage_tiebreak_resets_on_promotion(self, gate_trainer):
        # ADVICE r3: a stage-eval tiebreak earned on an easy stage compares
        # on a different scale than later stages' — promotion must reset it
        t = _reset_gate_state(gate_trainer)
        t.curriculum.steps_in_stage = t.curriculum.cur.min_stage_steps
        thr = t.curriculum.stage.success_threshold
        # capture with a high stage tiebreak on the easy stage (no robust
        # eval in the metrics → the stage fallback is the tiebreak)
        t._apply_eval_outcome(_metrics(1.0, stage=0.9))
        t._apply_eval_outcome(_metrics(1.0, stage=0.9))
        assert t.best_nominal_key == (1.0, 0.9)
        # drive promotion (max-of-window gate)
        t._apply_eval_outcome(_metrics(1.0, stage=max(thr, 0.9)))
        assert t.curriculum.stage_idx == 1
        # the tiebreak reset: a later harder-stage policy at (1.0, 0.3)
        # must now be capturable
        assert t.best_nominal_key[1] == float("-inf")
        n_saves = len(t.ckpt_best_nominal.saved_steps)
        t._apply_eval_outcome(_metrics(1.0, stage=0.3))
        assert t.best_nominal_key == (1.0, 0.3)
        assert len(t.ckpt_best_nominal.saved_steps) == n_saves + 1

    def test_robust_tiebreak_not_reset_on_promotion(self, gate_trainer):
        # the robust eval is one fixed distribution — promotion must NOT
        # clear a tiebreak earned on it
        t = _reset_gate_state(gate_trainer)
        t.curriculum.steps_in_stage = t.curriculum.cur.min_stage_steps
        thr = t.curriculum.stage.success_threshold
        t._apply_eval_outcome(_metrics(1.0, stage=thr, robust=0.4))
        t._apply_eval_outcome(_metrics(1.0, stage=thr, robust=0.4))
        t._apply_eval_outcome(_metrics(1.0, stage=thr, robust=0.4))
        assert t.curriculum.stage_idx == 1
        assert t.best_nominal_key == (1.0, 0.4)

    def test_primary_best_and_early_stopping(self, gate_trainer):
        t = _reset_gate_state(gate_trainer)
        t.cfg.training.early_stopping.enabled = True
        t.cfg.training.early_stopping.patience = 2
        try:
            assert t._apply_eval_outcome(_metrics(0.5, robust=0.3)) is None
            assert t.best_metric == 0.3  # tracks the configured robust metric
            assert t.ckpt_best.saved_steps  # captured
            # no significant improvement twice → early stopping
            assert t._apply_eval_outcome(_metrics(0.5, robust=0.3)) is None
            assert (
                t._apply_eval_outcome(_metrics(0.5, robust=0.3))
                == "early_stopping"
            )
        finally:
            t.cfg.training.early_stopping.enabled = False


@pytest.mark.slow
def test_warm_start_actor(tmp_path):
    """training.warm_start_actor: the trainer's actor (and EMA shadow)
    start from a distilled-student msgpack; critic/optimizers stay fresh;
    a shape-mismatched artifact fails loudly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from tvc_ai_tpu.agents import sac as sac_mod
    from tvc_ai_tpu.training.trainer import Trainer

    cfg = tiny_cfg(tmp_path, total=256)
    cfg.hardware.mesh_devices = 1  # warm start is single-device
    cfg.algorithms.sac.ema_decay = 0.999  # exercise the EMA copy too
    # build a fake student artifact with the SAME architecture
    scfg = sac_mod.SACConfig(hidden_dims=(16, 16), ema_decay=0.999)
    template = sac_mod.init(jax.random.PRNGKey(123), 10, 2, scfg)
    # make its actor recognizably different from any fresh init
    marked = jax.tree.map(
        lambda a: jnp.full_like(a, 0.125), template.actor_params
    )
    artifact = template.replace(actor_params=marked)
    path = tmp_path / "student.msgpack"
    path.write_bytes(
        serialization.msgpack_serialize(
            {"state": serialization.to_state_dict(artifact)}
        )
    )
    cfg.training.warm_start_actor = str(path)
    t = Trainer(cfg, output_dir=tmp_path / "ws")
    got = jax.tree.leaves(t.carry.agent.actor_params)
    assert all(np.allclose(np.asarray(g), 0.125) for g in got)
    if t.carry.agent.ema_actor_params is not None:
        ema = jax.tree.leaves(t.carry.agent.ema_actor_params)
        assert all(np.allclose(np.asarray(g), 0.125) for g in ema)
    # critic must NOT be the artifact's (fresh init)
    crit = jax.tree.leaves(t.carry.agent.critic_params)
    assert not all(np.allclose(np.asarray(c), 0.125) for c in crit)

    # mismatched architecture → loud failure
    scfg2 = sac_mod.SACConfig(hidden_dims=(8, 8))
    bad = sac_mod.init(jax.random.PRNGKey(1), 10, 2, scfg2)
    bad_path = tmp_path / "bad.msgpack"
    bad_path.write_bytes(
        serialization.msgpack_serialize(
            {"state": serialization.to_state_dict(bad)}
        )
    )
    cfg2 = tiny_cfg(tmp_path, total=256)
    cfg2.hardware.mesh_devices = 1
    cfg2.training.warm_start_actor = str(bad_path)
    with pytest.raises(ValueError, match="shape mismatch"):
        Trainer(cfg2, output_dir=tmp_path / "ws_bad")


@pytest.mark.slow
def test_demo_seeding_fills_replay(tmp_path):
    """training.demo_seeding: the replay buffer holds LQR demonstration
    transitions (in the policy's own obs space, drift channels included)
    before the first training iteration."""
    import numpy as np
    from tvc_ai_tpu.training.trainer import Trainer

    cfg = tiny_cfg(tmp_path, total=256)
    cfg.training.demo_seeding.enabled = True
    cfg.training.demo_seeding.envs = 8
    cfg.training.demo_seeding.steps = 32
    cfg.training.demo_seeding.cg_offset_max = 0.02
    cfg.training.demo_seeding.fraction = 0.25
    cfg.env.drift_observation.enabled = True
    cfg.hardware.mesh_devices = 1  # demo seeding is single-device
    t = Trainer(cfg, output_dir=tmp_path / "seeded")
    assert int(t.carry.buffer.size) == 8 * 32
    obs = np.asarray(t.carry.buffer.data["obs"][: 8 * 32])
    assert obs.shape[-1] == 14  # 10 base + 4 drift channels
    # demos actually moved the vehicle: drift channels vary
    assert np.abs(obs[:, -4:]).max() > 1e-4
    # fraction > 0: the persistent demo buffer exists, full, and identical
    # to the ring's seeded region
    assert t.carry.demo_buffer is not None
    assert int(t.carry.demo_buffer.size) == 8 * 32
    demo_obs = np.asarray(t.carry.demo_buffer.data["obs"])
    assert np.allclose(demo_obs, obs)
    # the fused loop trains with mixed demo/online batches
    result = t.train()
    assert result["env_steps"] >= 256
    # resume restores both buffers (structure matches because seeding also
    # runs on resume before the restore overwrites it)
    t2 = Trainer(
        cfg, output_dir=tmp_path / "resumed",
        resume=tmp_path / "seeded" / "checkpoints",
    )
    assert int(t2.carry.buffer.size) >= 8 * 32
    assert np.allclose(np.asarray(t2.carry.demo_buffer.data["obs"]), demo_obs)
