"""Host-side subsystem tests: curriculum, hacking, stability, ckpt, viz, HPO."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvc_ai_tpu.config.schema import FrameworkConfig
from tvc_ai_tpu.training.curriculum import CurriculumManager
from tvc_ai_tpu.training.hacking import RewardHackingDetector
from tvc_ai_tpu.training.stability import (
    StabilityConfig,
    TrainingStabilityManager,
    adaptive_tau,
    make_lr_schedule,
    primacy_reset,
    reinit_dormant_units,
)


# ------------------------------------------------------------- curriculum


def test_curriculum_advances_on_success():
    cfg = FrameworkConfig()
    cm = CurriculumManager(cfg)
    stage0 = cm.stage.name
    # half the stage budget with high success → advance
    advanced = False
    for _ in range(30):
        if cm.update(episodes_finished=10, success_rate=0.95):
            advanced = True
            break
    assert advanced
    assert cm.stage.name != stage0
    assert cm.history[0]["stage"] == stage0


def test_curriculum_stalls_without_success():
    cfg = FrameworkConfig()
    cm = CurriculumManager(cfg)
    budget = cm.stage.episodes
    # burn many multiples of the stage budget at 0% success: promotion is
    # strictly on merit (no budget-exhaustion hard cap — at 512 parallel
    # envs budgets elapse in seconds, and a cap would skip every stage)
    for _ in range(50):
        cm.update(episodes_finished=budget // 10, success_rate=0.0)
    assert cm.stage_idx == 0


def test_curriculum_env_overlay():
    from tvc_ai_tpu.config.build import build_env_params

    cfg = FrameworkConfig()
    cm = CurriculumManager(cfg)
    p0 = build_env_params(cfg, cm.get_environment_config())
    cm.advance_stage()
    cm.advance_stage()
    p2 = build_env_params(cfg, cm.get_environment_config())
    assert float(p2.randomization.wind_max) > float(p0.randomization.wind_max)
    assert float(p2.randomization.init_tilt_max) > float(
        p0.randomization.init_tilt_max
    )
    # shapes identical → no recompile on promotion
    assert jax.tree.structure(p0) == jax.tree.structure(p2)


def test_curriculum_state_roundtrip():
    """Progress (stage, counters) round-trips; the rolling windows are
    deliberately DROPPED on load — a checkpoint may be resumed into a
    different campaign (new stages / promotion gate) where inherited
    evidence would promote spuriously on the first post-resume eval
    (round 3: a 100%-nominal window resumed into a DR campaign)."""
    cfg = FrameworkConfig()
    cm = CurriculumManager(cfg)
    cm.update(50, 0.5)
    state = cm.state_dict()
    cm2 = CurriculumManager(cfg)
    cm2.load_state_dict(state)
    assert cm2.episodes_in_stage == cm.episodes_in_stage
    assert cm2.stage_idx == cm.stage_idx
    assert cm2.steps_in_stage == cm.steps_in_stage
    assert list(cm2.success_window) == []
    assert list(cm2.eval_window) == []


def test_curriculum_watchdog_flags_unreachable_gate():
    """The r4c failure class: a stage threshold far above what the policy
    ever demonstrates must raise the watchdog after `watchdog_evals` stage
    evals — instead of silently pinning the campaign at stage 0 for its
    whole budget (80M steps in r4c)."""
    import dataclasses

    cfg = FrameworkConfig()
    cfg.curriculum = dataclasses.replace(
        cfg.curriculum, watchdog_evals=6, watchdog_fraction=0.5
    )
    cfg.curriculum.stages[0].success_threshold = 0.8
    cm = CurriculumManager(cfg)
    # oscillating evals topping out at 0.3 < 0.5 * 0.8
    for v in [0.0, 0.3, 0.05, 0.2, 0.1]:
        assert cm.update_eval(v) is False
        assert cm.watchdog_alert() is None  # not enough evidence yet
    assert cm.update_eval(0.25) is False
    alert = cm.watchdog_alert()
    assert alert is not None and "unreachable" in alert
    # one eval demonstrating half the threshold clears the alert (the gate
    # is merely slow, not unreachable)
    cm.update_eval(0.45)
    assert cm.watchdog_alert() is None
    # promotion resets the counters: fresh stage, fresh evidence
    cm.advance_stage()
    assert cm.evals_in_stage == 0 and cm.stage_eval_max == 0.0
    assert cm.watchdog_alert() is None


def test_curriculum_max_stage_steps_forces_promotion():
    """Opt-in bounded stage budget: when a stage consumes max_stage_steps
    env steps without clearing its gate, the next eval force-promotes (and
    records it as forced) rather than burning the rest of the campaign."""
    import dataclasses

    cfg = FrameworkConfig()
    cfg.curriculum = dataclasses.replace(
        cfg.curriculum, max_stage_steps=1_000_000, min_stage_steps=0
    )
    cfg.curriculum.stages[0].success_threshold = 0.99  # unreachable
    cm = CurriculumManager(cfg)
    cm.update(episodes_finished=10, success_rate=0.0, env_steps=999_999)
    assert cm.update_eval(0.0) is False  # budget not yet exhausted
    assert cm.stage_idx == 0
    cm.update(episodes_finished=10, success_rate=0.0, env_steps=1)
    assert cm.update_eval(0.0) is True  # forced
    assert cm.stage_idx == 1
    assert cm.history[-1]["forced"] is True
    assert cm.history[-1]["threshold"] == 0.99
    # default (0) disables the budget entirely: never force-promotes
    cfg2 = FrameworkConfig()
    cfg2.curriculum.stages[0].success_threshold = 0.99
    cm2 = CurriculumManager(cfg2)
    cm2.update(episodes_finished=10, success_rate=0.0, env_steps=10**9)
    assert cm2.update_eval(0.0) is False
    assert cm2.stage_idx == 0


def test_curriculum_watchdog_state_resets_on_load():
    cfg = FrameworkConfig()
    cm = CurriculumManager(cfg)
    cm.update_eval(0.1)
    state = cm.state_dict()
    assert state["evals_in_stage"] == 1
    cm2 = CurriculumManager(cfg)
    cm2.load_state_dict(state)
    # watchdog evidence is about the OLD campaign's gate — dropped on load
    assert cm2.evals_in_stage == 0 and cm2.stage_eval_max == 0.0


# ---------------------------------------------------------------- hacking


def test_hacking_detects_impossible_performance():
    det = RewardHackingDetector(window_size=50)
    for _ in range(50):
        det.add_episode(reward=3522.56, success=False, length=1349 % 1000)
    report = det.detect_hacking()
    assert report.indicators["impossible_performance"] == 1.0
    # score is the MEAN of 5 indicators (reference semantics) → 1/5 here
    assert report.score >= 0.2


def test_hacking_clean_training_low_score():
    det = RewardHackingDetector(window_size=50)
    rng = np.random.default_rng(0)
    for i in range(50):
        det.add_episode(
            reward=100 + i * 2 + rng.normal(0, 5),
            success=i > 25,
            length=400,
        )
    report = det.detect_hacking()
    assert not report.is_hacking


def test_hacking_timeout_farming():
    det = RewardHackingDetector(window_size=50)
    for _ in range(50):
        det.add_episode(reward=50.0, success=False, length=980)
    report = det.detect_hacking()
    assert report.indicators["long_episodes_no_success"] == 1.0


# -------------------------------------------------------------- stability


def test_lr_schedules():
    cfg = StabilityConfig()
    for kind in ("linear", "exponential", "cosine", "warmup_cosine", "plateau"):
        import dataclasses

        sched = make_lr_schedule(
            dataclasses.replace(cfg, scheduler_type=kind), 1e-3, 100_000
        )
        v0, v_mid, v_end = (
            float(sched(0)), float(sched(50_000)), float(sched(99_999))
        )
        assert v0 >= 0 and v_mid >= 0 and v_end >= 0
        assert v_end <= 1e-3 + 1e-9
    # warmup starts low
    sched = make_lr_schedule(cfg, 1e-3, 100_000)
    assert float(sched(0)) == pytest.approx(1e-4, rel=0.01)


def test_adaptive_tau_decays():
    cfg = StabilityConfig()
    t0 = float(adaptive_tau(cfg, jnp.int32(0)))
    t1 = float(adaptive_tau(cfg, jnp.int32(10_000)))
    assert t0 == pytest.approx(cfg.tau_max)
    assert cfg.tau_min <= t1 < t0


def test_primacy_reset_mixes_params():
    key = jax.random.PRNGKey(0)
    params = {"w": jnp.ones((64, 64)), "b": jnp.ones(64)}
    initial = {"w": jnp.zeros((64, 64)), "b": jnp.zeros(64)}
    mixed = primacy_reset(params, initial, key, ratio=0.05)
    frac_reset = float(jnp.mean(mixed["w"] == 0.0))
    assert 0.01 < frac_reset < 0.12  # ≈5%


def test_dormant_reinit_revives_dead_units():
    key = jax.random.PRNGKey(0)
    kernel = jax.random.normal(key, (10, 32))
    kernel = kernel.at[:, :8].set(0.0)  # 8 dead units
    params = {"params": {"hidden_0": {"kernel": kernel, "bias": jnp.zeros(32)}}}
    probe = jax.random.normal(jax.random.PRNGKey(1), (64, 10))
    new = reinit_dormant_units(
        None, params, probe, jax.random.PRNGKey(2), threshold=0.01, max_ratio=0.5
    )
    new_kernel = new["params"]["hidden_0"]["kernel"]
    # dead columns got fresh weights, live columns untouched
    assert float(jnp.abs(new_kernel[:, :8]).sum()) > 0.0
    assert np.allclose(new_kernel[:, 8:], kernel[:, 8:])


def test_stability_manager_cadence():
    cfg = StabilityConfig(reset_interval=100, dormant_check_interval=50)
    mgr = TrainingStabilityManager(cfg, total_steps=10_000)
    mgr.register_initial_params({"w": jnp.ones(4)})
    assert not mgr.due_primacy_reset()
    mgr.step(100)
    assert mgr.due_primacy_reset()
    assert not mgr.due_primacy_reset()  # resets its own clock
    assert mgr.due_dormant_check()
    assert mgr.should_stop_training(0.95)
    assert not mgr.should_stop_training(0.5)


# ----------------------------------------------------------- checkpointing


@pytest.mark.integration
def test_checkpoint_roundtrip(tmp_path):
    from tvc_ai_tpu.agents.sac import SACConfig
    from tvc_ai_tpu.env.types import EnvParams
    from tvc_ai_tpu.training import loop as loop_mod
    from tvc_ai_tpu.utils.checkpoint import CheckpointManager

    sac_cfg = SACConfig(hidden_dims=(16, 16), buffer_size=256, batch_size=8,
                        learning_starts=16)
    loop_cfg = loop_mod.TrainLoopConfig(num_envs=4, rollout_steps=4)
    carry = loop_mod.init_carry(
        jax.random.PRNGKey(0), EnvParams(), sac_cfg, loop_cfg
    )
    it = jax.jit(loop_mod.make_train_iteration(sac_cfg, loop_cfg))
    carry, _ = it(carry, EnvParams())

    mngr = CheckpointManager(tmp_path / "ckpt")
    mngr.save(100, carry, {"iteration": 3, "curriculum": {"stage_idx": 1}})
    mngr.wait()
    assert mngr.latest_step() == 100

    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x,
        carry,
    )
    restored, host = mngr.restore(abstract)
    mngr.close()
    assert host["iteration"] == 3
    assert host["curriculum"]["stage_idx"] == 1
    for a, b in zip(jax.tree.leaves(carry), jax.tree.leaves(restored)):
        assert np.allclose(np.asarray(a), np.asarray(b))


# -------------------------------------------------------------------- viz


def test_visualize_from_csv(tmp_path):
    from tvc_ai_tpu.viz.visualize import create_plots

    csv_path = tmp_path / "metrics.csv"
    rows = ["step,mean_episode_return,success_rate,critic_loss,alpha"]
    for i in range(20):
        rows.append(f"{i*100},{50+i},{i/20:.2f},{100-i},{0.2}")
    csv_path.write_text("\n".join(rows))
    artifacts = create_plots(tmp_path, tmp_path / "plots")
    names = {a.name for a in artifacts}
    assert "training_metrics.png" in names
    assert "reward_analysis.png" in names


def test_visualize_no_data(tmp_path):
    from tvc_ai_tpu.viz.visualize import create_plots

    artifacts = create_plots(tmp_path, tmp_path / "plots")
    assert artifacts[0].name == "no_data_report.txt"


# -------------------------------------------------------------------- hpo


def test_hpo_fallback_study(tmp_path):
    from tvc_ai_tpu.tuning.hpo import run_study

    def objective(trial):
        x = trial.suggest_float("x", 0.0, 1.0)
        cat = trial.suggest_categorical("c", [1, 2, 3])
        for step in range(3):
            trial.report(x * 10 + cat, step)
            if trial.should_prune():
                from tvc_ai_tpu.tuning.hpo import Pruned

                raise Pruned()
        return x * 10 + cat

    best, results = run_study(objective, n_trials=10, seed=0, output_dir=tmp_path)
    assert len(results) == 10
    assert best.value == max(r.value for r in results if not r.pruned)
    assert (tmp_path / "trials.csv").exists()
    assert json.loads((tmp_path / "best_params.json").read_text())["params"]


# ---------------------------------------------------------- device manager


def test_device_manager():
    from tvc_ai_tpu.utils.devices import DeviceManager, get_device_manager

    dm = get_device_manager()
    assert dm is get_device_manager()  # singleton
    x = np.ones((4, 4), np.float32)
    dev = dm.to_device(x)
    back = dm.to_numpy(dev)
    assert np.allclose(back, x)
    dm.synchronize()
    info = dm.get_memory_info()
    assert isinstance(info, dict)
    assert dm.device_count() >= 1


def test_config_coerces_yaml_scientific_notation():
    """YAML parses '3e-4' (no dot) as a string; the schema must coerce it."""
    from tvc_ai_tpu.config import build_sac_config, load_config

    cfg = load_config(None, overrides=[
        "algorithms.sac.lr_actor=3e-4",
        "algorithms.sac.learning_starts=1e3",
        "training.early_stopping.enabled=false",
    ])
    assert isinstance(cfg.algorithms.sac.lr_actor, float)
    assert cfg.algorithms.sac.lr_actor == pytest.approx(3e-4)
    assert cfg.algorithms.sac.learning_starts == 1000
    assert cfg.training.early_stopping.enabled is False
    sc = build_sac_config(cfg)
    assert isinstance(sc.lr_actor, float)


def test_curriculum_eval_driven_promotion():
    """Promotion from deterministic-eval success (the reference's signal,
    curriculum_manager.py:248): 3+ evals above threshold advance the stage;
    the eval window clears on promotion so each stage needs fresh evidence."""
    cfg = FrameworkConfig()
    cm = CurriculumManager(cfg)
    stage0 = cm.stage.name
    assert not cm.update_eval(0.95)  # needs >= 3 entries
    assert not cm.update_eval(0.2)
    assert cm.update_eval(0.2)       # window max 0.95 >= 0.7 -> advance
    # (max-gate: oscillating policies demonstrate capability between dips)
    assert cm.stage.name != stage0
    assert len(cm.eval_window) == 0  # cleared on promotion
    # low evals never promote
    for _ in range(10):
        assert not cm.update_eval(0.1)
    # state preserves the stage; the eval window is dropped on load (stale
    # evidence must not promote a resumed run — see test_curriculum_state_roundtrip)
    cm.update_eval(0.5)
    d = cm.state_dict()
    cm2 = CurriculumManager(cfg)
    cm2.load_state_dict(d)
    assert list(cm2.eval_window) == []
    assert cm2.stage.name == cm.stage.name


def test_curriculum_stage_overlays_hard_axes_and_dwell():
    """Stage overlays for thrust/cg/dr_prob (the axes the reference's stage
    schema omits) reach EnvParams, and min_stage_steps gates eval-driven
    promotion until the stage has actually been trained."""
    import dataclasses

    from tvc_ai_tpu.config.build import build_env_params
    from tvc_ai_tpu.config.schema import CurriculumStage

    cfg = FrameworkConfig()
    stage = CurriculumStage(
        name="s", thrust_variation=0.15, cg_offset_max=0.03, dr_prob=0.7
    )
    p = build_env_params(cfg, stage)
    assert float(p.randomization.thrust_variation) == pytest.approx(0.15)
    assert float(p.randomization.cg_offset_max) == pytest.approx(0.03)
    assert float(p.randomization.dr_prob) == pytest.approx(0.7)
    # None fields inherit the base DR config
    stage2 = CurriculumStage(name="s2")
    p2 = build_env_params(cfg, stage2)
    dr = cfg.env.domain_randomization
    assert float(p2.randomization.thrust_variation) == pytest.approx(
        dr.thrust_variation
    )
    assert float(p2.randomization.cg_offset_max) == pytest.approx(dr.cg_offset_max)

    # dwell gate: evals during the dwell are DISCARDED (not appended), so the
    # first post-dwell eval cannot promote on stale pre-dwell evidence
    # (round-2 advisor finding) — promotion needs 3 fresh post-dwell evals
    cfg2 = FrameworkConfig()
    cfg2.curriculum = dataclasses.replace(cfg2.curriculum, min_stage_steps=1000)
    cm = CurriculumManager(cfg2)
    for _ in range(5):
        assert not cm.update_eval(1.0)  # above threshold but no dwell yet
    cm.update(episodes_finished=0, success_rate=0.0, env_steps=1000)
    assert not cm.update_eval(1.0)  # 1 post-dwell eval: fresh window
    assert not cm.update_eval(1.0)  # 2
    assert cm.update_eval(1.0)      # 3 fresh evals -> promotes
    # and the training-rollout promotion path honors the same dwell
    cm2 = CurriculumManager(cfg2)
    for _ in range(30):
        assert not cm2.update(episodes_finished=10, success_rate=1.0)
    assert cm2.update(episodes_finished=10, success_rate=1.0, env_steps=1000)


@pytest.mark.slow
def test_lqr_schedule_matches_single_design_at_nominal():
    """design_lqr_schedule's vectorized fast path (analytic d=0 equilibrium,
    vmapped four-corner Jacobians, implicit-function trim slope) must agree
    with the nested-bisection design_lqr at the nominal (mass, thrust) cell —
    the schedule is the DAgger teacher, so a synthesis divergence would
    silently poison every label."""
    from tvc_ai_tpu.config.build import build_env_params
    from tvc_ai_tpu.training import demos

    params = build_env_params(FrameworkConfig())
    single = demos.design_lqr(params)
    sched = demos.design_lqr_schedule(params, n_mass=3, n_tscale=3)
    at = demos.interp_design(
        sched, jnp.float32(params.rocket.mass), jnp.float32(1.0)
    )
    for name in ("gain", "gain_pitch"):
        a = np.asarray(getattr(single, name))
        b = np.asarray(getattr(at, name))
        rel = np.max(np.abs(a - b) / (np.abs(a) + 1e-3))
        assert rel < 1e-3, (name, a, b)
    assert float(at.z_eq) == pytest.approx(float(single.z_eq), abs=1e-5)
    assert float(at.trim_slope) == pytest.approx(
        float(single.trim_slope), rel=2e-2
    )
    # interpolation at a non-grid point stays between the bracketing cells
    import jax.numpy as _jnp

    mid_mass = 0.5 * (sched.mass_grid[0] + sched.mass_grid[1])
    mid = demos.interp_design(sched, mid_mass, _jnp.float32(1.0))
    lo = demos.interp_design(sched, sched.mass_grid[0], _jnp.float32(1.0))
    hi = demos.interp_design(sched, sched.mass_grid[1], _jnp.float32(1.0))
    g_mid, g_lo, g_hi = (
        np.asarray(mid.gain), np.asarray(lo.gain), np.asarray(hi.gain)
    )
    assert np.all(g_mid >= np.minimum(g_lo, g_hi) - 1e-6)
    assert np.all(g_mid <= np.maximum(g_lo, g_hi) + 1e-6)


def test_dagger_iteration_reduces_bc_loss():
    """One tiny DAgger iteration on CPU: the fused collect+train program
    compiles, fills the ring dataset, and the regression loss drops — the
    r4 distillation hot path (training/dagger.py)."""
    import optax

    from tvc_ai_tpu.agents import sac as sac_mod
    from tvc_ai_tpu.config.build import build_env_params
    from tvc_ai_tpu.env.types import obs_dim as obs_dim_of
    from tvc_ai_tpu.training import dagger, demos

    cfg = FrameworkConfig()
    cfg.env.drift_observation.enabled = True
    cfg.env.action_observation.enabled = True
    params = build_env_params(cfg)
    obs_dim = obs_dim_of(params)
    assert obs_dim == 16  # 10 + 4 drift + 2 prev-action

    design = demos.design_lqr(params)
    rp = params.rocket

    def teacher_fn(env_states):
        return demos.lqr_action(
            env_states.body,
            design,
            jnp.zeros_like(env_states.dr.cg_offset),
            rp,
        )

    sac_cfg = sac_mod.SACConfig(hidden_dims=(32, 32))
    dcfg = dagger.DaggerConfig(
        num_envs=8,
        rollout_steps=16,
        capacity=8 * 16 * 2,
        batch_size=32,
        train_steps=40,
        history_len=2,
    )
    key = jax.random.PRNGKey(0)
    k_init, k_env, k_it = jax.random.split(key, 3)
    template = sac_mod.init(k_init, obs_dim * 2, 2, sac_cfg)
    opt = optax.adam(dcfg.lr)
    state = dagger.init_state(
        k_env, params, template.actor_params, opt, dcfg, obs_dim, 2
    )
    it = dagger.make_dagger_iteration(
        params, teacher_fn, sac_cfg, dcfg, obs_dim, 2
    )
    state, m = it(state, k_it, jnp.float32(1.0))
    assert int(state.size) == 8 * 16
    assert np.isfinite(float(m["bc_loss_first"]))
    assert float(m["bc_loss_last"]) < float(m["bc_loss_first"])
    # ring wrap: a second iteration fills to capacity, pointer returns to 0
    state, m2 = it(state, jax.random.PRNGKey(9), jnp.float32(0.5))
    assert int(state.size) == dcfg.capacity
    assert int(state.ptr) == 0


@pytest.mark.slow
def test_interp_design_degenerate_axis():
    """mass_variation=0 collapses the schedule's mass grid to one point;
    interpolation must pin to it instead of dividing by the zero extent
    (r4: NaN gains silently zeroed a whole ablation)."""
    from tvc_ai_tpu.config.build import build_env_params
    from tvc_ai_tpu.training import demos

    cfg = FrameworkConfig()
    cfg.env.domain_randomization.enabled = True
    cfg.env.domain_randomization.mass_variation = 0.0
    cfg.env.domain_randomization.thrust_variation = 0.0
    params = build_env_params(cfg)
    sched = demos.design_lqr_schedule(
        params, n_mass=3, n_tscale=3, verify=False
    )
    at = demos.interp_design(
        sched, jnp.float32(params.rocket.mass), jnp.float32(1.0)
    )
    assert np.all(np.isfinite(np.asarray(at.gain)))
    assert np.all(np.isfinite(np.asarray(at.gain_pitch)))
    single = demos.design_lqr(params)
    rel = np.max(
        np.abs(np.asarray(at.gain) - np.asarray(single.gain))
        / (np.abs(np.asarray(single.gain)) + 1e-3)
    )
    assert rel < 1e-3


def test_dlqr_divergence_returns_zero_gain():
    """Unstabilizable plants must yield a zero gain, not overflow — the
    empirical schedule verification then scores the cell 0 and fills it
    from the nearest stabilizable cell."""
    from tvc_ai_tpu.training.demos import _dlqr

    k = _dlqr(
        np.diag([2.0, 1.5]),
        np.zeros((2, 1)),
        np.eye(2),
        np.eye(1),
    )
    assert np.all(k == 0.0)


@pytest.mark.slow
def test_cem_refines_controller_score():
    """training/cem.py: theta packing round-trips the design, the rollout
    score is finite, and a few CEM generations do not regress the best
    score (elitist best-ever tracking)."""
    from tvc_ai_tpu.config.build import build_env_params
    from tvc_ai_tpu.env import rocket_env
    from tvc_ai_tpu.training import cem, demos

    cfg = FrameworkConfig()
    cfg.env.domain_randomization.enabled = True
    params = build_env_params(cfg)
    sched = demos.design_lqr_schedule(
        params, n_mass=3, n_tscale=3, verify=False
    )
    n = 4
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    states, _ = jax.vmap(rocket_env.reset, in_axes=(0, None))(keys, params)
    theta0 = cem.theta_for_states(sched, states)
    assert theta0.shape == (n, cem.THETA_DIM)
    ccfg = cem.CEMConfig(pop=6, elites=2, generations=2, horizon=60)
    base = cem.rollout_score(theta0, states, params, ccfg)
    assert np.all(np.isfinite(np.asarray(base)))
    theta, score = jax.jit(
        lambda k, s, t: cem.refine_per_draw(k, params, s, t, ccfg)
    )(jax.random.PRNGKey(1), states, theta0)
    assert theta.shape == theta0.shape
    assert np.all(np.asarray(score) >= np.asarray(base) - 1e-4)


@pytest.mark.slow
def test_cem_dagger_iteration_masks_unsolved_draws():
    """CEM-teacher DAgger: the fused iteration compiles, rows from draws
    the teacher failed carry weight 0, and the weighted BC loss is finite
    (zero when nothing is labeled)."""
    import optax

    from tvc_ai_tpu.agents import sac as sac_mod
    from tvc_ai_tpu.config.build import build_env_params
    from tvc_ai_tpu.env.types import obs_dim as obs_dim_of
    from tvc_ai_tpu.training import cem, dagger, demos

    cfg = FrameworkConfig()
    cfg.env.drift_observation.enabled = True
    cfg.env.action_observation.enabled = True
    cfg.env.domain_randomization.enabled = True
    params = build_env_params(cfg)
    obs_dim = obs_dim_of(params)
    sched = demos.design_lqr_schedule(
        params, n_mass=3, n_tscale=3, verify=False
    )
    sac_cfg = sac_mod.SACConfig(hidden_dims=(32, 32))
    dcfg = dagger.DaggerConfig(
        num_envs=8,
        rollout_steps=16,
        capacity=8 * 16 * 2,
        batch_size=32,
        train_steps=10,
        history_len=2,
    )
    # horizon 60 < the 100-step success window: no draw can be "solved",
    # so every recorded row must carry weight 0 — the mask gate
    ccfg = cem.CEMConfig(pop=4, elites=2, generations=1, horizon=60)
    template = sac_mod.init(jax.random.PRNGKey(0), obs_dim * 2, 2, sac_cfg)
    opt = optax.adam(dcfg.lr)
    state = dagger.init_cem_state(template.actor_params, opt, dcfg, obs_dim, 2)
    it = dagger.make_cem_dagger_iteration(
        params, sched, sac_cfg, dcfg, obs_dim, 2, ccfg
    )
    state, m = it(state, jax.random.PRNGKey(1), jnp.float32(1.0))
    assert int(state.size) == 8 * 16
    assert float(m["teacher_solved"]) == 0.0
    assert float(m["labeled_rows"]) == 0.0
    assert float(m["bc_loss_first"]) == 0.0


def test_theta_student_mask_pack_roundtrip():
    """student_view_mask/pack/unpack: the 10 student components survive the
    round trip and the masked components (dz/vz columns + z_eq, which the
    observation cannot express) come back exactly zero."""
    from tvc_ai_tpu.training import cem, theta_student as ts

    full = jnp.arange(1.0, cem.THETA_DIM + 1.0)
    masked = full * ts.student_view_mask()
    # the mask zeroes exactly the non-student components
    assert np.all(np.asarray(masked)[[1, 4, 7, 10, 14]] == 0.0)
    t10 = ts.pack_student_theta(full)
    assert t10.shape == (ts.STUDENT_THETA_DIM,)
    back = ts.unpack_student_theta(t10)
    assert np.allclose(np.asarray(back), np.asarray(masked))
    # batched shapes preserved
    batch = jnp.tile(full[None], (5, 1))
    assert ts.pack_student_theta(batch).shape == (5, 10)
    assert ts.unpack_student_theta(ts.pack_student_theta(batch)).shape == (
        5,
        cem.THETA_DIM,
    )


def test_theta_hat_action_mirrors_privileged_controller():
    """theta_hat_action (obs-only, deployable) must equal
    cem.controller_action (privileged true state) for any θ whose masked
    components are zero, when the frame presents the true state — the
    structural claim the θ-student rests on. The env's own observation
    presents one-step-LAGGED IMU readings (reference-parity phase lag,
    SURVEY §2.1), so the frame here is synthesized from the body state
    per the documented layout — the test pins the index layout, the
    drift-channel scales, and the sign conventions of the mirror."""
    from tvc_ai_tpu.config.build import build_env_params
    from tvc_ai_tpu.env import rocket_env
    from tvc_ai_tpu.env.types import obs_dim as obs_dim_of
    from tvc_ai_tpu.training import cem, theta_student as ts

    cfg = FrameworkConfig()
    cfg.env.drift_observation.enabled = True
    cfg.env.action_observation.enabled = True
    cfg.env.domain_randomization.enabled = False
    params = build_env_params(cfg)
    assert obs_dim_of(params) == 16
    n = 16
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    states, _ = jax.vmap(rocket_env.reset, in_axes=(0, None))(keys, params)
    # step a few times under a mild fixed gimbal so position/velocity/
    # tilt/omega are all nonzero
    for _ in range(4):
        action = jnp.tile(jnp.array([[0.08, -0.05]]), (n, 1))
        states, out, _ = rocket_env.batched_step_autoreset(
            states, action, params, use_pallas=False
        )
        assert not bool(jnp.any(out.terminated | out.truncated))
    body = states.body
    frame = jnp.concatenate(
        [
            body.quat,
            body.omega,
            jnp.zeros((n, 3), jnp.float32),  # fuel/phase/progress (unused)
            body.vel[:, :2] * params.drift_obs_vel_scale,
            body.pos[:, :2] * params.drift_obs_pos_scale,
            jnp.zeros((n, 2), jnp.float32),  # prev action (unused)
        ],
        axis=-1,
    )
    rng = np.random.default_rng(0)
    theta10 = jnp.asarray(rng.normal(0.0, 0.5, (n, 10)), jnp.float32)
    full = ts.unpack_student_theta(theta10)
    privileged = cem.controller_action(full, body, params.rocket)
    blind = ts.theta_hat_action(theta10, frame, params)
    assert np.allclose(np.asarray(blind), np.asarray(privileged), atol=1e-5)
    # and through the REAL observation the only discrepancy is the one-step
    # IMU lag: actions still agree to the lag scale (noiseless env)
    _, _, obs = rocket_env.batched_step_autoreset(
        states,
        jnp.zeros((n, 2), jnp.float32),
        params,
        use_pallas=False,
    )
    blind_env = ts.theta_hat_action(theta10, obs, params)
    assert np.asarray(jnp.abs(blind_env - blind)).max() < 0.2


@pytest.mark.slow
def test_theta_dagger_iteration_and_policy_fn():
    """One tiny θ-DAgger iteration: ring labels are the episode-constant θ
    (identical across the rollout axis per env), weights respect the
    solved mask, the loss is finite, and the deployable policy_fn equals
    theta_hat_action on the newest frame."""
    import optax

    from tvc_ai_tpu.config.build import build_env_params
    from tvc_ai_tpu.env.types import obs_dim as obs_dim_of
    from tvc_ai_tpu.training import cem, demos, theta_student as ts

    cfg = FrameworkConfig()
    cfg.env.drift_observation.enabled = True
    cfg.env.action_observation.enabled = True
    cfg.env.domain_randomization.enabled = True
    params = build_env_params(cfg)
    obs_dim = obs_dim_of(params)
    sched = demos.design_lqr_schedule(params, n_mass=3, n_tscale=3, verify=False)
    tcfg = ts.ThetaDaggerConfig(
        num_envs=8,
        rollout_steps=16,
        capacity=8 * 16 * 2,
        batch_size=32,
        train_steps=10,
        history_len=2,
        hidden_dims=(32, 32),
    )
    ccfg = cem.CEMConfig(pop=4, elites=2, generations=1, horizon=60)
    opt = optax.adam(tcfg.lr)
    state = ts.init_theta_state(jax.random.PRNGKey(0), opt, tcfg, obs_dim)
    assert state.data_obs.shape == (tcfg.capacity, obs_dim * 2)
    assert state.data_theta.shape == (tcfg.capacity, ts.STUDENT_THETA_DIM)
    it = ts.make_theta_dagger_iteration(params, sched, tcfg, obs_dim, ccfg)
    state, m = it(state, jax.random.PRNGKey(1), jnp.float32(1.0))
    n_rows = tcfg.num_envs * tcfg.rollout_steps
    assert int(state.size) == n_rows
    # θ-target construction: each env's rows share ONE constant label
    labels = np.asarray(state.data_theta[:n_rows]).reshape(
        tcfg.rollout_steps, tcfg.num_envs, ts.STUDENT_THETA_DIM
    )
    assert np.allclose(labels, labels[0][None], atol=0.0)
    # horizon 60 < the success window → no draw solvable → zero weights
    assert float(m["teacher_solved"]) == 0.0
    assert float(m["labeled_rows"]) == 0.0
    assert np.isfinite(float(m["theta_loss_first"]))
    # deployable policy: equals theta_hat_action on the newest frame
    policy_fn = ts.make_theta_policy_fn(params, tcfg)
    view = state.data_obs[:4]
    net = ts.ThetaNet(hidden_dims=tcfg.hidden_dims)
    theta_hat = net.apply(state.net_params, view)
    expect = ts.theta_hat_action(theta_hat, view[:, obs_dim:], params)
    got = policy_fn(state.net_params, view, jax.random.PRNGKey(2))
    assert np.allclose(np.asarray(got), np.asarray(expect), atol=1e-6)
    assert np.all(np.abs(np.asarray(got)) <= 1.0)


def test_theta_scale_positive_and_finite():
    from tvc_ai_tpu.config.build import build_env_params
    from tvc_ai_tpu.training import demos, theta_student as ts

    cfg = FrameworkConfig()
    cfg.env.domain_randomization.enabled = True
    params = build_env_params(cfg)
    sched = demos.design_lqr_schedule(params, n_mass=3, n_tscale=3, verify=False)
    s = np.asarray(ts.theta_scale(sched))
    assert s.shape == (ts.STUDENT_THETA_DIM,)
    assert np.all(np.isfinite(s)) and np.all(s >= 0.05)


@pytest.mark.slow
def test_dagger_beta_mixing_controls_rollout():
    """β-mixing: the recorded ring LABELS are always the teacher's, but the
    visited-state distribution differs between β=1 (teacher drives) and
    β=0 (student drives) — the defining DAgger property."""
    import optax

    from tvc_ai_tpu.agents import sac as sac_mod
    from tvc_ai_tpu.config.build import build_env_params
    from tvc_ai_tpu.env.types import obs_dim as obs_dim_of
    from tvc_ai_tpu.training import dagger, demos

    cfg = FrameworkConfig()
    params = build_env_params(cfg)
    obs_dim = obs_dim_of(params)
    design = demos.design_lqr(params)
    rp = params.rocket

    def teacher_fn(env_states):
        return demos.lqr_action(
            env_states.body,
            design,
            jnp.zeros_like(env_states.dr.cg_offset),
            rp,
        )

    sac_cfg = sac_mod.SACConfig(hidden_dims=(16, 16))
    dcfg = dagger.DaggerConfig(
        num_envs=4, rollout_steps=8, capacity=64, batch_size=16,
        train_steps=2, history_len=1,
    )
    template = sac_mod.init(jax.random.PRNGKey(0), obs_dim, 2, sac_cfg)
    opt = optax.adam(dcfg.lr)
    it = dagger.make_dagger_iteration(
        params, teacher_fn, sac_cfg, dcfg, obs_dim, 2
    )

    def run(beta):
        state = dagger.init_state(
            jax.random.PRNGKey(3), params, template.actor_params, opt,
            dcfg, obs_dim, 2,
        )
        state, _ = it(state, jax.random.PRNGKey(4), jnp.float32(beta))
        return state

    s1, s0 = run(1.0), run(0.0)
    n = dcfg.num_envs * dcfg.rollout_steps
    # same reset, same PRNG: the first step's views coincide, later ones
    # diverge because different actions drove the env
    assert np.allclose(
        np.asarray(s1.data_obs[: dcfg.num_envs]),
        np.asarray(s0.data_obs[: dcfg.num_envs]),
    )
    assert not np.allclose(
        np.asarray(s1.data_obs[:n]), np.asarray(s0.data_obs[:n])
    )
    # labels live on each run's own visited states: recompute the teacher
    # label from the stored view's state-free check — instead verify the
    # β=1 run's labels match what the teacher produces along ITS rollout
    # by construction (finite, in [-1, 1])
    assert np.all(np.abs(np.asarray(s1.data_act[:n])) <= 1.0)


@pytest.mark.slow
def test_cem_theta_mask_and_anchor():
    """refine_per_draw with theta_mask keeps masked components exactly
    zero in every candidate (the student-view-constrained oracle of
    scripts/suite_feasibility.py --student_view), and anchor_weight>0
    produces finite scores with the penalty applied."""
    from tvc_ai_tpu.config.build import build_env_params
    from tvc_ai_tpu.env import rocket_env
    from tvc_ai_tpu.training import cem, demos

    cfg = FrameworkConfig()
    cfg.env.domain_randomization.enabled = True
    params = build_env_params(cfg)
    sched = demos.design_lqr_schedule(
        params, n_mass=3, n_tscale=3, verify=False
    )
    n = 4
    keys = jax.random.split(jax.random.PRNGKey(2), n)
    states, _ = jax.vmap(rocket_env.reset, in_axes=(0, None))(keys, params)
    theta0 = cem.theta_for_states(sched, states)
    mask = jnp.ones((cem.THETA_DIM,), jnp.float32)
    mask = mask.at[jnp.array([1, 4, 7, 10, 14])].set(0.0)
    ccfg = cem.CEMConfig(
        pop=6, elites=2, generations=2, horizon=60, anchor_weight=0.5
    )
    theta, score = jax.jit(
        lambda k, s, t: cem.refine_per_draw(
            k, params, s, t, ccfg, theta_mask=mask
        )
    )(jax.random.PRNGKey(3), states, theta0)
    assert np.all(np.isfinite(np.asarray(score)))
    masked_cols = np.asarray(theta)[:, [1, 4, 7, 10, 14]]
    assert np.all(masked_cols == 0.0)
