"""PyBullet trajectory parity gate (BASELINE config #1).

Two execution modes, both driven by the packaged harness
(``tvc_ai_tpu/eval/pybullet_parity.py``):

- LIVE: wherever ``import pybullet`` works, every scenario is simulated
  fresh in PyBullet (reference-identical scene,
  env/enhanced_rocket_tvc_env.py:324-585) and compared to the JAX
  integrator.
- REPLAY: wherever a recorded golden fixture exists
  (``tests/fixtures/pybullet_goldens.npz``, emitted by
  ``python scripts/pybullet_goldens.py record`` on a pybullet-equipped
  machine), the JAX integrator is checked against the recorded
  trajectories — no pybullet needed, runs offline forever.

PyBullet is NOT installable in the CI image (no network; SURVEY notes it as
third-party C++), so LIVE skips there; REPLAY skips only until a fixture is
recorded once. Contact-phase parity is intentionally excluded (penalty
contact vs LCP solver differ by design, documented in physics/types.py).
"""

import pytest

from tvc_ai_tpu.eval import pybullet_parity as pp


@pytest.mark.parametrize("scenario", pp.SCENARIOS, ids=lambda s: s.name)
@pytest.mark.skipif(not pp.has_pybullet(), reason="pybullet not installed")
def test_live_parity(scenario):
    actions = scenario.actions()
    result = pp.compare_trajectories(
        pp.jax_trajectory(actions),
        pp.pybullet_trajectory(actions),
        scenario.pos_tol,
        scenario.quat_dot_min,
    )
    assert result["passed"], result


@pytest.mark.skipif(
    not pp.DEFAULT_FIXTURE.exists(),
    reason=(
        "no recorded golden fixture — run "
        "`python scripts/pybullet_goldens.py record` on a pybullet machine "
        "and check in tests/fixtures/pybullet_goldens.npz"
    ),
)
def test_golden_replay():
    report = pp.check_goldens()
    assert report["passed"], report


def test_fixture_roundtrip(tmp_path):
    """The record→check plumbing itself (fixture format, scenario replay,
    tolerance logic) is testable WITHOUT pybullet by recording the JAX
    integrator's own trajectories as the 'golden' side — self-parity must
    pass exactly, and a perturbed fixture must fail."""
    import numpy as np

    path = tmp_path / "goldens.npz"
    payload = {
        "fixture_version": np.int64(pp.FIXTURE_VERSION),
        "start_pos": np.asarray(pp.START_POS),
        "scenarios": np.asarray([s.name for s in pp.SCENARIOS[:2]]),
    }
    for sc in pp.SCENARIOS[:2]:
        actions = sc.actions()
        payload[f"{sc.name}/actions"] = actions
        payload[f"{sc.name}/trajectory"] = pp.jax_trajectory(actions)
        payload[f"{sc.name}/pos_tol"] = np.float64(sc.pos_tol)
        payload[f"{sc.name}/quat_dot_min"] = np.float64(sc.quat_dot_min)
    np.savez_compressed(path, **payload)

    report = pp.check_goldens(path)
    assert report["passed"], report
    for result in report["scenarios"].values():
        assert result["max_pos_err_m"] == 0.0

    # a corrupted golden must be caught
    bad = dict(payload)
    name = pp.SCENARIOS[0].name
    bad[f"{name}/trajectory"] = payload[f"{name}/trajectory"] + 1.0
    np.savez_compressed(path, **bad)
    assert not pp.check_goldens(path)["passed"]
