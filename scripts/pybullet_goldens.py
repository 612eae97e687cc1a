#!/usr/bin/env python
"""One-command PyBullet parity gate (BASELINE gate #1).

On any machine with pybullet installed::

    python scripts/pybullet_goldens.py record    # writes the golden fixture
    python scripts/pybullet_goldens.py check     # JAX-vs-golden pass/fail

``record`` needs pybullet; ``check`` runs anywhere (this repo's CI image
included) once a fixture exists — goldens are replayed offline forever
after. Copy the emitted ``tests/fixtures/pybullet_goldens.npz`` back into
the repo to arm ``tests/test_pybullet_parity.py::test_golden_replay``.
"""

from __future__ import annotations

import argparse
import json
import sys

from tvc_ai_tpu.eval import pybullet_parity as pp


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("command", choices=["record", "check", "both"])
    parser.add_argument(
        "--fixture", default=str(pp.DEFAULT_FIXTURE), help="fixture .npz path"
    )
    args = parser.parse_args()

    if args.command in ("record", "both"):
        path = pp.record_goldens(args.fixture)
        print(f"recorded {len(pp.SCENARIOS)} golden scenarios -> {path}")
    if args.command in ("check", "both"):
        report = pp.check_goldens(args.fixture)
        print(json.dumps(report, indent=2))
        if not report["passed"]:
            print("PARITY FAIL", file=sys.stderr)
            return 1
        print("PARITY PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
