#!/usr/bin/env python
"""Test-suite runner with named selections (ref tests/run_tests.py:25-65).

    python tests/run_tests.py unit          # env + physics + agent units
    python tests/run_tests.py integration   # -m integration
    python tests/run_tests.py fast          # -m "not slow"
    python tests/run_tests.py benchmark     # the performance script
    python tests/run_tests.py all           # everything
    ... add --cov for coverage (needs pytest-cov)
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent

SELECTIONS = {
    "unit": [
        str(HERE / "test_quaternion.py"), str(HERE / "test_physics.py"),
        str(HERE / "test_env.py"), str(HERE / "test_reward.py"),
        str(HERE / "test_sac.py"), str(HERE / "test_models.py"),
    ],
    "integration": [str(HERE), "-m", "integration"],
    "fast": [str(HERE), "-m", "not slow"],
    "all": [str(HERE)],
}


def main() -> int:
    args = sys.argv[1:]
    selection = args[0] if args and not args[0].startswith("-") else "fast"
    extra = args[1:] if args and not args[0].startswith("-") else args
    if selection == "benchmark":
        return subprocess.call([sys.executable, str(HERE / "benchmark.py")])
    if selection not in SELECTIONS:
        print(f"unknown selection {selection!r}; choose from "
              f"{list(SELECTIONS) + ['benchmark']}")
        return 2
    cmd = [sys.executable, "-m", "pytest", "-q", *SELECTIONS[selection]]
    if "--cov" in extra:
        extra = [a for a in extra if a != "--cov"]
        cmd += ["--cov=tvc_ai_tpu", "--cov-report=term-missing"]
    cmd += extra
    print(" ".join(cmd))
    return subprocess.call(cmd)


if __name__ == "__main__":
    raise SystemExit(main())
