"""Console-script entry points (pyproject [project.scripts]).

Thin wrappers so an installed package exposes the same CLIs as the repo's
``scripts/`` directory.
"""

from __future__ import annotations

import runpy
import sys
from pathlib import Path

_SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"


def _run(script: str) -> int:
    path = _SCRIPTS / script
    if path.exists():
        runpy.run_path(str(path), run_name="__main__")
        return 0
    print(f"script {script} not found at {path}", file=sys.stderr)
    return 1


def train_main() -> int:
    return _run("train.py")


def evaluate_main() -> int:
    return _run("evaluate.py")


def export_main() -> int:
    return _run("export_tflm.py")
