#!/usr/bin/env python
"""Render training plots from a run directory (CSV or TensorBoard events).

Reference CLI: scripts/visualize.py --log-dir --output-dir.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser(description="TVC-AI-TPU visualization")
    parser.add_argument("--log-dir", type=str, required=True)
    parser.add_argument("--output-dir", type=str, default=None)
    args = parser.parse_args()

    from tvc_ai_tpu.viz.visualize import create_plots

    out = args.output_dir or str(Path(args.log_dir) / "plots")
    artifacts = create_plots(args.log_dir, out)
    for a in artifacts:
        print(a)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
