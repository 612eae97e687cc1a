#!/usr/bin/env python
"""Export a trained actor to int8 TFLite-Micro artifacts.

Reference-compatible CLI (scripts/export_tflm.py:548-566): --model_path
--output_dir --optimization --validate --benchmark --generate_c_array.
Accepts checkpoints from the legacy ``SACAgent.save`` msgpack format or an
orbax training checkpoint directory.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_actor_params(model_path: str, obs_dim: int, action_dim: int, hidden):
    """Actor params from msgpack (legacy SACAgent.save) or orbax dir."""
    from flax import serialization

    path = Path(model_path)
    if path.is_file():
        payload = serialization.msgpack_restore(path.read_bytes())
        state = payload["state"] if "state" in payload else payload
        # legacy SACAgent payload: state -> actor_params
        actor = state.get("actor_params", state)
        return {"params": actor["params"]} if "params" in actor else {"params": actor}
    # orbax checkpoint dir from the trainer — reuse the eval loader (handles
    # cross-device restores and optimizer-state structure)
    from tvc_ai_tpu.agents import sac as sac_mod
    from tvc_ai_tpu.eval.evaluate import load_agent_state

    cfg = sac_mod.SACConfig(hidden_dims=tuple(hidden))
    state = load_agent_state(path, obs_dim, action_dim, cfg)
    return state.actor_params


def main() -> int:
    parser = argparse.ArgumentParser(description="TFLM int8 export")
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="export_output")
    parser.add_argument(
        "--optimization", choices=["none", "default", "aggressive"],
        default="default",
    )
    parser.add_argument("--obs_dim", type=int, default=8)
    parser.add_argument("--action_dim", type=int, default=2)
    parser.add_argument("--hidden", type=int, nargs="*", default=[256, 256])
    parser.add_argument("--validate", action="store_true")
    parser.add_argument("--benchmark", action="store_true")
    parser.add_argument("--generate_c_array", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tvc_ai_tpu.env.wrappers import RocketConfig
    from tvc_ai_tpu.export.c_array import generate_c_array, generate_tflm_example
    from tvc_ai_tpu.export.tflite import export_actor

    actor_params = load_actor_params(
        args.model_path, args.obs_dim, args.action_dim, args.hidden
    )
    env_params = RocketConfig().to_env_params(
        domain_randomization=False, sensor_noise=False, max_episode_steps=1000
    )
    result = export_actor(
        actor_params,
        obs_dim=args.obs_dim,
        env_params=env_params,
        output_dir=args.output_dir,
        optimization=args.optimization,
    )
    print(f"tflite: {result.tflite_path} ({result.size_bytes} bytes)")
    print(
        f"int8 parity: max |Δa| = {result.max_action_diff:.4f} "
        f"(threshold 0.1), mean = {result.mean_action_diff:.4f}"
    )
    print(f"host latency: {result.latency_us:.1f} µs/inference")
    if result.max_action_diff > 0.1:
        print("WARNING: parity above the 0.1 export threshold")

    if args.generate_c_array:
        cc, h = generate_c_array(
            result.tflite_path.read_bytes(), args.output_dir
        )
        example = generate_tflm_example(
            args.output_dir, obs_dim=args.obs_dim, action_dim=args.action_dim
        )
        print(f"C artifacts: {cc}, {h}, {example}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
