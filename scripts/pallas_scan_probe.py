#!/usr/bin/env python
"""Probe: does the Pallas SoA kernel compile & run under lax.scan here?

Round-2 finding (ops/pallas_step.py docstring): wrapping ``step_pallas`` in
``lax.scan`` hung at Mosaic compile time in this environment, so the fused
training loop uses the XLA integrator path. VERDICT r2 item 3 asks to either
land the kernel in the fused loop or retire it with data. This probe:

1. compiles scan(step_pallas) with a short trip count under a watchdog;
2. if it compiles, times it against scan(vmap(integrator.step)) at 4096 envs;
3. prints one JSON verdict line.

Run on the real TPU: `timeout 600 python scripts/pallas_scan_probe.py`
(the timeout IS the watchdog — a hang means the Mosaic-under-scan bug is
still present; document and keep the XLA path).
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tvc_ai_tpu.ops import pallas_step as ps
from tvc_ai_tpu.physics.integrator import ThrustControl
from tvc_ai_tpu.physics.integrator import step as xla_step
from tvc_ai_tpu.physics.types import RigidBodyState, RocketParams

N = 4096
T = 64
CALLS = 8


def make_inputs():
    params = RocketParams()
    body = RigidBodyState(
        pos=jnp.zeros((N, 3)) .at[:, 2].set(1.0),
        quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (N, 1)),
        vel=jnp.zeros((N, 3)),
        omega=jnp.zeros((N, 3)),
    )
    mass = jnp.full((N,), 2.0)
    thrust_scale = jnp.ones((N,))
    cg = jnp.zeros((N, 3))
    wind = jnp.zeros((N, 3))
    return params, body, mass, thrust_scale, cg, wind


def scan_pallas(params, body, mass, thrust_scale, cg, wind):
    def one(carry, _):
        b, key = carry
        key, k = jax.random.split(key)
        g = jax.random.uniform(k, (N, 2), minval=-0.3, maxval=0.3)
        b = ps.step_pallas(
            b,
            ThrustControl(gimbal=g, thrust_active=jnp.ones(N, bool)),
            params, mass, thrust_scale, cg, wind,
        )
        return (b, key), b.pos[:, 2].mean()

    @partial(jax.jit, donate_argnums=(0,))
    def run(b, key):
        (b, key), alt = jax.lax.scan(one, (b, key), None, length=T)
        return b, key, alt.mean()

    return run


def scan_xla(params, body, mass, thrust_scale, cg, wind):
    vstep = jax.vmap(
        lambda b, g, m, ts, c, w: xla_step(
            b, ThrustControl(gimbal=g, thrust_active=jnp.bool_(True)),
            params, mass=m, thrust_scale=ts, cg_offset=c, wind=w,
        ),
        in_axes=(0, 0, 0, 0, 0, 0),
    )

    def one(carry, _):
        b, key = carry
        key, k = jax.random.split(key)
        g = jax.random.uniform(k, (N, 2), minval=-0.3, maxval=0.3)
        b = vstep(b, g, mass, thrust_scale, cg, wind)
        return (b, key), b.pos[:, 2].mean()

    @partial(jax.jit, donate_argnums=(0,))
    def run(b, key):
        (b, key), alt = jax.lax.scan(one, (b, key), None, length=T)
        return b, key, alt.mean()

    return run


def timed(run, body):
    b, key, r = run(body, jax.random.PRNGKey(0))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(CALLS):
        b, key, r = run(b, key)
    jax.block_until_ready(r)
    return N * T * CALLS / (time.perf_counter() - t0)


def main():
    params, body, mass, ts, cg, wind = make_inputs()
    print("compiling scan(pallas)...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    run_p = scan_pallas(params, body, mass, ts, cg, wind)
    rate_p = timed(run_p, body)
    compile_s = time.perf_counter() - t0
    print(f"pallas-under-scan OK ({compile_s:.0f}s incl compile): "
          f"{rate_p/1e6:.1f}M steps/s", file=sys.stderr)

    _, body2, *_ = make_inputs()
    run_x = scan_xla(params, body2, mass, ts, cg, wind)
    rate_x = timed(run_x, body2)
    print(f"xla-under-scan: {rate_x/1e6:.1f}M steps/s", file=sys.stderr)
    print(json.dumps({
        "pallas_scan_steps_per_sec": round(rate_p, 1),
        "xla_scan_steps_per_sec": round(rate_x, 1),
        "pallas_wins": rate_p > rate_x,
    }))


if __name__ == "__main__":
    main()
