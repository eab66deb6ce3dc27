"""Window-length ladder for the semseg bench's measurement windows.

Companion of tools/window_ladder_detection.py (see its docstring): one
compiled headline stepper, interleaved fenced windows of the requested
lengths — isolates the fixed per-window fence RPC from true device
throughput.  r5 history: 60/150/300-frame windows read 262.6/291.4/300.0
on the same program; this probe checks whether 300 is the plateau.

Usage:  python tools/window_ladder_semseg.py --lengths 300,600,900
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--target", type=float, default=0.5)
    ap.add_argument("--lengths", type=str, default="300,600,900")
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args()
    lengths = [int(x) for x in args.lengths.split(",")]

    from blockcopy_tpu.core.stepper import FixedCapacityStepper, StepperConfig
    from blockcopy_tpu.models.swiftnet import (
        SwiftNetConfig, init_swiftnet, make_apply_fn,
    )

    dtype = jnp.bfloat16
    frame_shape = (1, args.height, args.width, 3)
    gh, gw = args.height // 128, args.width // 128
    capacity = max(1, int(round(args.target * gh * gw)))

    cfg = SwiftNetConfig(backbone="resnet50", num_classes=19)
    params = init_swiftnet(jax.random.PRNGKey(0), cfg, dtype=dtype)
    scfg = StepperConfig(block_size=128, block_target=args.target,
                         train_interval=4, policy_arch="fast")
    stepper = FixedCapacityStepper(make_apply_fn(cfg), scfg, frame_shape,
                                   capacity=capacity, dtype=dtype)
    state = stepper.init_state(params, jax.random.PRNGKey(1))
    first = jax.jit(stepper.first_step, donate_argnums=(1,))
    step = jax.jit(stepper.step, donate_argnums=(1,))

    rs = np.random.RandomState(0)
    base = rs.randn(*frame_shape).astype(np.float32)

    def frame(t):
        f = base.copy()
        s = (t * 37) % (args.height - 200)
        f[:, s:s + 160, s:s + 160] += 2.0
        return jnp.asarray(f, dtype)

    staged = [jax.device_put(frame(10 + i)) for i in range(8)]

    def fence(s):
        return float(jnp.sum(s["outputs"].astype(jnp.float32)))

    state = first(params, state, frame(0))
    for t in range(1, args.warmup + 1):
        state = step(params, state, staged[t % 8])
    fence(state)
    print("compiled + warm", flush=True)

    fps = {n: [] for n in lengths}
    for r in range(args.rounds):
        for n in lengths:
            t0 = time.perf_counter()
            for t in range(n):
                state = step(params, state, staged[t % 8])
            fence(state)
            dt = time.perf_counter() - t0
            fps[n].append(n / dt)
        print(f"round {r}: " + "  ".join(
            f"{n}f {fps[n][-1]:.2f}" for n in lengths), flush=True)

    out = {str(n): {"max": round(float(np.max(v)), 3),
                    "median": round(float(np.median(v)), 3),
                    "windows": [round(float(x), 3) for x in v]}
           for n, v in fps.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
