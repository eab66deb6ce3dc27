"""Window-length ladder for the detection bench's measurement windows.

Semseg's ladder (bench.py r5 note) showed the fixed per-window fence RPC
(~10-30 ms through the relay) depresses short windows: 60/150/300-frame
windows read 262.6/291.4/300.0 FPS on the SAME compiled program.  The
detection bench still measures 150-frame windows (~1 s at ~153 FPS).
This probe interleaves fenced windows of the requested lengths on one
compiled fused detection stepper, so any difference is pure measurement
overhead, not a program change.

Usage:  python tools/window_ladder_detection.py --lengths 150,300
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
    ap.add_argument("--target", type=float, default=0.3)
    ap.add_argument("--lengths", type=str, default="150,300")
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args()
    lengths = [int(x) for x in args.lengths.split(",")]

    from blockcopy_tpu.core.stepper import StepperConfig
    from blockcopy_tpu.models.csp import CSPConfig, init_csp
    from blockcopy_tpu.tasks.detection.stepper import DetectionStepper

    dtype = jnp.bfloat16
    frame_shape = (1, args.height, args.width, 3)
    gh, gw = args.height // 128, args.width // 128
    capacity = max(1, int(round(args.target * gh * gw)))

    csp_cfg = CSPConfig()
    params = init_csp(jax.random.PRNGKey(0), csp_cfg, dtype=dtype)
    scfg = StepperConfig(block_size=128, block_target=args.target,
                         train_interval=4, num_classes=1,
                         policy_arch="fast")
    stepper = DetectionStepper(csp_cfg, scfg, frame_shape, capacity,
                               dtype=dtype)
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
        return float(jnp.sum(s["dets"].astype(jnp.float32)))

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
