"""Device op-timeline capture for the fused DETECTION stepper.

Detection analogue of tools/profile_step.py (which proved jax.profiler
captures the device 'XLA Ops' lane through the axon relay).  Traces the
steady-state CSP-R50 BlockCopy step at 1024x2048, target 0.3, bf16 —
the exact configuration of bench_detection.py — so tools/profile_top.py
can attribute the ~13 ms frame (VERDICT r3 item 1: the detection stepper
has never been profiled).

Usage: python tools/profile_detection.py [--outdir /tmp/jaxtrace_det]
Then:  python tools/profile_top.py --outdir /tmp/jaxtrace_det --top 60
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", type=str, default="/tmp/jaxtrace_det")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--target", type=float, default=0.3)
    ap.add_argument("--set-flag", type=str, default=None,
                    help="'module.path:FLAG=1' to flip a lowering flag "
                    "before tracing")
    args = ap.parse_args()

    if args.set_flag:
        import importlib

        spec, val = args.set_flag.split("=")
        modpath, flagname = spec.split(":")
        setattr(importlib.import_module(modpath), flagname, val == "1")

    from blockcopy_tpu.core.stepper import StepperConfig
    from blockcopy_tpu.models.csp import CSPConfig, init_csp
    from blockcopy_tpu.tasks.detection.stepper import DetectionStepper

    dtype = jnp.bfloat16
    frame_shape = (1, 1024, 2048, 3)
    gh, gw = 1024 // 128, 2048 // 128
    capacity = max(1, int(round(args.target * gh * gw)))

    csp_cfg = CSPConfig()
    params = init_csp(jax.random.PRNGKey(0), csp_cfg, dtype=dtype)
    scfg = StepperConfig(block_size=128, block_target=args.target,
                         train_interval=4, num_classes=1, policy_arch="fast")
    stepper = DetectionStepper(csp_cfg, scfg, frame_shape, capacity,
                               dtype=dtype)
    state = stepper.init_state(params, jax.random.PRNGKey(1))
    first = jax.jit(stepper.first_step, donate_argnums=(1,))
    step = jax.jit(stepper.step, donate_argnums=(1,))

    rs = np.random.RandomState(0)
    frame = jnp.asarray(rs.randn(*frame_shape).astype(np.float32), dtype)
    state = first(params, state, frame)
    for _ in range(4):
        state = step(params, state, frame)
    float(jnp.sum(state["dets"].astype(jnp.float32)))  # fence

    t0 = time.perf_counter()
    jax.profiler.start_trace(args.outdir)
    for _ in range(args.frames):
        state = step(params, state, frame)
    float(jnp.sum(state["dets"].astype(jnp.float32)))
    jax.profiler.stop_trace()
    dt = time.perf_counter() - t0
    print(f"traced {args.frames} frames in {dt:.3f}s "
          f"({args.frames / dt:.1f} FPS incl. trace overhead)")


if __name__ == "__main__":
    main()
