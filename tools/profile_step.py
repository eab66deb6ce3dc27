"""Probe: does jax.profiler capture DEVICE lanes through the axon relay?

If the trace contains XLA-op events (device timeline), op-level cost
attribution becomes possible and supersedes variant bisection.  If it only
contains host python/dispatch lanes, record that as an environment fact.

Usage: python tools/profile_step.py [--outdir /tmp/jaxtrace]
Inspect: ls <outdir>/plugins/profile/*/ ; the *.trace.json.gz /.xplane.pb
sizes and contents tell whether device events exist (grep for 'fusion' or
conv op names after gunzip).
"""

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", type=str, default="/tmp/jaxtrace")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--set-flag", type=str, default=None,
                    help="'module.path:FLAG=1' to flip a lowering flag "
                    "before tracing")
    args = ap.parse_args()

    if args.set_flag:
        import importlib

        spec, val = args.set_flag.split("=")
        modpath, flagname = spec.split(":")
        setattr(importlib.import_module(modpath), flagname, val == "1")

    from blockcopy_tpu.core.stepper import FixedCapacityStepper, StepperConfig
    from blockcopy_tpu.models.swiftnet import (
        SwiftNetConfig, init_swiftnet, make_apply_fn)

    dtype = jnp.bfloat16
    frame_shape = (1, 1024, 2048, 3)
    capacity = 64
    cfg = SwiftNetConfig(backbone="resnet50", num_classes=19)
    params = init_swiftnet(jax.random.PRNGKey(0), cfg, dtype=dtype)
    scfg = StepperConfig(block_size=128, block_target=0.5, train_interval=4,
                        policy_arch="fast")
    stepper = FixedCapacityStepper(make_apply_fn(cfg), scfg, frame_shape,
                                   capacity=capacity, dtype=dtype)
    state = stepper.init_state(params, jax.random.PRNGKey(1))
    first = jax.jit(stepper.first_step, donate_argnums=(1,))
    step = jax.jit(stepper.step, donate_argnums=(1,))

    rs = np.random.RandomState(0)
    frame = jnp.asarray(rs.randn(*frame_shape).astype(np.float32), dtype)
    state = first(params, state, frame)
    for _ in range(4):
        state = step(params, state, frame)
    float(jnp.sum(state["outputs"].astype(jnp.float32)))  # fence

    jax.profiler.start_trace(args.outdir)
    for _ in range(args.frames):
        state = step(params, state, frame)
    float(jnp.sum(state["outputs"].astype(jnp.float32)))
    jax.profiler.stop_trace()

    # quick self-inspection: any device-plane evidence?
    found = sorted(glob.glob(os.path.join(
        args.outdir, "plugins/profile/*/*")))
    report = {"files": [(os.path.basename(f), os.path.getsize(f))
                        for f in found]}
    for f in found:
        if f.endswith(".trace.json.gz"):
            with gzip.open(f, "rt") as fh:
                data = json.load(fh)
            names = {e.get("name", "") for e in data.get("traceEvents", [])
                     if isinstance(e, dict)}
            devicey = [n for n in names if any(
                k in n.lower() for k in ("fusion", "conv", "dynamic-slice",
                                          "copy", "%"))]
            report["trace_events"] = len(data.get("traceEvents", []))
            report["devicey_names"] = devicey[:40]
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
