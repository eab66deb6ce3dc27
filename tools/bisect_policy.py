"""Fine-grained policy-side cost bisection (fenced, back-to-back).

Variants:
  fwd          assemble_policy_input + policy net forward (sampling path)
  ig           semseg information gain alone
  train_never  full policy step, train cond never taken
  train_always full policy step, REINFORCE grad+update every frame
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


def bench(fn, state, frames, staged, fence, warmup=5):
    for t in range(warmup):
        state = fn(state, staged[t % len(staged)])
    fence(state)
    t0 = time.perf_counter()
    for t in range(frames):
        state = fn(state, staged[t % len(staged)])
    fence(state)
    dt = time.perf_counter() - t0
    return frames / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--frames", type=int, default=40)
    args = ap.parse_args()

    from blockcopy_tpu.core.stepper import FixedCapacityStepper, StepperConfig
    from blockcopy_tpu.models.swiftnet import SwiftNetConfig, make_apply_fn
    from blockcopy_tpu.policy.information_gain import semseg_information_gain
    from blockcopy_tpu.policy.net import (
        assemble_policy_input, policy_net_apply)

    n = 1
    gh, gw = args.height // 128, args.width // 128
    frame_shape = (n, args.height, args.width, 3)
    cfg = SwiftNetConfig(backbone="resnet18", num_classes=19)
    scfg = StepperConfig(block_size=128, train_interval=4)
    stepper = FixedCapacityStepper(make_apply_fn(cfg), scfg, frame_shape,
                                   capacity=1, dtype=jnp.bfloat16)

    rs = np.random.RandomState(0)
    staged = [jax.device_put(jnp.asarray(
        rs.randn(*frame_shape).astype(np.float32), jnp.bfloat16))
        for _ in range(3)]
    out_shape = (n, args.height // 4, args.width // 4, 19)
    outputs = jax.device_put(jnp.asarray(
        rs.randn(*out_shape).astype(np.float32)))
    outputs_prev = outputs + 0.1
    prev_grid = jnp.ones((n, gh, gw), jnp.float32)

    results = {}

    # fwd only
    pstate = stepper.init_policy_state(jax.random.PRNGKey(2))

    @jax.jit
    def fwd(pol, frame):
        x = assemble_policy_input(frame, frame.astype(jnp.float32),
                                  outputs, prev_grid, 128)
        logits, bn_state = policy_net_apply(pol["params"], pol["bn_state"],
                                            x, update_stats=True)
        return {**pol, "bn_state": bn_state, "_logits_sum": jnp.sum(logits)}

    fps = bench(fwd, pstate, args.frames, staged,
                lambda s: float(s["_logits_sum"]))
    results["fwd"] = fps
    print(json.dumps({"variant": "fwd", "fps": round(fps, 2),
                      "ms": round(1000 / fps, 2)}), flush=True)

    # information gain only
    @jax.jit
    def ig_fn(box, frame):
        ig = semseg_information_gain(box["o"], box["op"])
        return {**box, "_s": jnp.sum(ig)}

    box = {"o": outputs, "op": outputs_prev}
    fps = bench(ig_fn, box, args.frames, staged, lambda s: float(s["_s"]))
    results["ig"] = fps
    print(json.dumps({"variant": "ig", "fps": round(fps, 2),
                      "ms": round(1000 / fps, 2)}), flush=True)

    # full policy step with train cond controlled by frame_idx
    def make_pol_step(frame_idx):
        @jax.jit
        def pol_step(pol, frame):
            x = assemble_policy_input(frame, frame.astype(jnp.float32),
                                      outputs, prev_grid, 128)
            logits, bn_state = policy_net_apply(pol["params"],
                                                pol["bn_state"], x,
                                                update_stats=True)
            probs = jax.nn.sigmoid(logits[..., 0])
            state = {"policy": {**pol, "bn_state": bn_state},
                     "outputs": outputs, "outputs_prev": outputs_prev,
                     "frame_idx": jnp.int32(frame_idx)}
            newpol = stepper._policy_optim(
                state, (probs > 0.0).astype(jnp.float32), x, None)
            return newpol
        return pol_step

    for name, fi in (("train_never", 1), ("train_always", 4)):
        step = make_pol_step(fi)
        fps = bench(
            step, stepper.init_policy_state(jax.random.PRNGKey(2)),
            args.frames, staged,
            lambda s: float(jnp.sum(s["opt"].square_avg["conv1"]["w"])
                            + s["running_cost"]))
        results[name] = fps
        print(json.dumps({"variant": name, "fps": round(fps, 2),
                          "ms": round(1000 / fps, 2)}), flush=True)

    print(json.dumps({"results": {k: round(v, 2) for k, v in
                                  results.items()}}))


if __name__ == "__main__":
    main()
