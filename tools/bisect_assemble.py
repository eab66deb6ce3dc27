"""A/B: assemble_policy_input cost with strided-slice vs gather
resize_nearest, plus full-step run-to-run variance, in ONE process."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, arg, staged, frames=60, warmup=5, thread=False):
    """``thread=True`` carries fn's output back in as ``arg`` (stepper)."""
    out = None
    for t in range(warmup):
        out = fn(arg, staged[t % len(staged)])
        if thread:
            arg = out
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for t in range(frames):
        out = fn(arg, staged[t % len(staged)])
        if thread:
            arg = out
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return frames / (time.perf_counter() - t0), out


def main():
    h, w = 1024, 2048
    rs = np.random.RandomState(0)
    frame = jax.device_put(jnp.asarray(
        rs.randn(1, h, w, 3).astype(np.float32), jnp.bfloat16))
    fs = jax.device_put(jnp.asarray(
        rs.randn(1, h, w, 3).astype(np.float32), jnp.bfloat16))
    outputs = jax.device_put(jnp.asarray(
        rs.randn(1, h // 4, w // 4, 19).astype(np.float32)))
    grid = jnp.ones((1, h // 128, w // 128), jnp.float32)
    staged = [frame, frame + 0.1, frame + 0.2]

    def asm(resize):
        def f(_, fr):
            feats = [
                resize(fr.astype(jnp.float32), (h // 4, w // 4)),
                resize(fs.astype(jnp.float32), (h // 4, w // 4)),
                outputs - 0.5,
                resize(grid.astype(jnp.float32)[..., None],
                       (h // 4, w // 4)) - 0.5,
            ]
            return jnp.concatenate(feats, -1)
        return jax.jit(f)

    def rz_slice(x, hw):
        if x.shape[1] < hw[0]:  # upscale (the grid input): gather
            return rz_gather(x, hw)
        return x[:, :: x.shape[1] // hw[0], :: x.shape[2] // hw[1]]

    def rz_gather(x, hw):
        oh, ow = hw
        ry = (jnp.arange(oh) * x.shape[1] // oh).astype(jnp.int32)
        rx = (jnp.arange(ow) * x.shape[2] // ow).astype(jnp.int32)
        return x[:, ry][:, :, rx]

    def rz_blocked(x, hw):
        # downsample through the block layout: per-block small-dim gathers
        if x.shape[1] < hw[0] or x.shape[1] % hw[0]:
            return rz_gather(x, hw)
        n, hh, ww, c = x.shape
        bs = 128
        gh, gw = hh // bs, ww // bs
        k = hh // hw[0]
        blk = x.reshape(n, gh, bs, gw, bs, c).transpose(0, 1, 3, 2, 4, 5)
        blk = blk.reshape(n * gh * gw, bs, bs, c)
        r = (jnp.arange(bs // k) * k).astype(jnp.int32)
        small = blk[:, r][:, :, r]
        sbs = bs // k
        out = small.reshape(n, gh, gw, sbs, sbs, c).transpose(0, 1, 3, 2, 4, 5)
        return out.reshape(n, gh * sbs, gw * sbs, c)

    def rz_pool(x, hw):
        # mean-pool downsample (not nearest semantics; speed probe only)
        if x.shape[1] < hw[0] or x.shape[1] % hw[0]:
            return rz_gather(x, hw)
        n, hh, ww, c = x.shape
        k = hh // hw[0]
        return x.reshape(n, hw[0], k, hw[1], k, c).mean((2, 4))

    for name, rz in (("slice", rz_slice), ("gather", rz_gather),
                     ("blocked", rz_blocked), ("pool", rz_pool)):
        fps, _ = bench(asm(rz), None, staged)
        print(json.dumps({"variant": f"assemble_{name}",
                          "ms": round(1000 / fps, 3)}), flush=True)

    # full-step variance: 4 consecutive measurements of the SAME program
    from blockcopy_tpu.core.stepper import FixedCapacityStepper, StepperConfig
    from blockcopy_tpu.models.swiftnet import (
        SwiftNetConfig, init_swiftnet, make_apply_fn)
    cfg = SwiftNetConfig(backbone="resnet50", num_classes=19)
    params = init_swiftnet(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    scfg = StepperConfig(block_size=128, train_interval=4)
    st = FixedCapacityStepper(make_apply_fn(cfg), scfg, (1, h, w, 3),
                              capacity=64, dtype=jnp.bfloat16)
    state = st.init_state(params, jax.random.PRNGKey(1))
    first = jax.jit(st.first_step, donate_argnums=(1,))
    step = jax.jit(st.step, donate_argnums=(1,))
    state = first(params, state, staged[0])
    for rep in range(4):
        fps, state = bench(lambda s, f: step(params, s, f), state, staged,
                           frames=50, thread=True)
        print(json.dumps({"variant": f"full_rep{rep}",
                          "fps": round(fps, 2)}), flush=True)


if __name__ == "__main__":
    main()
