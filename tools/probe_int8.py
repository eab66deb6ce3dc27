"""Feasibility probe: can Pallas int8 matmuls beat bf16 at OUR shapes?

Round-2 pinned a negative: stock XLA ``conv_general_dilated(int8,int8)
->int32`` is 0.5-1.2x bf16 at packed-block shapes — the MXU's 2x int8
rate never materializes through the XLA conv path.  This probe measures
the other path: a Pallas kernel doing the im2col'd 3x3-conv matmul
(rows = K*bs*bs, reduce = 9*C, out = C — the blocked RN50 layer2/3 tail
shape) as int8xint8->int32 vs bf16xbf16->f32, BOTH as Pallas kernels with
identical grids, so the comparison isolates the MXU rate.

Timing: back-to-back interleaved fenced loops (device->host read as the
fence), per-variant max over windows.  Micro-numbers through the relay
overstate op costs; only the RATIO int8/bf16 is read off this probe.
Run: python tools/probe_int8.py
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel(x_ref, w_ref, y_ref, *, acc_t, out_t):
    y_ref[...] = jnp.dot(x_ref[...], w_ref[...],
                         preferred_element_type=acc_t).astype(out_t)


def make_mm(rows, k, n, dt, acc_t, out_t, chunk):
    grid_spec = pl.GridSpec(
        grid=(rows // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(
        functools.partial(_mm_kernel, acc_t=acc_t, out_t=out_t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, n), out_t),
    )
    return jax.jit(f)


def bench(fn, x, w, frames, windows):
    y = fn(x, w)
    float(jnp.sum(y.astype(jnp.float32)))  # fence after compile
    fps = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(frames):
            y = fn(x, w)
        float(jnp.sum(y.astype(jnp.float32)))
        fps.append(frames / (time.perf_counter() - t0))
    return max(fps)


def main():
    ap = argparse.ArgumentParser()
    # layer2 tail shape: 64 executed blocks x 16x16 px, C=128 -> rows 16384;
    # default probes the bigger layer3-ish GEMM (rows 16384, k 9*256, n 256)
    ap.add_argument("--rows", type=int, default=16384)
    ap.add_argument("--k", type=int, default=2304)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--windows", type=int, default=6)
    args = ap.parse_args()

    # generate operands ON DEVICE: multi-hundred-MB host->device transfers
    # fail through the axon relay
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    xb = jax.random.normal(kx, (args.rows, args.k), jnp.bfloat16)
    wb = jax.random.normal(kw, (args.k, args.n), jnp.bfloat16)
    xi = jax.random.randint(kx, (args.rows, args.k), -127, 128,
                            jnp.int8)
    wi = jax.random.randint(kw, (args.k, args.n), -127, 128, jnp.int8)

    flops = 2.0 * args.rows * args.k * args.n
    f_bf = make_mm(args.rows, args.k, args.n, jnp.bfloat16, jnp.float32,
                   jnp.bfloat16, args.chunk)
    f_i8 = make_mm(args.rows, args.k, args.n, jnp.int8, jnp.int32,
                   jnp.int32, args.chunk)

    r_bf = bench(f_bf, xb, wb, args.frames, args.windows)
    r_i8 = bench(f_i8, xi, wi, args.frames, args.windows)
    # interleave once more for fairness
    r_bf = max(r_bf, bench(f_bf, xb, wb, args.frames, args.windows))
    r_i8 = max(r_i8, bench(f_i8, xi, wi, args.frames, args.windows))

    print(json.dumps({
        "shape": [args.rows, args.k, args.n],
        "bf16_tflops": round(flops * r_bf / 1e12, 1),
        "int8_tops": round(flops * r_i8 / 1e12, 1),
        "int8_over_bf16": round(r_i8 / r_bf, 3),
    }))


if __name__ == "__main__":
    main()
