"""Single-conv backward cost probe: where do 6.5 ms of policy backward go?

For each (spatial, cin, cout) probes: forward conv, full grad (weights +
input), weights-only grad, input-only grad — bf16 in/out, NHWC.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, frames=40, warmup=4):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(frames):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / frames * 1000


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rs = np.random.RandomState(0)
    cases = [
        (256, 512, 26, 32),   # policy conv1
        (256, 512, 32, 32),   # policy layer1
        (128, 256, 64, 64),   # policy layer2
        (64, 128, 128, 128),  # policy layer3
        (256, 512, 128, 128), # control: wide at full spatial
    ]
    for h, w, cin, cout in cases:
        x = jax.device_put(jnp.asarray(
            rs.randn(1, h, w, cin).astype(np.float32), jnp.bfloat16))
        k = jax.device_put(jnp.asarray(
            rs.randn(3, 3, cin, cout).astype(np.float32) * 0.05,
            jnp.bfloat16))

        fwd = jax.jit(conv)
        loss = lambda xx, kk: jnp.sum(conv(xx, kk).astype(jnp.float32))
        gboth = jax.jit(jax.grad(loss, argnums=(0, 1)))
        gw = jax.jit(jax.grad(loss, argnums=1))
        gx = jax.jit(jax.grad(loss, argnums=0))

        res = {
            "case": f"{h}x{w} {cin}->{cout}",
            "fwd_ms": round(timeit(fwd, x, k), 3),
            "grad_both_ms": round(timeit(gboth, x, k), 3),
            "grad_w_ms": round(timeit(gw, x, k), 3),
            "grad_x_ms": round(timeit(gx, x, k), 3),
        }
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
