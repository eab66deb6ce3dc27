"""Policy-net forward micro-bisection: where do 2.6 ms go?

Variants re-implement the forward with the same params:
  base        current policy_net_apply (bf16 convs, fp32 two-pass BN)
  affine_bn   BN replaced by pure affine (no batch statistics) — isolates
              the cost of train-mode batch-stat reductions
  onepass     BN batch stats via one-pass E[x^2]-E[x]^2
  bf16acts    conv outputs stay bf16; BN stats computed in fp32 from bf16,
              normalized output written bf16 — halves activation traffic
  noassemble  base net on a pre-staged input (isolates assemble_policy_input)
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

BN_EPS = 1e-5


def bench(fn, arg, staged, frames, warmup=5):
    out = None
    for t in range(warmup):
        out = fn(arg, staged[t % len(staged)])
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for t in range(frames):
        out = fn(arg, staged[t % len(staged)])
    float(jnp.sum(out))
    return frames / (time.perf_counter() - t0)


def make_apply(conv_fn, bn_fn):
    def block(x, p, stride):
        identity = x
        if "down_conv" in p:
            identity = bn_fn(conv_fn(x, p["down_conv"], stride), p["down_bn"])
        out = jnp.maximum(bn_fn(conv_fn(x, p["conv1"], stride), p["bn1"]), 0)
        out = bn_fn(conv_fn(out, p["conv2"], 1), p["bn2"])
        return jnp.maximum(out + identity, 0)

    def apply(params, x):
        x = jnp.maximum(bn_fn(conv_fn(x, params["conv1"], 1), params["bn1"]), 0)
        for i, stride in enumerate([1, 2, 2]):
            x = block(x, params[f"layer{i + 1}"], stride)
        x = jnp.maximum(bn_fn(conv_fn(x, params["head0"], 2),
                              params["head0_bn"]), 0)
        x = jnp.maximum(bn_fn(conv_fn(x, params["head1"], 2),
                              params["head1_bn"]), 0)
        return conv_fn(x, params["head2"], 2)
    return apply


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    args = ap.parse_args()

    from blockcopy_tpu.policy.net import (
        init_policy_net, policy_net_apply, policy_in_channels)

    cin = policy_in_channels(19)
    params, bn_state = init_policy_net(jax.random.PRNGKey(0), cin)
    rs = np.random.RandomState(0)
    staged = [jax.device_put(jnp.asarray(
        rs.randn(1, 256, 512, cin).astype(np.float32)))
        for _ in range(3)]

    def conv_bf16(x, p, stride=1):
        out = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), p["w"].astype(jnp.bfloat16),
            window_strides=(stride, stride),
            padding=[(1, 1), (1, 1)] if p["w"].shape[0] == 3
            else [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out.astype(jnp.float32) + (p["b"] if "b" in p else 0.0)

    def conv_bf16_keep(x, p, stride=1):
        out = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), p["w"].astype(jnp.bfloat16),
            window_strides=(stride, stride),
            padding=[(1, 1), (1, 1)] if p["w"].shape[0] == 3
            else [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + (p["b"].astype(jnp.bfloat16) if "b" in p else 0.0)

    def bn_twopass(x, p):
        mean = x.mean((0, 1, 2))
        var = x.var((0, 1, 2))
        return (x - mean) * jax.lax.rsqrt(var + BN_EPS) * p["gamma"] + p["beta"]

    def bn_affine(x, p):
        return x * p["gamma"] + p["beta"]

    def bn_onepass(x, p):
        m1 = x.mean((0, 1, 2))
        m2 = (x * x).mean((0, 1, 2))
        var = m2 - m1 * m1
        return (x - m1) * jax.lax.rsqrt(var + BN_EPS) * p["gamma"] + p["beta"]

    def bn_onepass_bf16(x, p):
        xf = x.astype(jnp.float32)
        m1 = xf.mean((0, 1, 2))
        m2 = (xf * xf).mean((0, 1, 2))
        var = m2 - m1 * m1
        y = (xf - m1) * jax.lax.rsqrt(var + BN_EPS) * p["gamma"] + p["beta"]
        return y.astype(jnp.bfloat16)

    variants = {
        "base": jax.jit(lambda p, x: policy_net_apply(p, bn_state, x)[0]),
        "affine_bn": jax.jit(make_apply(conv_bf16, bn_affine)),
        "onepass": jax.jit(make_apply(conv_bf16, bn_onepass)),
        "bf16acts": jax.jit(make_apply(conv_bf16_keep, bn_onepass_bf16)),
    }

    def make_grad(fwd):
        def loss(p, x):
            out = fwd(p, x)
            return jnp.sum(out.astype(jnp.float32) * 1e-3)
        g = jax.grad(loss)

        @jax.jit
        def run(p, x):
            gr = g(p, x)
            return sum(jnp.sum(leaf.astype(jnp.float32) ** 2)
                       for leaf in jax.tree.leaves(gr))[None]
        return run

    base_fwd = lambda p, x: policy_net_apply(p, bn_state, x,
                                             update_stats=False)[0]
    grads = {
        "grad_base": make_grad(base_fwd),
        "grad_remat": make_grad(jax.checkpoint(base_fwd)),
        "grad_affine": make_grad(make_apply(conv_bf16, bn_affine)),
        "grad_onepass": make_grad(make_apply(conv_bf16, bn_onepass)),
        "grad_bf16acts": make_grad(make_apply(conv_bf16_keep,
                                              bn_onepass_bf16)),
    }
    for name, fn in {**variants, **grads}.items():
        fps = bench(fn, params, staged, args.frames)
        print(json.dumps({"variant": name, "fps": round(fps, 1),
                          "ms": round(1000 / fps, 3)}), flush=True)


if __name__ == "__main__":
    main()
