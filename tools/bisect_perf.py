"""Perf bisection: fenced FPS of step *variants* to locate the cost centers.

Measurement discipline (docs/NEXT_ROUND.md): every number is fenced by a
device->host read; variants are compared back-to-back in one process.

Variants (all SwiftNet-RN50, 1024x2048, bf16, capacity = target*total):

  full          the production step (policy fwd + model + REINFORCE)
  model         model only: split -> blocked apply -> dense out
  model_nofs    model only, WITHOUT the full-res __frame_state__ canvas
                (isolates the 12 MB/frame frame-state materialization)
  model_noout   model only, OUT canvas scattered but dense image NOT built
                (isolates the 5 MB/frame dense-output materialization)
  backbone      blocked backbone only (no SPP / decoder / logits)
  policy        policy net fwd + REINFORCE update on staged inputs only

Usage: python tools/bisect_perf.py [--frames 30] [--variants a,b,c]
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


def build_state(apply_body, frame_shape, capacity, total, geom, dtype):
    """eval_shape a building pass of ``apply_body`` and allocate canvases."""
    n, gh, gw = geom
    from blockcopy_tpu.core.blocked import ExecCtx, split_dense

    def build(frame):
        idx = jnp.arange(total, dtype=jnp.int32)
        ctx = ExecCtx.blocked(idx, n, gh, gw, {}, building=True)
        pack = split_dense(frame, idx, n, gh, gw)
        apply_body(pack, ctx)
        return ctx.canvases

    shapes = jax.eval_shape(
        build, jax.ShapeDtypeStruct(frame_shape, dtype))
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def bench(step, state, frames, staged, fence, warmup=6, windows=3):
    """Max FPS over several fenced windows: relay interference is one-sided
    (windows only ever spike LOW), so max is the least-biased estimate."""
    for t in range(warmup):
        state = step(state, staged[t % len(staged)])
    fence(state)
    best = 0.0
    for _ in range(windows):
        t0 = time.perf_counter()
        for t in range(frames):
            state = step(state, staged[t % len(staged)])
        fence(state)
        dt = time.perf_counter() - t0
        best = max(best, frames / dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--backbone", type=str, default="resnet50")
    ap.add_argument("--target", type=float, default=0.5)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--variants", type=str,
                    default="full,model,model_nofs,model_noout,backbone,policy")
    ap.add_argument("--policy-arch", type=str, default="fast",
                    help="policy arch for the 'full' variant (match bench.py)")
    args = ap.parse_args()

    from functools import partial

    from blockcopy_tpu.core import grid as gridlib
    from blockcopy_tpu.core.blocked import (
        ExecCtx, split_dense, scatter_pack)
    from blockcopy_tpu.core.stepper import (
        FixedCapacityStepper, StepperConfig, FRAME_STATE, OUT)
    from blockcopy_tpu.models.swiftnet import (
        SwiftNetConfig, init_swiftnet, make_apply_fn, resnet_forward_down)
    from blockcopy_tpu.policy.net import (
        assemble_policy_input, policy_net_apply)

    dtype = jnp.bfloat16
    frame_shape = (1, args.height, args.width, 3)
    gh, gw = args.height // 128, args.width // 128
    n, total = 1, gh * gw
    geom = (n, gh, gw)
    capacity = max(1, int(round(args.target * total)))

    cfg = SwiftNetConfig(backbone=args.backbone, num_classes=19)
    params = init_swiftnet(jax.random.PRNGKey(0), cfg, dtype=dtype)
    apply_fn = make_apply_fn(cfg)
    scfg = StepperConfig(block_size=128, block_target=args.target,
                         train_interval=4, policy_arch=args.policy_arch)
    stepper = FixedCapacityStepper(apply_fn, scfg, frame_shape,
                                   capacity=capacity, dtype=dtype)

    rs = np.random.RandomState(0)
    base = rs.randn(*frame_shape).astype(np.float32)
    staged = []
    for i in range(4):
        f = base.copy()
        s = (i * 97) % (args.height - 200)
        f[:, s:s + 160, s:s + 160] += 2.0
        staged.append(jax.device_put(jnp.asarray(f, dtype)))

    results = {}
    want = args.variants.split(",")

    # ---- full production step -------------------------------------------
    if "full" in want:
        state = stepper.init_state(params, jax.random.PRNGKey(1))
        first = jax.jit(stepper.first_step, donate_argnums=(1,))
        step = jax.jit(stepper.step, donate_argnums=(1,))
        state = first(params, state, staged[0])
        fps = bench(lambda s, f: step(params, s, f), state, args.frames,
                    staged,
                    lambda s: float(jnp.sum(s["outputs"].astype(jnp.float32))))
        results["full"] = fps
        print(json.dumps({"variant": "full", "fps": round(fps, 2)}),
              flush=True)

    # ---- model-only variants ---------------------------------------------
    def model_variant(name, with_fs, with_dense_out, body=None):
        body = body or (lambda pack, ctx: apply_fn(params, pack, ctx))

        def apply_body(pack, ctx):
            if with_fs:
                # production semantics: frame state stored at policy
                # resolution (stepper._store_frame_state), not full res
                stepper._store_frame_state(ctx, pack)
            out = body(pack, ctx)
            if with_dense_out:
                ctx.store_dense(OUT, out)
            else:
                ctx.canvases[OUT] = scatter_pack(
                    ctx.canvas_for(OUT, out), out)

        canvases = build_state(apply_body, frame_shape, capacity, total,
                               geom, dtype)

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, frame, idx):
            ctx = ExecCtx.blocked(idx, n, gh, gw, dict(state))
            pack = split_dense(frame, idx, n, gh, gw)
            apply_body(pack, ctx)
            return ctx.canvases

        # fixed rotating grids at the right capacity
        grids = []
        rs2 = np.random.RandomState(7)
        for i in range(4):
            g = np.zeros(total, np.float32)
            g[rs2.choice(total, capacity, replace=False)] = 1
            grids.append(jnp.asarray(g.reshape(n, gh, gw)))
        idxs = [gridlib.exec_indices(g > 0, capacity) for g in grids]
        state = step(canvases, staged[0], jnp.arange(
            total, dtype=jnp.int32)[:capacity])  # warm shapes

        def fence(s):
            leaf = s[OUT]
            if isinstance(leaf, dict):
                leaf = leaf["rows"]
            return float(jnp.sum(leaf[:1].astype(jnp.float32)))

        i_box = [0]

        def stepper_fn(s, f):
            i_box[0] += 1
            return step(s, f, idxs[i_box[0] % len(idxs)])

        fps = bench(stepper_fn, state, args.frames, staged, fence)
        results[name] = fps
        print(json.dumps({"variant": name, "fps": round(fps, 2)}), flush=True)

    if "model" in want:
        model_variant("model", with_fs=True, with_dense_out=True)
    if "model_nofs" in want:
        model_variant("model_nofs", with_fs=False, with_dense_out=True)
    if "model_noout" in want:
        model_variant("model_noout", with_fs=False, with_dense_out=False)
    if "backbone" in want:
        def bb_body(pack, ctx):
            feats = resnet_forward_down(params["backbone"], pack, ctx,
                                        cfg.resnet)
            return feats[3]
        model_variant("backbone", with_fs=False, with_dense_out=True,
                      body=bb_body)

    # ---- per-stage backbone prefixes (stem, stem+layer1, ...) ------------
    # Mirrors resnet_forward_down with an early stop so the per-stage cost
    # of the blocked backbone is visible (stage deltas, not micro-benches).
    def make_prefix_body(n_stages):
        from blockcopy_tpu.models.swiftnet import (
            _basic_block, _bottleneck_block)
        from blockcopy_tpu.ops import layers as L

        bp = params["backbone"]

        def body(pack, ctx):
            x = L.conv2d(ctx, "backbone.conv1", pack, bp["conv1"]["w"],
                         stride=2, padding=3)
            x = L.batch_norm(x, bp["bn1"]["scale"], bp["bn1"]["bias"])
            x = L.relu(x)
            x = L.max_pool2d(ctx, "backbone.maxpool", x, kernel=3, stride=2,
                             padding=1)
            for stage in range(n_stages):
                stride = 1 if stage == 0 else 2
                for b, p in enumerate(bp[f"layer{stage + 1}"]):
                    s = stride if b == 0 else 1
                    name = f"backbone.layer{stage + 1}.{b}"
                    if cfg.resnet.bottleneck:
                        x = _bottleneck_block(ctx, name, x, p, s,
                                              groups=cfg.resnet.groups)
                    else:
                        x = _basic_block(ctx, name, x, p, s)
            return x

        return body

    for nm, ns in (("stem", 0), ("upto1", 1), ("upto2", 2), ("upto3", 3)):
        if nm in want:
            model_variant(nm, with_fs=False, with_dense_out=True,
                          body=make_prefix_body(ns))

    # finer stem decomposition: split-only (gather + OUT store machinery)
    # and stem conv without the maxpool
    if "split" in want:
        model_variant("split", with_fs=False, with_dense_out=True,
                      body=lambda pack, ctx: pack)
    if "stem_conv" in want:
        from blockcopy_tpu.ops import layers as L

        def sc_body(pack, ctx):
            bp = params["backbone"]
            x = L.conv2d(ctx, "backbone.conv1", pack, bp["conv1"]["w"],
                         stride=2, padding=3)
            x = L.batch_norm(x, bp["bn1"]["scale"], bp["bn1"]["bias"])
            return L.relu(x)

        model_variant("stem_conv", with_fs=False, with_dense_out=True,
                      body=sc_body)

    # ---- policy only -------------------------------------------------------
    if "policy" in want:
        pstate = stepper.init_policy_state(jax.random.PRNGKey(2))
        out_shape = (n, args.height // 4, args.width // 4, 19)
        outputs = jnp.asarray(rs.randn(*out_shape).astype(np.float32))
        outputs_prev = outputs + 0.1
        fs = staged[0]
        prev_grid = jnp.ones((n, gh, gw), jnp.float32)

        @jax.jit
        def pol_step(pol, frame):
            cache_x = assemble_policy_input(frame, fs.astype(jnp.float32),
                                            outputs, prev_grid, 128)
            logits, bn_state = policy_net_apply(pol["params"],
                                                pol["bn_state"], cache_x,
                                                update_stats=True)
            probs = jax.nn.sigmoid(logits[..., 0])
            state = {"policy": {**pol, "bn_state": bn_state},
                     "outputs": outputs, "outputs_prev": outputs_prev,
                     "frame_idx": jnp.int32(4)}
            newpol = stepper._policy_optim(state, (probs > 0.5).astype(
                jnp.float32), cache_x, None)
            return newpol

        state = pol_step(pstate, staged[0])
        fps = bench(lambda s, f: pol_step(s, f), state, args.frames, staged,
                    lambda s: float(jnp.sum(
                        s["running_cost"].astype(jnp.float32))))
        results["policy"] = fps
        print(json.dumps({"variant": "policy", "fps": round(fps, 2)}),
              flush=True)

    print(json.dumps({"results": {k: round(v, 2) for k, v in
                                  results.items()}}))


if __name__ == "__main__":
    main()
