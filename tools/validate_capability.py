"""Empirical capability validation on synthetic moving scenes (no dataset
required): runs the full ladder engine with the online-REINFORCE policy and
reports, per phase,

* execution-rate convergence to the target (the policy's complexity reward),
* output agreement vs. the per-frame dense model (the quality-at-sparsity
  claim: reference keeps mIoU within ~1.3 points at 50% compute),
* where the policy executes (moving-region hit rate — information gain),
* average sparse GMACs per frame.

Writes VALIDATION.json.  Run on TPU:  python tools/validate_capability.py
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from blockcopy_tpu import BlockCopyModel
from blockcopy_tpu.core.argparser import default_settings
from blockcopy_tpu.core.blocked import ExecCtx
from blockcopy_tpu.models.swiftnet import (
    SwiftNetConfig, init_swiftnet, make_apply_fn, swiftnet_apply,
)


def make_clip(index, frames, h, w, seed=0, amp=2.5):
    """Static background + two moving bright objects with known tracks.

    ``amp``: object brightness offset.  The default 2.5 barely perturbs a
    random-init RN50's argmax (frozen-frame agreement 0.9985 — measured,
    VALIDATION_rn50.json r2), making the quality proxy non-discriminative
    for that backbone; amp=8.0 drops the RN50 frozen baseline to ~0.92 so
    tracking-vs-frozen margins carry signal (rn18 discriminates at either).
    """
    rs = np.random.RandomState(seed + index)
    base = rs.randn(h, w, 3).astype(np.float32)
    tracks = []
    clip = []
    for t in range(frames):
        f = base.copy()
        boxes = []
        for k in range(2):
            x = (37 * (index + k) + 23 * t * (k + 1)) % (w - 160)
            y = (53 * (index + 2 * k) + 15 * t) % (h - 160)
            f[y:y + 140, x:x + 140] += amp
            boxes.append((y, x))
        tracks.append(boxes)
        clip.append(f)
    return clip, tracks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--backbone", type=str, default="resnet18")
    ap.add_argument("--target", type=float, default=0.5)
    ap.add_argument("--warmup-clips", type=int, default=12)
    ap.add_argument("--eval-clips", type=int, default=4)
    ap.add_argument("--clip-length", type=int, default=10)
    ap.add_argument("--out", type=str, default="VALIDATION.json")
    ap.add_argument("--policy-arch", type=str, default="ref",
                    choices=["ref", "fast"])
    ap.add_argument("--object-amp", type=float, default=2.5,
                    help="moving-object brightness; 8.0 for a "
                    "frozen-discriminative RN50 proxy (see make_clip)")
    args = ap.parse_args()

    cfg = SwiftNetConfig(backbone=args.backbone, num_classes=19)
    params = init_swiftnet(jax.random.PRNGKey(0), cfg)
    settings = default_settings(
        block_policy="rl_semseg", block_target=args.target,
        block_quantize_number_exec=1.0 / 8.0,
        block_policy_arch=args.policy_arch,
    )
    model = BlockCopyModel(make_apply_fn(cfg), params, settings)
    dense = jax.jit(lambda x: jnp.argmax(
        swiftnet_apply(params, x, ExecCtx.dense(), cfg), -1))

    exec_rates = []
    t0 = time.time()
    for c in range(args.warmup_clips):
        clip, _ = make_clip(c, args.clip_length, args.height, args.width,
                            amp=args.object_amp)
        model.reset_temporal()
        for f in clip:
            model(jnp.asarray(f[None]))
            exec_rates.append(model.policy_meta["perc_exec"])
    warmup_s = time.time() - t0

    agree, agree_frozen, moving_hit = [], [], []
    model.flops.reset_frames()
    for c in range(args.eval_clips):
        clip, tracks = make_clip(10_000 + c, args.clip_length, args.height,
                                 args.width, amp=args.object_amp)
        model.reset_temporal()
        first_dense = None
        for t, f in enumerate(clip):
            x = jnp.asarray(f[None])
            out = model(x)
            pred = np.asarray(jnp.argmax(out, -1))
            ref = np.asarray(dense(x))
            if t == 0:
                first_dense = ref
            if t >= 2:  # frames 1-2 are all-exec by construction
                agree.append(float((pred == ref).mean()))
                agree_frozen.append(float((first_dense == ref).mean()))
                # moving-region preference: fraction of moving-object blocks
                # that the policy chose to execute
                grid = np.asarray(model.policy_meta["grid"])[0]
                bs = settings["block_size"]
                hits, total = 0, 0
                for (y, x0) in tracks[t]:
                    for gy in range(y // bs, min((y + 140) // bs + 1,
                                                 grid.shape[0])):
                        for gx in range(x0 // bs, min((x0 + 140) // bs + 1,
                                                      grid.shape[1])):
                            total += 1
                            hits += int(grid[gy, gx])
                if total:
                    moving_hit.append(hits / total)

    tail = exec_rates[-4 * args.clip_length:]
    results = {
        "target": args.target,
        "policy_arch": args.policy_arch,
        "backbone": args.backbone,
        "object_amp": args.object_amp,
        "exec_rate_final_mean": float(np.mean(tail)),
        "running_cost": float(model.policy.running_cost),
        "agreement_vs_dense": float(np.mean(agree)),
        "agreement_frozen_baseline": float(np.mean(agree_frozen)),
        "moving_block_exec_rate": float(np.mean(moving_hit)),
        "gmacs_per_image": model.flops.average_gmacs(),
        "warmup_clips": args.warmup_clips,
        "warmup_seconds": round(warmup_s, 1),
        "frames_evaluated": len(agree),
    }
    with open(args.out, "w") as fjson:
        json.dump(results, fjson, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
