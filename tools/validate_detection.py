"""Detection quality-frontier validation (VERDICT r4 item 5).

The semseg side has ``tools/validate_capability.py``; this is the detection
analogue: synthetic pedestrian-ish clips with COCO GT (the generator the
CLI already ships, ``tasks/detection/eval.py:SyntheticDetClipDataset``),
a CSP detector *trained in-process* on that distribution (the repo's
offline trainer, ``tasks/detection/train.py`` — random weights would make
miss rates meaningless), then three closed-loop modes through the fused
``DetectionStepper`` at the shipped defaults:

* **dense** — every frame through the all-exec first-frame program (the
  per-frame dense reference);
* **blockcopy** — target 0.3, online-REINFORCE policy warmed up on train
  clips, exactly the headline configuration;
* **frozen** — first frame dense, detections then frozen for the clip (the
  no-mechanism baseline BlockCopy must beat).

Reported per mode: CityPersons MR on the final annotated frame of each
eval clip (``eval_mr.py``, reference protocol ``Pedestron/README.md:64``)
and per-frame detection agreement vs dense (greedy-IoU F1 @ 0.5).

Additionally the two accuracy-relevant head lowerings are A/B'd on
*quality* (they were A/B'd on speed in r4): ``HEAD_BLOCKED_FINAL`` and
``HEAD_FUSED_BRANCH_CONV`` each re-run with the flag off (fresh stepper =
fresh trace, so the module-global flip is honored — the flags are plain
Python conditionals inside the stepper trace, not inner-jit captures).

Run on TPU:  python tools/validate_detection.py --out VALIDATION_det_t03.json
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

H, W = 512, 1024
CLIP_LEN = 10
BS = 128


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def _iou_matrix(a, b):
    """a (N,4), b (M,4) xyxy -> (N, M) IoU."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    ax1, ay1, ax2, ay2 = a[:, 0, None], a[:, 1, None], a[:, 2, None], a[:, 3, None]
    bx1, by1, bx2, by2 = b[None, :, 0], b[None, :, 1], b[None, :, 2], b[None, :, 3]
    iw = np.maximum(0, np.minimum(ax2, bx2) - np.maximum(ax1, bx1))
    ih = np.maximum(0, np.minimum(ay2, by2) - np.maximum(ay1, by1))
    inter = iw * ih
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    return inter / np.maximum(area_a + area_b - inter, 1e-9)


def f1_vs(dense, test, iou_thr=0.5, score_thr=0.3):
    """Greedy-IoU F1 of ``test`` boxes against ``dense`` boxes (both
    (N,5) xyxy+score).  1.0 when both empty."""
    d = dense[dense[:, 4] >= score_thr][:, :4]
    t = test[test[:, 4] >= score_thr][:, :4]
    if len(d) == 0 and len(t) == 0:
        return 1.0
    iou = _iou_matrix(d, t)
    tp = 0
    used = np.zeros(len(t), bool)
    for i in np.argsort(-dense[dense[:, 4] >= score_thr][:, 4]):
        j = -1
        best = iou_thr
        for k in range(len(t)):
            if not used[k] and iou[i, k] >= best:
                best, j = iou[i, k], k
        if j >= 0:
            used[j] = True
            tp += 1
    return 2.0 * tp / max(len(d) + len(t), 1)


# ---------------------------------------------------------------------------


def train_csp(csp_cfg, iters, seed=7):
    """Offline-train a CSP on the synthetic blob distribution (train split =
    different seed space than the eval clips)."""
    from blockcopy_tpu.models.csp import init_csp
    from blockcopy_tpu.tasks.detection import train as T
    from blockcopy_tpu.tasks.detection.eval import SyntheticDetClipDataset

    ds = SyntheticDetClipDataset(64, CLIP_LEN, H, W, seed=10_000)
    params = init_csp(jax.random.PRNGKey(seed), csp_cfg)
    # Short-run training regime, tuned by a measured lr sweep (r5):
    # * cls weight 1.0 (reference's 0.01 assumes 160k-iter schedules; at
    #   0.01 a few-hundred-iter run stays at the background prior — max
    #   sigmoid center score 0.0096, flat, zero detections = vacuous MR);
    # * lr 2e-4 / warmup 50 @0.1: converges in ~150 iters (loss 0.01,
    #   probe peak score 0.90, localized).  lr 1e-3 OSCILLATES and
    #   periodically collapses the heatmap to the background constant
    #   (measured trajectory: max score 0.58@40 -> 0.18@80 -> 0.85@160 ->
    #   0.11@200) — the single-pixel-positive focal loss at batch 1 is
    #   unstable at that step size.
    tcfg = T.TrainConfig(lr=2e-4, warmup_iters=50, warmup_ratio=0.1,
                         iters_per_epoch=max(iters, 1), lr_steps=(),
                         loss_weights=(1.0, 1.0, 0.1))
    state = T.init_train_state(params, tcfg)
    step = jax.jit(T.make_train_step(csp_cfg, tcfg), donate_argnums=(0,))
    rs = np.random.RandomState(seed)
    t0 = time.time()
    loss_first = loss_last = None
    for i in range(iters):
        ci = int(rs.randint(0, len(ds)))
        t = int(rs.randint(0, CLIP_LEN))
        clip, _, _ = ds[ci]
        frame = clip[t]
        boxes = np.array([(x, y, x + w, y + h)
                          for x, y, w, h in ds._boxes(ci, t)], np.float32)
        pos, scale, offset = T.calc_gt_center(boxes, None, (H, W))
        maps = (jnp.asarray(pos)[None], jnp.asarray(scale)[None],
                jnp.asarray(offset)[None])
        state, losses = step(state, jnp.asarray(frame)[None], maps)
        if i == 0:
            loss_first = float(losses["loss_total"])
        if i == iters - 1:
            loss_last = float(losses["loss_total"])
    # Live params, NOT the mean-teacher EMA: at alpha 0.999 the teacher
    # still carries 0.999^iters (~55-67% for 400-600 iters) of the RANDOM
    # INIT — measured: EMA max center score 0.018 spatially flat while the
    # student's training loss was 0.018, i.e. the student learned and the
    # teacher was noise.  The reference's 160k-iter schedule is the regime
    # where EMA evaluation makes sense.
    return state["params"], {
        "iters": iters, "loss_first": round(loss_first, 4),
        "loss_last": round(loss_last, 4),
        "train_seconds": round(time.time() - t0, 1)}


def build_stepper(params_bf16, csp_cfg, target, seed=1):
    from blockcopy_tpu.core.stepper import StepperConfig
    from blockcopy_tpu.tasks.detection.stepper import DetectionStepper

    gh, gw = H // BS, W // BS
    capacity = max(1, int(round(target * gh * gw)))
    scfg = StepperConfig(block_size=BS, block_target=target,
                         train_interval=4, num_classes=1,
                         policy_arch="fast")
    stepper = DetectionStepper(csp_cfg, scfg, (1, H, W, 3), capacity,
                               dtype=jnp.bfloat16)
    state = stepper.init_state(params_bf16, jax.random.PRNGKey(seed))
    first = jax.jit(stepper.first_step, donate_argnums=(1,))
    step = jax.jit(stepper.step, donate_argnums=(1,))
    return stepper, state, first, step


def fetch(state, csp_cfg):
    """On-device fixed-size dets -> (N,5) numpy xyxy+score."""
    dets = np.asarray(state["dets"])
    valid = np.asarray(state["valid"]).astype(bool)
    return dets[valid].astype(np.float32)


def dets_to_coco(arr, image_id):
    out = []
    for x1, y1, x2, y2, s in arr:
        out.append({"image_id": image_id, "category_id": 1,
                    "bbox": [float(x1), float(y1), float(x2 - x1),
                             float(y2 - y1)],
                    "height": float(y2 - y1), "score": float(s)})
    return out


def run_blockcopy_mode(params, csp_cfg, ds_warm, ds_eval, dense_per_clip,
                       target, seed=1):
    """Warm the online policy on train clips, then evaluate: returns
    (per-frame F1 vs dense, final-frame COCO dets, mean exec rate)."""
    stepper, state, first, step = build_stepper(params, csp_cfg, target,
                                                seed)
    for ci in range(len(ds_warm)):
        clip, _, _ = ds_warm[ci]
        state = stepper.reset_temporal(state)
        for t, f in enumerate(clip):
            fn = first if t == 0 else step
            state = fn(params, state, jnp.asarray(f, jnp.bfloat16)[None])
    jax.block_until_ready(state["dets"])

    f1s, coco, rates = [], [], []
    for ci in range(len(ds_eval)):
        clip, _, meta = ds_eval[ci]
        state = stepper.reset_temporal(state)
        for t, f in enumerate(clip):
            fn = first if t == 0 else step
            state = fn(params, state, jnp.asarray(f, jnp.bfloat16)[None])
            if t >= 2:
                f1s.append(f1_vs(dense_per_clip[ci][t], fetch(state,
                                                              csp_cfg)))
                rates.append(float(np.asarray(state["prev_grid"]).mean()))
        coco.extend(dets_to_coco(fetch(state, csp_cfg), meta["image_id"]))
    return f1s, coco, float(np.mean(rates))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=float, default=0.3)
    ap.add_argument("--train-iters", type=int, default=400)
    ap.add_argument("--warmup-clips", type=int, default=30)
    ap.add_argument("--eval-clips", type=int, default=8)
    ap.add_argument("--skip-flag-ab", action="store_true")
    ap.add_argument("--out", type=str, default="VALIDATION_det_t03.json")
    args = ap.parse_args()

    from blockcopy_tpu.models import csp as cspmod
    from blockcopy_tpu.models.csp import CSPConfig, init_csp
    from blockcopy_tpu.tasks.detection.eval import SyntheticDetClipDataset
    from blockcopy_tpu.tasks.detection.eval_mr import CityPersonsMREvaluator

    csp_cfg = CSPConfig()
    params_f32, train_info = train_csp(csp_cfg, args.train_iters)
    print("trained:", json.dumps(train_info), flush=True)
    # cast to the shipped bf16 parameter dtypes
    ref = init_csp(jax.random.PRNGKey(0), csp_cfg, dtype=jnp.bfloat16)
    params = jax.tree.map(lambda t, r: t.astype(r.dtype), params_f32, ref)

    ds_warm = SyntheticDetClipDataset(args.warmup_clips, CLIP_LEN, H, W,
                                      seed=500)
    ds_eval = SyntheticDetClipDataset(args.eval_clips, CLIP_LEN, H, W,
                                      seed=0)
    evaluator = CityPersonsMREvaluator(ds_eval.coco_gt())

    # ---- dense reference: the all-exec first-frame program, every frame
    stepper, state, first, _ = build_stepper(params, csp_cfg, args.target)
    dense_per_clip, dense_coco = [], []
    for ci in range(len(ds_eval)):
        clip, _, meta = ds_eval[ci]
        per = []
        state = stepper.reset_temporal(state)
        for f in clip:
            state = first(params, state, jnp.asarray(f, jnp.bfloat16)[None])
            per.append(fetch(state, csp_cfg))
        dense_per_clip.append(per)
        dense_coco.extend(dets_to_coco(per[-1], meta["image_id"]))

    results = {"geometry": f"{H}x{W} bs{BS}", "target": args.target,
               "train": train_info,
               "warmup_clips": args.warmup_clips,
               "eval_clips": args.eval_clips, "clip_len": CLIP_LEN,
               "modes": {}}

    results["modes"]["dense"] = {
        "mr": evaluator.evaluate(dense_coco),
        "agreement_f1_vs_dense": 1.0,
    }

    # ---- frozen baseline: frame-0 detections held for the whole clip
    froz_f1, froz_coco = [], []
    for ci in range(len(ds_eval)):
        clip, _, meta = ds_eval[ci]
        for t in range(2, CLIP_LEN):
            froz_f1.append(f1_vs(dense_per_clip[ci][t],
                                 dense_per_clip[ci][0]))
        froz_coco.extend(dets_to_coco(dense_per_clip[ci][0],
                                      meta["image_id"]))
    results["modes"]["frozen"] = {
        "mr": evaluator.evaluate(froz_coco),
        "agreement_f1_vs_dense": float(np.mean(froz_f1)),
    }

    # ---- blockcopy at shipped defaults
    f1s, coco, rate = run_blockcopy_mode(params, csp_cfg, ds_warm, ds_eval,
                                         dense_per_clip, args.target)
    results["modes"]["blockcopy"] = {
        "mr": evaluator.evaluate(coco),
        "agreement_f1_vs_dense": float(np.mean(f1s)),
        "exec_rate_eval": rate,
    }
    print(json.dumps(results["modes"], indent=2), flush=True)

    # ---- quality A/B of the two accuracy-relevant head lowerings
    if not args.skip_flag_ab:
        for flag in ("HEAD_BLOCKED_FINAL", "HEAD_FUSED_BRANCH_CONV"):
            prev = getattr(cspmod, flag)
            setattr(cspmod, flag, False)
            try:
                f1s, coco, rate = run_blockcopy_mode(
                    params, csp_cfg, ds_warm, ds_eval, dense_per_clip,
                    args.target)
            finally:
                setattr(cspmod, flag, prev)
            results["modes"][f"blockcopy_{flag}=0"] = {
                "mr": evaluator.evaluate(coco),
                "agreement_f1_vs_dense": float(np.mean(f1s)),
                "exec_rate_eval": rate,
            }
            print(flag, "=0 done", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
