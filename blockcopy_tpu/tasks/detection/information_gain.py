"""Detection information gain: IoU-based instance-mask reward.

Port of the reference ``blockcopy/blockcopy/policy/information_gain.py:43-160``:
outputs are per-class numpy box lists; the output representation rasterizes
score-weighted instance masks; the gain greedily IoU-matches boxes between
consecutive frames and paints (1 - best_iou) * score for matched pairs plus
the full score for unmatched previous boxes.  The matching is tiny, irregular
host work (tens of boxes) — it stays on the host, and only the rasterized
reward map ships to the device.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

SUBSAMPLE = 2


def get_iou(bbox1, bbox2) -> float:
    ax1, ay1, ax2, ay2 = bbox1
    bx1, by1, bx2, by2 = bbox2
    x_left = max(ax1, bx1)
    y_top = max(ay1, by1)
    x_right = min(ax2, bx2)
    y_bottom = min(ay2, by2)
    if x_right < x_left or y_bottom < y_top:
        return 0.0
    inter = (x_right - x_left) * (y_bottom - y_top)
    a1 = (ax2 - ax1) * (ay2 - ay1)
    a2 = (bx2 - bx1) * (by2 - by1)
    return inter / float(max(a1 + a2 - inter, 1e-10))


def build_instance_mask(bbox_results: List[List[np.ndarray]], size,
                        dtype=np.float32) -> np.ndarray:
    """(N, H, W, C) score-weighted box mask (reference
    ``information_gain.py:56-66``)."""
    n, h, w, c = size
    mask = np.zeros((n, h, w, c), dtype)
    for cls in range(c):
        arr = bbox_results[0][cls]
        for row in arr:
            x1, y1, x2, y2 = row[:4].astype(np.int32)
            score = row[4]
            region = mask[0, y1:y2, x1:x2, cls]
            mask[0, y1:y2, x1:x2, cls] = np.maximum(region, score)
    return mask


def build_instance_mask_iou_gain(bbox_results, bbox_results_prev, size,
                                 subsample=SUBSAMPLE) -> np.ndarray:
    """(N, H, W, 1) gain map (reference ``information_gain.py:68-108``)."""
    assert len(bbox_results) == 1, "only supports batch size 1"
    n, h, w, c = size
    hs, ws = h // subsample, w // subsample
    mask = np.zeros((n, hs, ws, 1), np.float32)
    for cls in range(c):
        cur = bbox_results[0][cls]
        prev = bbox_results_prev[0][cls]
        cur_boxes = (cur[:, :4] / subsample).astype(np.int32)
        prev_boxes = (prev[:, :4] / subsample).astype(np.int32)
        cur_scores = cur[:, 4]
        prev_scores = prev[:, 4]
        matched = set()
        for bbox, score in zip(cur_boxes, cur_scores):
            best_iou, best_j = 0.0, None
            for j, pb in enumerate(prev_boxes):
                if pb[0] >= pb[2] or pb[1] >= pb[3]:
                    continue
                iou = get_iou(bbox, pb)
                if iou > best_iou:
                    best_iou, best_j = iou, j
            matched.add(best_j)
            ig = 1.0 - best_iou
            x1, y1, x2, y2 = bbox
            mask[0, y1:y2, x1:x2, 0] = np.maximum(
                mask[0, y1:y2, x1:x2, 0], ig * float(score))
            if best_j is not None:
                x1, y1, x2, y2 = prev_boxes[best_j]
                mask[0, y1:y2, x1:x2, 0] = np.maximum(
                    mask[0, y1:y2, x1:x2, 0], ig * float(prev_scores[best_j]))
        for j in range(len(prev_boxes)):
            if j not in matched:
                x1, y1, x2, y2 = prev_boxes[j]
                mask[0, y1:y2, x1:x2, 0] = np.maximum(
                    mask[0, y1:y2, x1:x2, 0], float(prev_scores[j]))
    # upsample back to full resolution (nearest)
    mask = mask.repeat(subsample, axis=1).repeat(subsample, axis=2)
    return mask


# ---------------------------------------------------------------------------
# Jittable fixed-size variants (detection speed mode): operate on the
# fixed-size decode output (dets (K, 5), labels (K,), valid (K,)) entirely
# on-device, so the whole detection frame step compiles into one program.
# Semantics match the host versions above (which match the reference);
# the only deliberate difference: the policy-input mask is painted directly
# at the policy resolution with scaled integer boxes instead of full-res
# painting + nearest downsample (box edges may differ by <= 1 px).
# ---------------------------------------------------------------------------


def paint_boxes_max(boxes, weights, h: int, w: int, chunk: int = 8):
    """Max-paint axis-aligned boxes: (K, 4) int32 [x1,y1,x2,y2) + (K,)
    weights -> (h, w) float32.  Chunked scan keeps the indicator tensor at
    (chunk, h, w) so memory stays bounded for any K."""
    import jax

    k = boxes.shape[0]
    pad = (-k) % chunk
    if pad:
        boxes = jnp.concatenate(
            [boxes, jnp.zeros((pad, 4), boxes.dtype)])
        weights = jnp.concatenate(
            [weights, jnp.zeros((pad,), weights.dtype)])
    boxes = boxes.reshape(-1, chunk, 4)
    weights = weights.reshape(-1, chunk).astype(jnp.float32)
    ys = jnp.arange(h, dtype=jnp.int32)
    xs = jnp.arange(w, dtype=jnp.int32)

    def step(carry, bw):
        b, wgt = bw
        row = (ys[None, :] >= b[:, 1:2]) & (ys[None, :] < b[:, 3:4])
        col = (xs[None, :] >= b[:, 0:1]) & (xs[None, :] < b[:, 2:3])
        m = row[:, :, None] & col[:, None, :]          # (chunk, h, w)
        vals = jnp.where(m, wgt[:, None, None], 0.0).max(0)
        return jnp.maximum(carry, vals), None

    out, _ = jax.lax.scan(step, jnp.zeros((h, w), jnp.float32),
                          (boxes, weights))
    return out


def _iou_matrix_plain(a, b):
    """Reference ``get_iou`` math (float, no +1 extents) pairwise:
    a (K, 4), b (Kp, 4) -> (K, Kp)."""
    lx = jnp.maximum(a[:, None, 0], b[None, :, 0])
    ly = jnp.maximum(a[:, None, 1], b[None, :, 1])
    rx = jnp.minimum(a[:, None, 2], b[None, :, 2])
    ry = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(rx - lx, 0.0) * jnp.maximum(ry - ly, 0.0)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-10)
    return inter / union


def iou_gain_fixed(dets, labels, valid, dets_prev, labels_prev, valid_prev,
                   hw, subsample: int = SUBSAMPLE):
    """Jittable ``build_instance_mask_iou_gain`` over fixed-size det arrays.
    Returns (1, h//subsample, w//subsample, 1) float32 (the stepper's reward
    pooling is max-based, so the nearest-upsample of the host version is
    unnecessary)."""
    h, w = hw
    hs, ws = h // subsample, w // subsample
    cb = (dets[:, :4] / subsample).astype(jnp.int32)
    pb = (dets_prev[:, :4] / subsample).astype(jnp.int32)
    cs = dets[:, 4]
    ps = dets_prev[:, 4]
    kp = pb.shape[0]

    # degenerate previous boxes cannot match (reference skips them)
    p_ok = valid_prev & (pb[:, 0] < pb[:, 2]) & (pb[:, 1] < pb[:, 3])
    iou = _iou_matrix_plain(cb.astype(jnp.float32), pb.astype(jnp.float32))
    pair_ok = (valid[:, None] & p_ok[None, :]
               & (labels[:, None] == labels_prev[None, :]))
    iou = jnp.where(pair_ok, iou, 0.0)
    best_iou = iou.max(axis=1)
    best_j = iou.argmax(axis=1)
    has_match = best_iou > 0.0            # reference: strictly-better-than-0
    ig = 1.0 - best_iou                   # (K,)

    w_cur = jnp.where(valid, ig * cs, 0.0)
    onehot = ((best_j[:, None] == jnp.arange(kp)[None, :])
              & has_match[:, None] & valid[:, None])       # (K, Kp)
    ig_to_prev = jnp.where(onehot, ig[:, None], 0.0).max(axis=0)
    matched = onehot.any(axis=0)
    w_prev = jnp.where(valid_prev,
                       jnp.where(matched, ig_to_prev * ps, ps), 0.0)

    boxes = jnp.concatenate([cb, pb])
    weights = jnp.concatenate([w_cur, w_prev])
    mask = paint_boxes_max(boxes, weights, hs, ws)
    return mask[None, :, :, None]


def instance_mask_fixed(dets, labels, valid, hw, num_fg_classes: int,
                        scale: float = 1.0):
    """Jittable ``build_instance_mask``: (1, h, w, C) score-weighted box
    mask at an arbitrary scale (boxes multiplied by ``scale`` then
    truncated, as the reference truncates at full resolution)."""
    h, w = hw
    boxes = (dets[:, :4] * scale).astype(jnp.int32)
    maps = []
    for c in range(num_fg_classes):
        wgt = jnp.where(valid & (labels == c), dets[:, 4], 0.0)
        maps.append(paint_boxes_max(boxes, wgt, h, w))
    return jnp.stack(maps, -1)[None]


class DetectionInformationGain:
    """Strategy object plugged into ``PolicyTrainRL`` (box lists are host
    data; the device only sees the rasterized maps)."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes

    def get_output_repr(self, policy_meta: Dict):
        bbox_results = policy_meta["outputs"]
        n, h, w, _ = policy_meta["inputs"].shape
        mask = build_instance_mask(bbox_results,
                                   (n, h, w, self.num_classes))
        return jnp.asarray(mask)

    def compute(self, policy_meta: Dict):
        n, h, w, _ = policy_meta["inputs"].shape
        ig = build_instance_mask_iou_gain(
            policy_meta["outputs"], policy_meta["outputs_prev"],
            (n, h, w, self.num_classes),
        )
        return jnp.asarray(ig)
