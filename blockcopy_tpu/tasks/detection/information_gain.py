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
