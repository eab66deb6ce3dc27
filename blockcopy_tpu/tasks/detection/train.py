"""Offline CSP detector training (the reference's inherited training stack,
SURVEY.md §3.5): CSP losses against dataset-generated gaussian
center/scale/offset ground-truth maps, Adam optimizer with step LR schedule
and constant warmup, and a mean-teacher EMA of the weights.

References: losses ``Pedestron/mmdet/models/anchor_heads/csp_head.py:332-416``,
GT maps ``mmdet/datasets/coco_csp_ori_clip.py:414-467``, runner
``mmdet/core/my_mmcv/runner/mean_teacher_runner.py`` + config
``csp_r50_clip_blockcopy_030.py:127-159`` (Adam lr 2e-4, EMA alpha 0.999,
steps [110, 160], warmup 500 iters at 1/3).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from blockcopy_tpu.core.blocked import ExecCtx
from blockcopy_tpu.models.csp import CSPConfig, csp_apply

INF = 1e8


# ---------------------------------------------------------------------------
# ground-truth map generation (host, numpy — per-sample preprocessing)
# ---------------------------------------------------------------------------


def _gaussian_1d(kernel: int) -> np.ndarray:
    sigma = ((kernel - 1) * 0.5 - 1) * 0.3 + 0.8
    s = 2 * sigma ** 2
    dx = np.exp(-np.square(np.arange(kernel) - int(kernel / 2)) / s)
    return dx.reshape(-1, 1)


def calc_gt_center(gts: np.ndarray, igs: Optional[np.ndarray],
                   image_shape: Tuple[int, int], radius: int = 8,
                   stride: int = 4, regress_range=(-1, INF)):
    """CSP ground-truth maps at ``stride`` resolution.

    gts / igs: (N, 4) xyxy pixel boxes (ignore regions).  Returns HWC maps:
    pos (h, w, 3): [gauss, keep-mask (0 inside ignore regions), centers];
    scale (h, w, 2): [log-height at center neighborhood, mask];
    offset (h, w, 3): [y-offset, x-offset, mask].
    """
    radius = int(radius / stride)
    h, w = int(image_shape[0] / stride), int(image_shape[1] / stride)
    pos = np.zeros((h, w, 3), np.float32)
    scale = np.zeros((h, w, 2), np.float32)
    offset = np.zeros((h, w, 3), np.float32)
    pos[:, :, 1] = 1.0
    if igs is not None and len(igs) > 0:
        ig = igs / stride
        for x1, y1, x2, y2 in ig:
            pos[int(y1):int(np.ceil(y2)), int(x1):int(np.ceil(x2)), 1] = 0
    if len(gts) == 0:
        return pos, scale, offset
    heights = gts[:, 3] - gts[:, 1]
    keep = (heights >= regress_range[0]) & (heights <= regress_range[1])
    gts = gts[keep] / stride
    for x1f, y1f, x2f, y2f in gts:
        x1, y1 = int(np.ceil(x1f)), int(np.ceil(y1f))
        x2, y2 = int(x2f), int(y2f)
        if x2 <= x1 or y2 <= y1:
            continue
        c_x, c_y = int((x1f + x2f) / 2), int((y1f + y2f) / 2)
        gau = _gaussian_1d(y2 - y1) @ _gaussian_1d(x2 - x1).T
        pos[y1:y2, x1:x2, 0] = np.maximum(pos[y1:y2, x1:x2, 0], gau)
        pos[y1:y2, x1:x2, 1] = 1
        pos[c_y, c_x, 2] = 1
        ys, ye = max(c_y - radius, 0), min(c_y + radius + 1, h)
        xs, xe = max(c_x - radius, 0), min(c_x + radius + 1, w)
        scale[ys:ye, xs:xe, 0] = np.log(y2f - y1f)
        scale[ys:ye, xs:xe, 1] = 1
        offset[c_y, c_x, 0] = (y1f + y2f) / 2 - c_y - 0.5
        offset[c_y, c_x, 1] = (x1f + x2f) / 2 - c_x - 0.5
        offset[c_y, c_x, 2] = 1
    return pos, scale, offset


# ---------------------------------------------------------------------------
# losses (jnp; NHWC maps)
# ---------------------------------------------------------------------------


def _smooth_l1(x, y):
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def cls_pos_loss(cls_logits: jax.Array, pos_map: jax.Array) -> jax.Array:
    """Center classification: BCE with CSP's hand-rolled focal weights
    (``csp_head.py:332-364``)."""
    logits = cls_logits[..., 0]
    gauss, keep, centers = (pos_map[..., 0], pos_map[..., 1], pos_map[..., 2])
    log_loss = jnp.maximum(logits, 0) - logits * centers + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    pred = jax.nn.sigmoid(logits)
    positives = centers
    negatives = keep - centers
    fore = positives * (1.0 - pred) ** 2
    back = negatives * ((1.0 - gauss) ** 4.0) * pred ** 2
    focal = fore + back
    return jnp.sum(focal * log_loss) / jnp.maximum(1.0, jnp.sum(centers))


def reg_pos_loss(h_pred: jax.Array, scale_map: jax.Array) -> jax.Array:
    """Scale regression: masked smooth-L1 of the height ratio
    (``csp_head.py:367-381``).

    Positions whose log-height target is ~0 (a box crop-clipped to exactly
    the stride height) are masked out: dividing by them produces ~1e10
    ratios and one such sample destroys training."""
    target = scale_map[..., 0]
    safe = jnp.abs(target) > 1e-6
    mask = scale_map[..., 1] * safe.astype(scale_map.dtype)
    denom = jnp.where(safe, target, 1.0)
    ratio_pred = h_pred[..., 0] / denom
    ratio_tgt = jnp.where(safe, 1.0, 0.0)
    l1 = mask * _smooth_l1(ratio_pred, ratio_tgt)
    return jnp.sum(l1) / jnp.maximum(1.0, jnp.sum(mask))


def offset_pos_loss(offset_pred: jax.Array, offset_map: jax.Array) -> jax.Array:
    """Offset regression: masked smooth-L1 (``csp_head.py:402-416``)."""
    mask = offset_map[..., 2:3]
    l1 = mask * _smooth_l1(offset_pred, offset_map[..., :2])
    return jnp.sum(l1) / jnp.maximum(1.0, jnp.sum(offset_map[..., 2]))


def csp_loss(outs, gt_maps, weights=(0.01, 1.0, 0.1)) -> Dict[str, jax.Array]:
    """Weighted CSP loss dict (weights from
    ``csp_r50_clip_blockcopy_030.py:44-52``)."""
    cls_s, bbox_p, off_p = outs
    pos_map, scale_map, offset_map = gt_maps
    return {
        "loss_cls": cls_pos_loss(cls_s, pos_map) * weights[0],
        "loss_bbox": reg_pos_loss(bbox_p, scale_map) * weights[1],
        "loss_offset": offset_pos_loss(off_p, offset_map) * weights[2],
    }


# ---------------------------------------------------------------------------
# trainer: Adam + step LR + mean-teacher EMA
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 2e-4
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    ema_alpha: float = 0.999
    warmup_iters: int = 500
    warmup_ratio: float = 1.0 / 3.0
    lr_steps: Tuple[int, ...] = (110, 160)  # epochs
    iters_per_epoch: int = 1000
    # (cls, bbox, offset) loss weights.  Default = the reference's
    # (csp_head.py:332-416 via its loss_cls/bbox/offset configs).  The
    # 0.01 cls weight assumes epochs of training over a large dataset;
    # short in-process synthetic runs (tools/validate_detection.py) can
    # up-weight cls so the center heatmap becomes discriminative within
    # hundreds of iterations instead of collapsing to the background
    # prior (~1 positive per 32k positions).
    loss_weights: Tuple[float, float, float] = (0.01, 1.0, 0.1)


def lr_at(step, cfg: TrainConfig):
    epoch = step // cfg.iters_per_epoch
    lr = cfg.lr
    for s in cfg.lr_steps:
        lr = jnp.where(epoch >= s, lr * 0.1, lr)
    warm = cfg.lr * cfg.warmup_ratio
    return jnp.where(step < cfg.warmup_iters, warm, lr)


def init_train_state(params, cfg: TrainConfig):
    zeros = lambda: jax.tree.map(jnp.zeros_like, params)
    return {
        "params": params,
        # teacher starts as a COPY (aliased buffers would be donated twice
        # when the train step donates the whole state)
        "ema_params": jax.tree.map(lambda x: jnp.array(x, copy=True), params),
        "m": zeros(),
        "v": zeros(),
        "step": jnp.int32(0),
    }


def make_train_step(model_cfg: CSPConfig, cfg: TrainConfig):
    """Returns a jittable ``train_step(state, images, gt_maps) ->
    (state, loss_dict)`` (dense training, like the reference's offline
    phase)."""

    def loss_fn(params, images, gt_maps):
        outs = csp_apply(params, images, ExecCtx.dense(), model_cfg)
        losses = csp_loss(outs, gt_maps, weights=cfg.loss_weights)
        return sum(losses.values()), losses

    def train_step(state, images, gt_maps):
        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], images, gt_maps
        )
        step = state["step"] + 1
        lr = lr_at(step, cfg)
        b1, b2 = cfg.betas

        def adam(p, g, m, v):
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            mhat = m / (1 - b1 ** step.astype(jnp.float32))
            vhat = v / (1 - b2 ** step.astype(jnp.float32))
            return p - lr * mhat / (jnp.sqrt(vhat) + cfg.eps), m, v

        out = jax.tree.map(adam, state["params"], grads, state["m"],
                           state["v"])
        is_triple = lambda t: isinstance(t, tuple)
        new_p = jax.tree.map(lambda t: t[0], out, is_leaf=is_triple)
        new_m = jax.tree.map(lambda t: t[1], out, is_leaf=is_triple)
        new_v = jax.tree.map(lambda t: t[2], out, is_leaf=is_triple)
        # mean-teacher EMA (reference mean_teacher_runner alpha=0.999)
        a = cfg.ema_alpha
        new_ema = jax.tree.map(lambda e, p: a * e + (1 - a) * p,
                               state["ema_params"], new_p)
        new_state = {"params": new_p, "ema_params": new_ema, "m": new_m,
                     "v": new_v, "step": step}
        losses["loss_total"] = loss
        return new_state, losses

    return train_step
