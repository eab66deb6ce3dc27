"""CSP pedestrian detector (Center-and-Scale Prediction) + BlockCopy engine.

TPU-native port of the reference detection stack
(``Pedestron/mmdet/models/detectors/csp_blockcopy.py:15-95``,
``csp.py``, ``necks/csp_neck.py:37-101``, ``anchor_heads/csp_head.py``):

* mmdet-style ResNet-50 backbone with per-stage strides (1,2,2,1) and
  dilations (1,1,1,2), out_indices (1,2,3) ("pytorch" style: stride on the
  bottleneck's 3x3) — config ``csp_r50_clip_blockcopy_030.py:19-28``;
* CSPNeck: three transposed-conv upsampling heads (512/1024/2048 -> 256 at
  stride 4) + per-branch L2Norm, channel concat -> 768;
* CSPHead: per-branch ConvModule (3x3 conv + GN(32) + ReLU) running blocked,
  then combined to dense (the reference calls ``blockcopy.to_tensor`` after
  every ConvModule, ``csp_head.py:135-151``), final dense 3x3 convs for
  center/scale/offset maps;
* box decode ``csp_height2bbox`` (``mmdet/core/bbox/transforms.py:182-212``)
  + fixed-size multiclass NMS (replaces nms_cuda).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from blockcopy_tpu.core import blocked as _blockedmod
from blockcopy_tpu.core import grid as gridlib
from blockcopy_tpu.core.blocked import ExecCtx, split_dense
from blockcopy_tpu.ops import layers as L
from blockcopy_tpu.ops.nms import multiclass_nms_fixed
from blockcopy_tpu.models.swiftnet import (
    _bn_init,
    _bottleneck_init,
    _conv_init,
)
from blockcopy_tpu.utils.flops import FlopsTracker, policy_net_macs
from blockcopy_tpu.utils.profiler import timings


# Run the head's final 3x3 prediction convs BLOCKED (over executed blocks,
# halo from the branch-feat strip canvases) instead of dense — see
# ``csp_head``.  Default ON: full-program interleaved A/B on the detection
# bench (r4, tools/ab_flag_detection.py) measured 134.7 vs 92.8 FPS max
# (+45%, on>off in 8/8 windows).  The reference-exact dense tail stays one
# env var away (BLOCKCOPY_TPU_HEAD_BLOCKED_FINAL=0); divergence is bounded
# to the 1-px borders of skipped blocks (tests/test_detection_stepper.py).
HEAD_BLOCKED_FINAL = os.environ.get(
    "BLOCKCOPY_TPU_HEAD_BLOCKED_FINAL", "1") == "1"

# Run the three branch ConvModules' first convs as ONE conv with the
# kernels concatenated along the output-channel axis — mathematically
# identical per channel (each output channel is the same dot product), but
# the (K, 32, 32, 768) blocked input is halo-exchanged and read ONCE
# instead of three times (three separate strip-canvas stores + gathers +
# ~60 MB input re-reads per frame in the r4 trace: copies 2771/2778/2779).
# Only applies to ``stacked_convs == 1`` (the shipped CSP config) where all
# three branches read the same neck output.  See ``csp_head``.
# Default ON: full-program interleaved A/B (tools/ab_flag_detection.py,
# 8x150-frame fenced windows) on 142.1 max / 141.8 median FPS vs off
# 134.8 / 134.3 — +5.5%, on>off in 8/8 windows.  Exactness vs the unfused
# path: tests/test_detection_stepper.py::TestHeadFusedBranchConv.
HEAD_FUSED_BRANCH_CONV = os.environ.get(
    "BLOCKCOPY_TPU_HEAD_FUSED_BRANCH_CONV", "1") == "1"

# Top-k lowering of the decode's nms_pre candidate selection
# (``get_bboxes_single``'s ``max_scores.topk(nms_pre)``, reference
# ``csp_head.py:252-258``).  'sort' = ``lax.top_k`` (lowers to a full
# variadic sort of all H/4*W/4 = 131072 positions — the r5 device trace
# attributes 0.112 ms/frame to it); 'approx' = ``lax.approx_max_k`` with
# ``recall_target=1.0`` — the TPU PartialReduce custom call (per-window
# maxima, then an exact top-k over the reduced set), which is
# value-exact at recall 1.0.  Caveat: when several candidates TIE exactly
# at the k-th score, the two lowerings may select a different (equally
# valid) index subset; ``lax.top_k`` breaks ties to the lowest index.
# Resolved eagerly in ``csp_decode`` and passed as a static jit argument
# (same cache-key discipline as NMS_IMPL).  Default 'approx' (r5):
# full-program A/B (tools/ab_flag_detection.py, 8x150-frame interleaved
# fenced windows) measured 153.36 vs 152.39 FPS max / 152.99 vs 151.65
# median (+0.6%/+0.9%).  A boundary tie only matters when it sits at rank
# nms_pre with score > score_thr — candidates below score_thr are dropped
# by the NMS validity mask either way; BLOCKCOPY_TPU_TOPK=sort restores
# lowest-index tie-break exactly.
TOPK_IMPL = os.environ.get("BLOCKCOPY_TPU_TOPK", "approx")

# Compute the decode's candidate point coordinates arithmetically from the
# top-k indices (x = i % W, y = i // W) instead of materializing the full
# (H/4*W/4, 2) points array and gathering rows from it.  Bit-exact: the
# flattened iota index is y*W + x by construction, and the identical int32
# products/casts are applied either way.  Removes a (131072, 2) stack, its
# layout copy (r5 trace: copy.2634, 0.048 ms/frame) and the 131072-row
# gather.  Default ON: bit-exact (pinned by
# tests/test_detection.py::test_decode_lean_points_exact) and measured
# +0.9% by full-program A/B (152.53 vs 151.16 FPS max, on>off 8/8
# windows, tools/ab_flag_detection.py).
DECODE_LEAN_POINTS = os.environ.get(
    "BLOCKCOPY_TPU_DECODE_LEAN_POINTS", "1") == "1"


@dataclasses.dataclass(frozen=True)
class CSPConfig:
    depth: int = 50
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    strides: Sequence[int] = (1, 2, 2, 1)
    dilations: Sequence[int] = (1, 1, 1, 2)
    out_indices: Sequence[int] = (1, 2, 3)
    neck_out: int = 256
    head_feat: int = 256
    stacked_convs: int = 1
    num_classes: int = 2           # incl. background, mmdet convention
    head_stride: int = 4
    wh_ratio: float = 0.41
    l2norm_scale: float = 10.0
    gn_groups: int = 32
    # test cfg (csp_r50_clip_blockcopy_030.py:66-71)
    nms_pre: int = 1000
    score_thr: float = 0.1
    nms_iou: float = 0.5
    nms_type: str = "nms"  # 'nms' (on-device) | 'soft_nms' (host rescoring)
    max_per_img: int = 100

    @property
    def cls_out_channels(self) -> int:
        return self.num_classes - 1


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _convT_init(key, k, cin, cout, dtype):
    # xavier-uniform like mmcv (csp_neck.py:48-51)
    fan = k * k * (cin + cout) / 2
    bound = float(np.sqrt(3.0 / fan))
    return {
        "w": jax.random.uniform(key, (k, k, cin, cout), jnp.float32,
                                -bound, bound).astype(dtype),
        "b": jnp.zeros((cout,), dtype),
    }


def _gn_init(c, dtype):
    return {"gamma": jnp.ones((c,), dtype), "beta": jnp.zeros((c,), dtype)}


def init_csp(key, cfg: CSPConfig, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 16)
    # backbone (reuses the bottleneck initializer from swiftnet's resnet)
    bb: Dict = {
        "conv1": _conv_init(ks[0], 7, 7, 3, 64, dtype=dtype),
        "bn1": _bn_init(64, dtype),
    }
    cin = 64
    for stage, (planes, blocks) in enumerate(
        zip((64, 128, 256, 512), cfg.stage_blocks)
    ):
        bkeys = jax.random.split(ks[1 + stage], blocks)
        stage_params = []
        for b in range(blocks):
            s = cfg.strides[stage] if b == 0 else 1
            stage_params.append(_bottleneck_init(bkeys[b], cin, planes, s,
                                                 dtype))
            cin = planes * 4
        bb[f"layer{stage + 1}"] = stage_params
    params: Dict = {"backbone": bb}
    # neck
    params["neck"] = {
        "p3": _convT_init(ks[5], 4, 512, cfg.neck_out, dtype),
        "p4": _convT_init(ks[6], 4, 1024, cfg.neck_out, dtype),
        "p5": _convT_init(ks[7], 4, 2048, cfg.neck_out, dtype),
        "p3_l2": jnp.full((cfg.neck_out,), cfg.l2norm_scale, dtype),
        "p4_l2": jnp.full((cfg.neck_out,), cfg.l2norm_scale, dtype),
        "p5_l2": jnp.full((cfg.neck_out,), cfg.l2norm_scale, dtype),
    }
    # head
    in_ch = cfg.neck_out * 3
    head: Dict = {}
    for branch in ("cls", "reg", "offset"):
        convs = []
        for i in range(cfg.stacked_convs):
            chn = in_ch if i == 0 else cfg.head_feat
            k = jax.random.fold_in(ks[8], hash(branch) % 1000 + i)
            convs.append({
                "conv": {"w": (jax.random.normal(
                    k, (3, 3, chn, cfg.head_feat), jnp.float32
                ) * 0.01).astype(dtype)},
                "gn": _gn_init(cfg.head_feat, jnp.float32),
            })
        head[f"{branch}_convs"] = convs
    bias_cls = float(-np.log((1 - 0.01) / 0.01))  # bias_init_with_prob(0.01)
    head["csp_cls"] = {
        "w": (jax.random.normal(ks[9], (3, 3, cfg.head_feat,
                                        cfg.cls_out_channels), jnp.float32)
              * 0.01).astype(dtype),
        "b": jnp.full((cfg.cls_out_channels,), bias_cls, dtype),
    }
    head["csp_reg"] = {
        "w": (jax.random.normal(ks[10], (3, 3, cfg.head_feat, 1), jnp.float32)
              * 0.01).astype(dtype),
        "b": jnp.zeros((1,), dtype),
    }
    head["csp_offset"] = {
        "w": (jax.random.normal(ks[11], (3, 3, cfg.head_feat, 2), jnp.float32)
              * 0.01).astype(dtype),
        "b": jnp.zeros((2,), dtype),
    }
    head["reg_scale"] = jnp.ones((), jnp.float32)
    head["offset_scale"] = jnp.ones((), jnp.float32)
    params["head"] = head
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _bottleneck_block(ctx, name, x, p, stride, dilation):
    # fused Pallas tail for the eligible (stride-1, dilation-1, identity)
    # blocks — same gate and kernel as the SwiftNet backbone; CSP's dilated
    # layer4 stays on the XLA path
    from blockcopy_tpu.models.swiftnet import maybe_fused_bottleneck

    out = maybe_fused_bottleneck(ctx, name, x, p, stride, dilation=dilation)
    if out is not None:
        return out
    identity = x
    if "downsample" in p:
        identity = L.conv2d(ctx, f"{name}.ds", x, p["downsample"]["conv"]["w"],
                            stride=stride, padding=0)
        identity = L.batch_norm(identity, p["downsample"]["bn"]["scale"],
                                p["downsample"]["bn"]["bias"])
    out = L.conv2d(ctx, f"{name}.conv1", x, p["conv1"]["w"], padding=0)
    out = L.batch_norm(out, p["bn1"]["scale"], p["bn1"]["bias"])
    out = L.relu(out)
    out = L.conv2d(ctx, f"{name}.conv2", out, p["conv2"]["w"], stride=stride,
                   dilation=dilation)
    out = L.batch_norm(out, p["bn2"]["scale"], p["bn2"]["bias"])
    out = L.relu(out)
    out = L.conv2d(ctx, f"{name}.conv3", out, p["conv3"]["w"], padding=0)
    out = L.batch_norm(out, p["bn3"]["scale"], p["bn3"]["bias"])
    out = L.add(out, identity)
    return L.relu(out)


def csp_backbone(params, x, ctx: ExecCtx, cfg: CSPConfig):
    """mmdet ResNet ``forward`` with configurable strides/dilations
    (reference ``mmdet/models/backbones/resnet.py``)."""
    from blockcopy_tpu.models.swiftnet import _stem

    x = _stem(ctx, x, params)
    outs = []
    for stage in range(4):
        for b, p in enumerate(params[f"layer{stage + 1}"]):
            s = cfg.strides[stage] if b == 0 else 1
            x = _bottleneck_block(ctx, f"backbone.layer{stage + 1}.{b}", x, p,
                                  s, cfg.dilations[stage])
        if stage in cfg.out_indices:
            outs.append(x)
    return outs


def _l2norm(x, weight):
    """Channel L2 normalization ×learned per-channel scale
    (reference ``csp_neck.py:85-101``; CHANNELONLY op — per-pixel, blocked
    transparently)."""
    def f(d):
        norm = jnp.sqrt(jnp.sum(
            d.astype(jnp.float32) ** 2, axis=-1, keepdims=True)) + 1e-10
        return (d.astype(jnp.float32) / norm * weight).astype(d.dtype)
    return L.emap(f, x)


def csp_neck(params, feats, ctx: ExecCtx, cfg: CSPConfig):
    p3 = L.conv_transpose2d(ctx, "neck.p3", feats[0], params["p3"]["w"],
                            params["p3"]["b"], stride=2, padding=1)
    p3 = _l2norm(p3, params["p3_l2"])
    p4 = L.conv_transpose2d(ctx, "neck.p4", feats[1], params["p4"]["w"],
                            params["p4"]["b"], stride=4, padding=0)
    p4 = _l2norm(p4, params["p4_l2"])
    p5 = L.conv_transpose2d(ctx, "neck.p5", feats[2], params["p5"]["w"],
                            params["p5"]["b"], stride=4, padding=0)
    p5 = _l2norm(p5, params["p5_l2"])
    return L.concat_channels([p3, p4, p5])


def csp_head(params, x, ctx: ExecCtx, cfg: CSPConfig):
    """Three branches; blocked ConvModules then final prediction convs.

    Returns dense (cls_score, bbox_pred, offset_pred) at stride 4.

    Two lowerings of the tail, selected by ``HEAD_BLOCKED_FINAL``:

    * OFF (reference semantics, ``csp_head.py:135-151``): combine each
      branch to dense after its ConvModule, run the final 3x3 convs dense.
    * ON (TPU lowering, r4 profile-guided): the final convs run BLOCKED
      over executed blocks, with their halo gathered from the branch-feat
      strip canvases — which hold exactly the rows the dense conv would
      read (fresh strips for executed neighbors, previous-frame strips
      otherwise) — and per-map output canvases give the dense maps for
      decode.  This removes three 256-ch dense-canvas round-trips and cuts
      the final convs (C_out 1/1/2: ~3% MXU lane utilization, 1.2 ms/frame
      dense at 1024x2048) to the executed blocks.  Divergence vs dense:
      only the 1-px borders of SKIPPED blocks adjacent to executed ones
      (dense recomputes them with fresh neighbor halo; blocked keeps the
      previous frame's values) — bounded by tests/test_detection_stepper.py.
    """
    blocked_tail = HEAD_BLOCKED_FINAL and not ctx.is_dense \
        and isinstance(x, _blockedmod.BlockPack)
    outs = {}
    branches = ("cls", "reg", "offset")
    if HEAD_FUSED_BRANCH_CONV and cfg.stacked_convs == 1:
        # One conv with output channels [cls | reg | offset]: exact same
        # per-channel math as three separate convs, one halo exchange of
        # the 768-ch input instead of three (see HEAD_FUSED_BRANCH_CONV).
        w_cat = jnp.concatenate(
            [params[f"{b}_convs"][0]["conv"]["w"] for b in branches], axis=-1)
        feat_all = L.conv2d(ctx, "head.branch0", x, w_cat)
        c = cfg.head_feat
        for j, branch in enumerate(branches):
            cm = params[f"{branch}_convs"][0]
            feat = L.emap(
                lambda d, lo=j * c: lax.slice_in_dim(d, lo, lo + c, axis=-1),
                feat_all)
            feat = L.group_norm(feat, cfg.gn_groups, cm["gn"]["gamma"],
                                cm["gn"]["beta"])
            feat = L.relu(feat)
            if not ctx.is_dense and not blocked_tail:
                feat = ctx.store_dense(f"head.{branch}0.dense", feat)
            outs[branch] = feat
    else:
        for branch in branches:
            feat = x
            for i, cm in enumerate(params[f"{branch}_convs"]):
                feat = L.conv2d(ctx, f"head.{branch}{i}", feat,
                                cm["conv"]["w"])
                feat = L.group_norm(feat, cfg.gn_groups, cm["gn"]["gamma"],
                                    cm["gn"]["beta"])
                feat = L.relu(feat)
                # combine to dense after each ConvModule (csp_head.py:135-151)
                if not ctx.is_dense and not blocked_tail:
                    feat = ctx.store_dense(f"head.{branch}{i}.dense", feat)
            outs[branch] = feat
    fctx = ctx if blocked_tail else ctx.as_dense()
    cls_score = L.conv2d(fctx, "head.csp_cls", outs["cls"],
                         params["csp_cls"]["w"], params["csp_cls"]["b"])
    bbox_pred = L.conv2d(fctx, "head.csp_reg", outs["reg"],
                         params["csp_reg"]["w"], params["csp_reg"]["b"])
    offset_pred = L.conv2d(fctx, "head.csp_offset", outs["offset"],
                           params["csp_offset"]["w"],
                           params["csp_offset"]["b"])
    if blocked_tail:
        cls_score = ctx.store_dense("head.csp_cls.out", cls_score)
        bbox_pred = ctx.store_dense("head.csp_reg.out", bbox_pred)
        offset_pred = ctx.store_dense("head.csp_offset.out", offset_pred)
    bbox_pred = bbox_pred.astype(jnp.float32) * params["reg_scale"]
    offset_pred = offset_pred.astype(jnp.float32) * params["offset_scale"]
    return cls_score.astype(jnp.float32), bbox_pred, offset_pred


def csp_apply(params, x, ctx: ExecCtx, cfg: CSPConfig):
    """Backbone + neck + head -> dense prediction maps (NHWC, stride 4)."""
    feats = csp_backbone(params["backbone"], x, ctx, cfg)
    neck_out = csp_neck(params["neck"], feats, ctx, cfg)
    return csp_head(params["head"], neck_out, ctx, cfg)


# ---------------------------------------------------------------------------
# box decode (get_bboxes)
# ---------------------------------------------------------------------------


def csp_height2bbox(points, heights, offsets, stride=1, wh_ratio=0.41,
                    max_shape=None):
    """Decode height+offset predictions to xyxy boxes — semantics of the
    reference ``mmdet/core/bbox/transforms.py:182-212`` (parity-tested
    against it).  points (K, 2) [x, y]; heights (K, 1+); offsets (K, 2)
    [dy, dx]."""
    x = points[:, 0] + offsets[:, 1] * stride
    y = points[:, 1] + offsets[:, 0] * stride
    hgt = heights[:, 0] * stride
    x1 = x - wh_ratio * hgt / 2
    y1 = y - hgt * 0.5
    x2 = x + wh_ratio * hgt / 2
    y2 = y + hgt * 0.5
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
    return jnp.stack([x1, y1, x2, y2], -1)


def csp_decode(cls_score, bbox_pred, offset_pred, img_shape, cfg: CSPConfig,
               rescale_factor: float = 1.0, nms_impl: str = None):
    """``get_bboxes_single`` (``csp_head.py:232-284``) with static shapes:
    sigmoid scores -> top nms_pre -> csp_height2bbox -> per-class NMS.

    Maps are NHWC with N==1.  Returns (dets (max_per_img, 5), labels, valid).

    ``nms_impl`` / ``topk_impl`` are resolved eagerly from
    ``ops.nms.NMS_IMPL`` / ``TOPK_IMPL`` when None and passed down as static
    arguments so each lowering choice is part of every jit cache key (see
    the NMS_IMPL comment in ``ops/nms.py``).
    """
    from blockcopy_tpu.ops import nms as _nms
    if nms_impl is None:
        nms_impl = _nms.NMS_IMPL
    return _csp_decode(cls_score, bbox_pred, offset_pred, img_shape, cfg,
                       rescale_factor, nms_impl, TOPK_IMPL,
                       DECODE_LEAN_POINTS)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def _csp_decode(cls_score, bbox_pred, offset_pred, img_shape, cfg: CSPConfig,
                rescale_factor: float, nms_impl: str, topk_impl: str = "sort",
                lean_points: bool = True):
    stride = cfg.head_stride
    h, w = cls_score.shape[1], cls_score.shape[2]
    scores = jax.nn.sigmoid(
        cls_score[0].reshape(-1, cfg.cls_out_channels)
    )
    heights = jnp.exp(bbox_pred[0].reshape(-1, bbox_pred.shape[-1]))
    offsets = offset_pred[0].reshape(-1, 2)

    nms_pre = min(cfg.nms_pre, scores.shape[0])
    max_scores = scores.max(axis=1)
    if topk_impl == "approx":
        _, topk = jax.lax.approx_max_k(max_scores, nms_pre,
                                       recall_target=1.0)
    else:
        assert topk_impl == "sort", topk_impl
        _, topk = jax.lax.top_k(max_scores, nms_pre)
    if lean_points:
        # flattened index i = y*W + x (see DECODE_LEAN_POINTS): identical
        # int32 products + f32 casts as the gathered full points array
        xs = topk % w
        ys = topk // w
        points = jnp.stack([xs * stride, ys * stride], -1).astype(
            jnp.float32) + stride // 2
        heights, offsets, scores = heights[topk], offsets[topk], scores[topk]
    else:
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).reshape(-1)
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).reshape(-1)
        points = jnp.stack([xs * stride, ys * stride], -1).astype(
            jnp.float32) + stride // 2
        points, heights, offsets, scores = (
            points[topk], heights[topk], offsets[topk], scores[topk]
        )

    bboxes = csp_height2bbox(points, heights, offsets, stride=stride,
                             wh_ratio=cfg.wh_ratio,
                             max_shape=img_shape) / rescale_factor

    return multiclass_nms_fixed(bboxes, scores, cfg.score_thr, cfg.nms_iou,
                                cfg.max_per_img, impl=nms_impl)


def soft_nms_rescore(dets, labels, valid, cfg: CSPConfig):
    """Host-side soft-NMS over the fixed-size decode output (reference
    capability: ``soft_nms_cpu.pyx``; config ``nms=dict(type='soft_nms')``).
    Returns rescored fixed-size (dets, labels, valid)."""
    from blockcopy_tpu.ops.nms import soft_nms_numpy

    dets = np.asarray(dets)
    labels = np.asarray(labels)
    valid = np.asarray(valid)
    cand_idx = np.nonzero(valid)[0]
    if len(cand_idx) == 0:
        return dets, labels, valid
    kept_dets, kept_orig = soft_nms_numpy(dets[cand_idx],
                                          iou_thr=cfg.nms_iou)
    out = np.zeros_like(dets)
    new_labels = np.zeros_like(labels)
    new_valid = np.zeros(len(dets), bool)
    k = min(len(kept_dets), len(dets))
    out[:k] = kept_dets[:k]
    new_labels[:k] = labels[cand_idx[kept_orig[:k]]]
    new_valid[:k] = True
    return out, new_labels, new_valid


def dets_to_bbox_results(dets, labels, valid, num_classes: int
                         ) -> List[List[np.ndarray]]:
    """Fixed-size device dets -> mmdet ``bbox2result`` numpy lists
    (``mmdet/core/bbox/transforms.py:138-156``)."""
    dets = np.asarray(dets)
    labels = np.asarray(labels)
    valid = np.asarray(valid)
    out = []
    for c in range(num_classes - 1):
        sel = valid & (labels == c)
        out.append(dets[sel].astype(np.float32))
    return [out]


# ---------------------------------------------------------------------------
# BlockCopy detection engine
# ---------------------------------------------------------------------------


class CSPBlockCopy:
    """Per-frame BlockCopy pipeline for CSP (reference
    ``csp_blockcopy.py:46-95``): policy -> blocked extract_feat+head ->
    decode+NMS -> bbox results; policy optimized with the detection
    information gain."""

    def __init__(self, params, cfg: CSPConfig, settings: dict):
        from blockcopy_tpu.policy.policies import build_policy_from_settings

        self.params = params
        self.cfg = cfg
        self.settings = settings
        self.policy = build_policy_from_settings(settings)
        self.block_size = settings["block_size"]
        self.train_interval = settings["block_train_interval"]
        self.quantum = settings.get("block_quantize_number_exec", 1.0 / 16.0)
        self._geom = None
        self._frame_shape = None
        self.temporal = None
        self._steps = {}
        self.flops = FlopsTracker()
        self.reset_temporal()

    def reset_temporal(self):
        self.clip_length = 0
        self.policy_meta = {"inputs": None, "outputs": None,
                            "outputs_prev": None}

    # policy persistence (amortizes the 300-400 clip warmup the reference
    # pays every run, tools/test_city_person.py:218) — shared npz layout
    # with BlockCopyModel via utils/policy_ckpt.py
    def save_policy(self, path: str) -> None:
        from blockcopy_tpu.utils.policy_ckpt import save_ladder_policy

        save_ladder_policy(self.policy, path)

    def load_policy(self, path: str) -> None:
        from blockcopy_tpu.utils.policy_ckpt import load_ladder_policy

        load_ladder_policy(self.policy, path)

    def _init_temporal(self, frame):
        n, h, w, _ = frame.shape
        gh, gw = gridlib.grid_shape(h, w, self.block_size)
        self._geom = (n, gh, gw)
        self._frame_shape = tuple(frame.shape)
        total = n * gh * gw

        def build(f):
            idx = jnp.arange(total, dtype=jnp.int32)
            ctx = ExecCtx.blocked(idx, n, gh, gw, {}, building=True)
            pack = split_dense(f, idx, n, gh, gw)
            ctx.store_dense("__frame_state__", pack)
            csp_apply(self.params, pack, ctx, self.cfg)
            return ctx.canvases

        shapes = jax.eval_shape(build,
                                jax.ShapeDtypeStruct(frame.shape, frame.dtype))
        self.temporal = {"canvases": jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)}
        if self.policy.is_trainable():
            scale = 0.25 * 128 / self.block_size
            self.flops.policy_macs = policy_net_macs(
                int(h * scale), int(w * scale),
                self.settings.get("block_num_classes", 1),
                arch=self.settings.get("block_policy_arch", "ref"))

    def _get_step(self, capacity):
        step = self._steps.get(capacity)
        if step is not None:
            return step
        n, gh, gw = self._geom

        @partial(jax.jit, donate_argnums=(1,))
        def model_step(params, temporal, frame, grid):
            idx = gridlib.exec_indices(grid, capacity)
            pack = split_dense(frame, idx, n, gh, gw)
            ctx = ExecCtx.blocked(idx, n, gh, gw, temporal["canvases"])
            frame_state = ctx.store_dense("__frame_state__", pack)
            cls_s, bbox_p, off_p = csp_apply(params, pack, ctx, self.cfg)
            self.flops.record_trace(capacity, ctx.macs_by_module())
            return ({"canvases": ctx.canvases}, cls_s, bbox_p, off_p,
                    frame_state)

        self._steps[capacity] = model_step
        return model_step

    def simple_test(self, img, img_shape=None, rescale_factor: float = 1.0):
        """One frame; ``img`` dense (1, H, W, 3) normalized NHWC."""
        self.clip_length += 1
        meta = self.policy_meta
        meta["inputs"] = img
        img_shape = img_shape or (img.shape[1], img.shape[2])

        with timings.env("blockcopy/policy_forward", 3):
            meta = self.policy(meta)

        with timings.env("blockcopy/model", 3):
            if self.temporal is None or self._geom is None:
                self._init_temporal(img)
            elif tuple(img.shape) != self._frame_shape:
                # same guard as BlockCopyModel (core/engine.py): compiled
                # steps + canvases are geometry-static; fail loudly
                raise ValueError(
                    f"frame shape changed {self._frame_shape} -> "
                    f"{tuple(img.shape)}: build a new CSPBlockCopy for a "
                    f"different resolution")
            count = meta["num_exec"]
            if count == 0:
                out = meta["outputs"]
                capacity = 0
            else:
                capacity = gridlib.capacity_for_count(
                    count, meta["num_total"], self.quantum)
                step = self._get_step(capacity)
                (self.temporal, cls_s, bbox_p, off_p,
                 frame_state) = step(self.params, self.temporal, img,
                                     meta["grid"])
                meta["frame_state"] = frame_state
                dets, labels, valid = csp_decode(
                    cls_s, bbox_p, off_p, img_shape, self.cfg, rescale_factor
                )
                if self.cfg.nms_type == "soft_nms":
                    dets, labels, valid = soft_nms_rescore(
                        dets, labels, valid, self.cfg)
                out = dets_to_bbox_results(dets, labels, valid,
                                           self.cfg.num_classes)
            self.flops.record_frame(capacity,
                                    meta.get("_rl_cache") is not None,
                                    images=img.shape[0])
            meta["outputs_prev"] = meta["outputs"]
            meta["outputs"] = out

        with timings.env("blockcopy/policy_optim", 3):
            train_policy = self.clip_length % self.train_interval == 0
            self.policy_meta = self.policy.optim(meta, train=train_policy)
        return out[0]

    __call__ = simple_test
