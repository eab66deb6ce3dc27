"""SwiftNet semantic segmentation model (dense + blocked from one definition).

Functional JAX port of the reference architecture
(``semantic_segmentation/lib/models/swiftnet/swiftnet.py:13-97``,
``util.py:40-138``, ``backbones/resnet.py``): a torchvision-style ResNet
encoder (``forward_down``), Spatial Pyramid Pooling over the last stage
(dense, via the ``noblocks`` combinator — reference decorates SPP with
``@blockcopy_noblocks``, ``util.py:113``), and three ``_Upsample`` decoder
stages (1x1 bottleneck on the skip, 2x bilinear upsample, add, 3x3 blend)
followed by a 1x1 logits head.  Output stride 4.

BatchNorm is inference-mode and stored pre-folded as (scale, bias) — see
``ops.layers.batch_norm``.  ``_BNReluConv`` order is BN -> ReLU -> conv
(reference ``util.py:40-56``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from blockcopy_tpu.core import blocked as _blocked
from blockcopy_tpu.core.blocked import BlockPack, ExecCtx
from blockcopy_tpu.core.engine import noblocks
from blockcopy_tpu.ops import layers as L

# Fused Pallas bottleneck tail (halo assembly + 3x3 conv + BN/ReLU + 1x1
# conv + residual as ONE kernel, ops/pallas/bottleneck.py) for stride-1
# identity bottlenecks whose 3x3 width is lane-aligned and block >= 8 px
# (measured on v5e: 4.0x / 2.2x per-bottleneck at layer2/layer3 shapes;
# 0.8x at bs=4 layer4 shapes, hence the bs gate).  Tri-state: None = auto
# (on for TPU backends, off elsewhere — interpret mode is for tests);
# BLOCKCOPY_TPU_FUSED_BOTTLENECK=0/1 forces.
import os as _os
FUSED_BOTTLENECK = {"0": False, "1": True}.get(
    _os.environ.get("BLOCKCOPY_TPU_FUSED_BOTTLENECK", ""), None)


def _fused_default() -> bool:
    # Best-known default, set by full-program A/B on the v5e headline bench
    # (per-bottleneck micro wins of 2-4x did NOT survive at program level
    # for the first kernel revision: 208.8 vs 229.6 FPS; relay micro-benches
    # overstate XLA op costs — trust only full-program numbers).  Flip to
    # _is_tpu() when a revision beats the XLA path end-to-end.
    return False

# ---------------------------------------------------------------------------
# configuration
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    layers: Sequence[int]
    bottleneck: bool
    groups: int = 1        # ResNeXt cardinality
    base_width: int = 64   # wide variants: 128

    @property
    def expansion(self) -> int:
        return 4 if self.bottleneck else 1

    @property
    def block_features(self) -> List[int]:
        # channel count after each stage (reference backbones/resnet.py:200-208)
        return [c * self.expansion for c in (64, 128, 256, 512)]

    def width(self, planes: int) -> int:
        # torchvision Bottleneck width formula
        return int(planes * self.base_width / 64.0) * self.groups


# full torchvision family the reference backbone file exposes
# (backbones/resnet.py:288-304 __all__ / factories)
RESNETS = {
    "resnet18": ResNetConfig((2, 2, 2, 2), False),
    "resnet34": ResNetConfig((3, 4, 6, 3), False),
    "resnet50": ResNetConfig((3, 4, 6, 3), True),
    "resnet101": ResNetConfig((3, 4, 23, 3), True),
    "resnet152": ResNetConfig((3, 8, 36, 3), True),
    "resnext50_32x4d": ResNetConfig((3, 4, 6, 3), True, groups=32,
                                    base_width=4),
    "resnext101_32x8d": ResNetConfig((3, 4, 23, 3), True, groups=32,
                                     base_width=8),
    "wide_resnet50_2": ResNetConfig((3, 4, 6, 3), True, base_width=128),
    "wide_resnet101_2": ResNetConfig((3, 4, 23, 3), True, base_width=128),
}


@dataclasses.dataclass(frozen=True)
class SwiftNetConfig:
    backbone: str = "resnet18"
    num_classes: int = 19
    num_features: int = 128
    spp_grids: Sequence[int] = (8, 4, 2, 1)
    spp_levels: int = 3

    @property
    def resnet(self) -> ResNetConfig:
        return RESNETS[self.backbone]


# ---------------------------------------------------------------------------
# initialization
# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout, bias=False, dtype=jnp.float32):
    n = kh * kw * cout  # kaiming fan_out, relu (reference swiftnet.py:63-65)
    p = {"w": (jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
               * jnp.sqrt(2.0 / n)).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def _bn_init(c, dtype=jnp.float32):
    # folded eval-mode BN: identity at init
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _bnrc_init(key, cin, cout, k, bias=False, batch_norm=True, dtype=jnp.float32):
    p = {"conv": _conv_init(key, k, k, cin, cout, bias=bias, dtype=dtype)}
    if batch_norm:
        p["bn"] = _bn_init(cin, dtype)
    return p


def _basic_block_init(key, cin, cout, stride, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "conv1": _conv_init(ks[0], 3, 3, cin, cout, dtype=dtype),
        "bn1": _bn_init(cout, dtype),
        "conv2": _conv_init(ks[1], 3, 3, cout, cout, dtype=dtype),
        "bn2": _bn_init(cout, dtype),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = {
            "conv": _conv_init(ks[2], 1, 1, cin, cout, dtype=dtype),
            "bn": _bn_init(cout, dtype),
        }
    return p


def _bottleneck_init(key, cin, planes, stride, dtype, groups=1, width=None):
    cout = planes * 4
    width = width if width is not None else planes
    ks = jax.random.split(key, 4)
    p = {
        "conv1": _conv_init(ks[0], 1, 1, cin, width, dtype=dtype),
        "bn1": _bn_init(width, dtype),
        # grouped 3x3: weight carries cin/groups input channels
        "conv2": _conv_init(ks[1], 3, 3, width // groups, width, dtype=dtype),
        "bn2": _bn_init(width, dtype),
        "conv3": _conv_init(ks[2], 1, 1, width, cout, dtype=dtype),
        "bn3": _bn_init(cout, dtype),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = {
            "conv": _conv_init(ks[3], 1, 1, cin, cout, dtype=dtype),
            "bn": _bn_init(cout, dtype),
        }
    return p


def init_resnet(key, cfg: ResNetConfig, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 5)
    params: Dict = {
        "conv1": _conv_init(ks[0], 7, 7, 3, 64, dtype=dtype),
        "bn1": _bn_init(64, dtype),
    }
    cin = 64
    for stage, (planes, blocks) in enumerate(
        zip((64, 128, 256, 512), cfg.layers)
    ):
        stride = 1 if stage == 0 else 2
        stage_params = []
        bkeys = jax.random.split(ks[1 + stage], blocks)
        for b in range(blocks):
            s = stride if b == 0 else 1
            if cfg.bottleneck:
                stage_params.append(_bottleneck_init(
                    bkeys[b], cin, planes, s, dtype, groups=cfg.groups,
                    width=cfg.width(planes)))
                cin = planes * 4
            else:
                stage_params.append(_basic_block_init(bkeys[b], cin, planes, s, dtype))
                cin = planes
        params[f"layer{stage + 1}"] = stage_params
    return params


def init_swiftnet(key, cfg: SwiftNetConfig, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 8)
    rn = cfg.resnet
    up_features = rn.block_features
    nf = cfg.num_features
    params: Dict = {"backbone": init_resnet(ks[0], rn, dtype)}
    # SPP: bn (in->bt), levels (bt->level_size)x3, fuse (final->out)
    level_size = nf // cfg.spp_levels
    final_size = nf + cfg.spp_levels * level_size
    lk = jax.random.split(ks[1], cfg.spp_levels)
    params["spp"] = {
        "bn": _bnrc_init(ks[2], up_features[3], nf, 1, dtype=dtype),
        "levels": [
            _bnrc_init(lk[i], nf, level_size, 1, dtype=dtype)
            for i in range(cfg.spp_levels)
        ],
        "fuse": _bnrc_init(ks[3], final_size, nf, 1, dtype=dtype),
    }
    # decoder: 3 upsample stages with skips from layer3, layer2, layer1
    ups = []
    for i, skip_ch in enumerate([up_features[2], up_features[1], up_features[0]]):
        k1, k2 = jax.random.split(jax.random.fold_in(ks[4], i))
        ups.append({
            "bottleneck": _bnrc_init(k1, skip_ch, nf, 1, dtype=dtype),
            "blend": _bnrc_init(k2, nf, nf, 3, dtype=dtype),
        })
    params["ups"] = ups
    params["logits"] = _bnrc_init(ks[5], nf, cfg.num_classes, 1, bias=True,
                                  dtype=dtype)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _bnrc(ctx: ExecCtx, name: str, x, p, stride=1, dilation=1):
    """BN -> ReLU -> conv (reference ``util.py:40-56``)."""
    if "bn" in p:
        x = L.batch_norm(x, p["bn"]["scale"], p["bn"]["bias"])
    x = L.relu(x)
    return L.conv2d(ctx, name, x, p["conv"]["w"], p["conv"].get("b"),
                    stride=stride, dilation=dilation)


def _basic_block(ctx, name, x, p, stride):
    identity = x
    if "downsample" in p:
        identity = L.conv2d(ctx, f"{name}.ds", x, p["downsample"]["conv"]["w"],
                            stride=stride, padding=0)
        identity = L.batch_norm(identity, p["downsample"]["bn"]["scale"],
                                p["downsample"]["bn"]["bias"])
    out = L.conv2d(ctx, f"{name}.conv1", x, p["conv1"]["w"], stride=stride)
    out = L.batch_norm(out, p["bn1"]["scale"], p["bn1"]["bias"])
    out = L.relu(out)
    out = L.conv2d(ctx, f"{name}.conv2", out, p["conv2"]["w"])
    out = L.batch_norm(out, p["bn2"]["scale"], p["bn2"]["bias"])
    out = L.add(out, identity)
    return L.relu(out)


def _fused_bottleneck(ctx: ExecCtx, name: str, x: BlockPack, p):
    """Stride-1 identity bottleneck with the tail fused into one Pallas
    kernel.  conv1 stays on the XLA path (a plain 1x1 matmul XLA already
    lowers well); strips of h1 are scattered into the SAME named canvas the
    exchange path would use, so temporal state is interchangeable between
    lowerings frame-to-frame."""
    import numpy as _np

    from blockcopy_tpu.ops.pallas.bottleneck import bottleneck_tail

    h1 = L.conv2d(ctx, f"{name}.conv1", x, p["conv1"]["w"], padding=0)
    h1 = L.relu(L.batch_norm(h1, p["bn1"]["scale"], p["bn1"]["bias"]))
    pieces = ctx.exchange_pieces(f"{name}.conv2", h1, 1)
    y = bottleneck_tail(
        h1.data, x.data, pieces,
        p["conv2"]["w"], p["bn2"]["scale"], p["bn2"]["bias"],
        p["conv3"]["w"][0, 0], p["bn3"]["scale"], p["bn3"]["bias"])
    c_mid = p["conv2"]["w"].shape[2]
    ctx.add_macs(float(_np.prod(h1.data.shape)) * c_mid * 9,
                 f"{name}.conv2")
    ctx.add_macs(float(_np.prod(y.shape)) * c_mid, f"{name}.conv3")
    return x.with_data(y)


def maybe_fused_bottleneck(ctx, name, x, p, stride, groups=1, dilation=1):
    """Run the fused Pallas tail when eligible, else return None (caller
    falls through to the XLA path).  Shared by SwiftNet and CSP backbones."""
    fused = FUSED_BOTTLENECK if FUSED_BOTTLENECK is not None \
        else _fused_default()
    if (fused and isinstance(x, BlockPack) and not ctx.is_dense
            and not ctx.building and stride == 1 and groups == 1
            and dilation == 1 and "downsample" not in p
            and _blocked.HALO_IMPL == "strips"
            and p["conv2"]["w"].shape[2] % 128 == 0
            # c_out lane alignment must hold in its own right: the kernel's
            # 1x1/residual operands tile on c_out, which is only 128-aligned
            # today via ResNet's expansion-4 convention (advisor finding).
            and x.data.shape[-1] % 128 == 0
            and x.data.shape[1] >= 8):
        return _fused_bottleneck(ctx, name, x, p)
    return None


def _bottleneck_block(ctx, name, x, p, stride, groups=1):
    out = maybe_fused_bottleneck(ctx, name, x, p, stride, groups)
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
                   groups=groups)
    out = L.batch_norm(out, p["bn2"]["scale"], p["bn2"]["bias"])
    out = L.relu(out)
    out = L.conv2d(ctx, f"{name}.conv3", out, p["conv3"]["w"], padding=0)
    out = L.batch_norm(out, p["bn3"]["scale"], p["bn3"]["bias"])
    out = L.add(out, identity)
    return L.relu(out)


def _stem(ctx: ExecCtx, x, params):
    """ResNet stem: 7x7 s2 conv + BN + ReLU + 3x3 s2 maxpool.  On blocked
    input with STEM_PLANE_POOL, the whole sequence runs fused in s2d plane
    form (``ops/layers.py:stem_pool_s2d``); shared by SwiftNet and CSP."""
    w = params["conv1"]["w"]
    if (L.STEM_PLANE_POOL and isinstance(x, BlockPack) and not ctx.is_dense
            and not L.BLOCKPAD_WITH_ZEROES and w.shape[0] == 7
            and w.shape[2] <= 4 and x.data.shape[1] % 4 == 0
            and x.data.shape[1] >= 8
            # Strip canvases only: under full/pallas halo lowerings
            # exchange_pieces returns None, but only AFTER the s2d plane
            # conv has run and scattered a dead canvas — the stem would
            # execute twice per frame (advisor finding, round 3).
            and _blocked.HALO_IMPL == "strips"):
        out = L.stem_pool_s2d(ctx, "backbone.conv1", "backbone.maxpool", x,
                              w, params["bn1"]["scale"],
                              params["bn1"]["bias"])
        if out is not None:
            ctx.add_macs(float(np.prod(out.data.shape) * 4) *
                         w.shape[2] * 49, "backbone.conv1")
            return out
    x = L.conv2d(ctx, "backbone.conv1", x, w, stride=2, padding=3)
    x = L.batch_norm(x, params["bn1"]["scale"], params["bn1"]["bias"])
    x = L.relu(x)
    return L.max_pool2d(ctx, "backbone.maxpool", x, kernel=3, stride=2,
                        padding=1)


def resnet_forward_down(params, x, ctx: ExecCtx, cfg: ResNetConfig):
    """Backbone ``forward_down`` (reference ``backbones/resnet.py:288-304``):
    returns the four stage features."""
    x = _stem(ctx, x, params)
    feats = []
    for stage in range(4):
        stride = 1 if stage == 0 else 2
        for b, p in enumerate(params[f"layer{stage + 1}"]):
            s = stride if b == 0 else 1
            name = f"backbone.layer{stage + 1}.{b}"
            if cfg.bottleneck:
                x = _bottleneck_block(ctx, name, x, p, s, groups=cfg.groups)
            else:
                x = _basic_block(ctx, name, x, p, s)
        feats.append(x)
    return feats


def spp_forward_dense(params, x, cfg: SwiftNetConfig, dense_ctx=None):
    """Dense SPP (reference ``util.py:85-138``); called through ``noblocks``."""
    dense_ctx = dense_ctx if dense_ctx is not None else ExecCtx.dense()
    h, w = x.shape[1], x.shape[2]
    ar = w / h
    x = _bnrc(dense_ctx, "spp.bn", x, params["bn"])
    levels = [x]
    for i in range(cfg.spp_levels):
        g = cfg.spp_grids[i]
        grid_size = (g, max(1, round(ar * g)))
        pooled = L.adaptive_avg_pool2d(x, grid_size)
        lvl = _bnrc(dense_ctx, f"spp.level{i}", pooled, params["levels"][i])
        levels.append(L.resize_bilinear(lvl, (h, w)))
    cat = jnp.concatenate(levels, axis=-1)
    return _bnrc(dense_ctx, "spp.fuse", cat, params["fuse"])


def _upsample_stage(ctx, name, x, skip, p):
    """Reference ``_Upsample.forward`` (``util.py:71-83``)."""
    skip = _bnrc(ctx, f"{name}.bottleneck", skip, p["bottleneck"])
    x = L.upsample2x(x)
    x = L.add(x, skip)
    return _bnrc(ctx, f"{name}.blend", x, p["blend"])


def swiftnet_apply(params, x, ctx: ExecCtx, cfg: SwiftNetConfig):
    """Full forward: logits at output stride 4."""
    feats = resnet_forward_down(params["backbone"], x, ctx, cfg.resnet)
    out = noblocks(ctx, "spp", feats[3],
                   lambda dctx, d: spp_forward_dense(params["spp"], d, cfg,
                                                     dctx))
    for i, skip in enumerate([feats[2], feats[1], feats[0]]):
        out = _upsample_stage(ctx, f"up{i}", out, skip, params["ups"][i])
    return _bnrc(ctx, "logits", out, params["logits"])


def make_apply_fn(cfg: SwiftNetConfig):
    def apply_fn(params, x, ctx):
        return swiftnet_apply(params, x, ctx, cfg)
    return apply_fn
