"""Pedestron/mmdet CSP checkpoint conversion.

Converts a reference CSP checkpoint (``mmcv load_checkpoint`` state_dict,
incl. the mean-teacher ``.pth.stu`` student variants —
``tools/test_city_person.py:277-299``) into the blockcopy_tpu CSP parameter
pytree: conv weights OIHW -> HWIO, BatchNorms folded to (scale, bias),
ConvModule GroupNorms kept as (gamma, beta), neck transposed convs IOHW ->
HWIO, head ``Scale`` scalars.
"""

from __future__ import annotations

import logging
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from blockcopy_tpu.utils.checkpoint import BN_EPS

logger = logging.getLogger(__name__)


def _conv(sd, key, bias_key=None):
    w = np.asarray(sd[key]).transpose(2, 3, 1, 0)
    p = {"w": jnp.asarray(w)}
    if bias_key and bias_key in sd:
        p["b"] = jnp.asarray(sd[bias_key])
    return p


def _convT(sd, prefix):
    # torch ConvTranspose2d weight is (cin, cout, kh, kw) -> HWIO (kh,kw,cin,cout)
    w = np.asarray(sd[f"{prefix}.weight"]).transpose(2, 3, 0, 1)
    return {"w": jnp.asarray(w), "b": jnp.asarray(sd[f"{prefix}.bias"])}


def _fold_bn(sd, prefix):
    gamma = np.asarray(sd[f"{prefix}.weight"])
    beta = np.asarray(sd[f"{prefix}.bias"])
    mean = np.asarray(sd[f"{prefix}.running_mean"])
    var = np.asarray(sd[f"{prefix}.running_var"])
    scale = gamma / np.sqrt(var + BN_EPS)
    return {"scale": jnp.asarray(scale), "bias": jnp.asarray(beta - mean * scale)}


def convert_csp_state_dict(sd: Dict[str, np.ndarray], cfg) -> Dict:
    bb: Dict = {
        "conv1": _conv(sd, "backbone.conv1.weight"),
        "bn1": _fold_bn(sd, "backbone.bn1"),
    }
    for stage in range(1, 5):
        blocks = []
        b = 0
        while f"backbone.layer{stage}.{b}.conv1.weight" in sd:
            pre = f"backbone.layer{stage}.{b}"
            blk = {
                "conv1": _conv(sd, f"{pre}.conv1.weight"),
                "bn1": _fold_bn(sd, f"{pre}.bn1"),
                "conv2": _conv(sd, f"{pre}.conv2.weight"),
                "bn2": _fold_bn(sd, f"{pre}.bn2"),
                "conv3": _conv(sd, f"{pre}.conv3.weight"),
                "bn3": _fold_bn(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": _conv(sd, f"{pre}.downsample.0.weight"),
                    "bn": _fold_bn(sd, f"{pre}.downsample.1"),
                }
            blocks.append(blk)
            b += 1
        bb[f"layer{stage}"] = blocks

    neck = {}
    for p in ("p3", "p4", "p5"):
        neck[p] = _convT(sd, f"neck.{p}")
        neck[f"{p}_l2"] = jnp.asarray(sd[f"neck.{p}_l2.weight"])

    head: Dict = {}
    for branch in ("cls", "reg", "offset"):
        convs = []
        i = 0
        while f"bbox_head.{branch}_convs.{i}.conv.weight" in sd:
            pre = f"bbox_head.{branch}_convs.{i}"
            convs.append({
                "conv": _conv(sd, f"{pre}.conv.weight"),
                "gn": {
                    "gamma": jnp.asarray(sd[f"{pre}.gn.weight"]),
                    "beta": jnp.asarray(sd[f"{pre}.gn.bias"]),
                },
            })
            i += 1
        head[f"{branch}_convs"] = convs
    head["csp_cls"] = _conv(sd, "bbox_head.csp_cls.weight",
                            "bbox_head.csp_cls.bias")
    head["csp_reg"] = _conv(sd, "bbox_head.csp_reg.weight",
                            "bbox_head.csp_reg.bias")
    head["csp_offset"] = _conv(sd, "bbox_head.csp_offset.weight",
                               "bbox_head.csp_offset.bias")
    head["reg_scale"] = jnp.asarray(sd["bbox_head.reg_scales.0.scale"])
    head["offset_scale"] = jnp.asarray(sd["bbox_head.offset_scales.0.scale"])
    return {"backbone": bb, "neck": neck, "head": head}


def load_csp_torch_checkpoint(path: str, cfg, dtype=jnp.float32) -> Dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k:
          (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}
    params = convert_csp_state_dict(sd, cfg)
    logger.info("converted CSP checkpoint '%s' (%d tensors)", path, len(sd))
    return jax.tree.map(lambda x: x.astype(dtype), params)
