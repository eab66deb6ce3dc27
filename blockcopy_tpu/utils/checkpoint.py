"""Checkpoint loading / saving.

Two formats:

* Reference torch ``.pth`` checkpoints (``test_swiftnet.py:94-101`` loads
  ``checkpoint["state_dict"]`` into SwiftNet): converted key-by-key into our
  parameter pytree.  Eval-mode BatchNorms are folded to (scale, bias) at load
  — the arithmetic of the reference's ``bn_fusion.py:6-74`` applied at the
  parameter level.  Conv weights transpose OIHW -> HWIO.
* Native ``.npz`` pytrees (flat '/'-joined keys), used for both model params
  and policy state.  Unlike the reference, the online policy can be
  checkpointed and resumed (improvement noted in SURVEY.md §5).
"""

from __future__ import annotations

import logging
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

BN_EPS = 1e-5


def _fold_bn(sd: Dict[str, np.ndarray], prefix: str):
    gamma = sd[f"{prefix}.weight"]
    beta = sd[f"{prefix}.bias"]
    mean = sd[f"{prefix}.running_mean"]
    var = sd[f"{prefix}.running_var"]
    scale = gamma / np.sqrt(var + BN_EPS)
    return {"scale": jnp.asarray(scale),
            "bias": jnp.asarray(beta - mean * scale)}


def _conv(sd: Dict[str, np.ndarray], key: str, bias_key: str = None):
    w = np.asarray(sd[key]).transpose(2, 3, 1, 0)  # OIHW -> HWIO
    p = {"w": jnp.asarray(w)}
    if bias_key and bias_key in sd:
        p["b"] = jnp.asarray(sd[bias_key])
    return p


def _bnrc(sd, prefix: str, batch_norm=True):
    p = {"conv": _conv(sd, f"{prefix}.conv.weight", f"{prefix}.conv.bias")}
    if batch_norm and f"{prefix}.norm.weight" in sd:
        p["bn"] = _fold_bn(sd, f"{prefix}.norm")
    return p


def convert_swiftnet_state_dict(sd: Dict[str, np.ndarray], cfg) -> Dict:
    """Torch SwiftNet state_dict -> blockcopy_tpu params pytree.

    Key layout per the reference modules: ``backbone.*`` (torchvision
    resnet), ``spp.spp.{spp_bn,spp0..,spp_fuse}.{norm,conv}``,
    ``upsample.{i}.{bottleneck,blend_conv}.{norm,conv}``, ``logits.{norm,conv}``.
    """
    rn = cfg.resnet
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
            }
            if rn.bottleneck:
                blk["conv3"] = _conv(sd, f"{pre}.conv3.weight")
                blk["bn3"] = _fold_bn(sd, f"{pre}.bn3")
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": _conv(sd, f"{pre}.downsample.0.weight"),
                    "bn": _fold_bn(sd, f"{pre}.downsample.1"),
                }
            blocks.append(blk)
            b += 1
        bb[f"layer{stage}"] = blocks

    params: Dict = {"backbone": bb}
    params["spp"] = {
        "bn": _bnrc(sd, "spp.spp.spp_bn"),
        "levels": [
            _bnrc(sd, f"spp.spp.spp{i}") for i in range(cfg.spp_levels)
        ],
        "fuse": _bnrc(sd, "spp.spp.spp_fuse"),
    }
    params["ups"] = [
        {
            "bottleneck": _bnrc(sd, f"upsample.{i}.bottleneck"),
            "blend": _bnrc(sd, f"upsample.{i}.blend_conv"),
        }
        for i in range(3)
    ]
    params["logits"] = _bnrc(sd, "logits")
    return params


def load_torch_checkpoint(path: str, cfg, dtype=jnp.float32) -> Dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    params = convert_swiftnet_state_dict(sd, cfg)
    logger.info("converted torch checkpoint '%s' (%d tensors)", path, len(sd))
    return jax.tree.map(lambda x: x.astype(dtype), params)


# -- native npz pytree io ----------------------------------------------------


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_params(path: str, tree) -> None:
    np.savez(path, **_flatten(tree))


def load_npz(path: str, like, dtype=None) -> Dict:
    """Load a flat npz back into the structure of ``like``."""
    import os

    if not os.path.exists(path) and not path.endswith(".npz") \
            and os.path.exists(path + ".npz"):
        # np.savez appends '.npz' to extensionless save paths; mirror that
        # so save_params/load_npz round-trip on the same path string
        path = path + ".npz"
    data = np.load(path)

    flat_like = _flatten(like)
    missing = set(flat_like) - set(data.files)
    if missing:
        raise KeyError(f"checkpoint missing keys: {sorted(missing)[:5]} ...")

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, tuple) and hasattr(tree, "_fields"):  # namedtuple
            return type(tree)(*(rebuild(v, f"{prefix}{i}/")
                                for i, v in enumerate(tree)))
        if isinstance(tree, (list, tuple)):
            return [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(tree)]
        arr = jnp.asarray(data[prefix[:-1]])
        return arr.astype(dtype) if dtype is not None else arr

    return rebuild(like)


# -- orbax backend (sharded/async checkpoints for mesh-scale state) ----------


def save_orbax(path: str, tree) -> None:
    """Orbax checkpoint (for sharded multi-device state pytrees — e.g. the
    clip-parallel stepper state — where npz would force a host gather)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree, force=True)


def load_orbax(path: str, like) -> Dict:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), like)


def load_params(path: str, cfg, dtype=jnp.float32) -> Dict:
    if path.endswith((".pth", ".pt")):
        return load_torch_checkpoint(path, cfg, dtype)
    if path.endswith(".npz"):
        from blockcopy_tpu.models.swiftnet import init_swiftnet
        like = init_swiftnet(jax.random.PRNGKey(0), cfg)
        return load_npz(path, like, dtype)
    raise ValueError(f"unknown checkpoint format: {path}")
