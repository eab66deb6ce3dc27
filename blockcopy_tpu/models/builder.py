"""Config-driven model construction (reference ``mmdet/models/builder.py``:
``build_detector(cfg.model, test_cfg=cfg.test_cfg)``).

The shipped configs in ``configs/csp/`` are structurally identical to the
reference's mmcv python configs; ``build_detector`` maps them onto the
functional CSP implementation.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from blockcopy_tpu.core.argparser import default_settings
from blockcopy_tpu.models.csp import CSPBlockCopy, CSPConfig, init_csp
from blockcopy_tpu.utils.registry import (
    BACKBONES, DATASETS, DETECTORS, HEADS, NECKS,
)

logger = logging.getLogger(__name__)

# Register the component names used by the reference configs so
# config-driven lookups resolve (API parity with mmdet registries).
DETECTORS.register_module(CSPBlockCopy, name="CSPBlockCopy")
BACKBONES.register_module(CSPConfig, name="ResNet")


def _register_datasets():
    from blockcopy_tpu.tasks.detection.dataset import CityPersonsClipDataset
    from blockcopy_tpu.data.cityscapes_vid import CityscapesVid
    from blockcopy_tpu.data.demo import DemoImageDataset

    for cls, name in [
        (CityPersonsClipDataset, "CityPersonsClipDataset"),
        (CityPersonsClipDataset, "CocoCSPORIClipDataset"),  # reference name
        (CityscapesVid, "CityscapesVid"),
        (DemoImageDataset, "DemoImageDataset"),
    ]:
        if DATASETS.get(name) is None:
            DATASETS.register_module(cls, name=name)


_register_datasets()


def csp_config_from_dict(cfg: Dict) -> CSPConfig:
    """Map an mmdet-style config dict (model + test_cfg) to ``CSPConfig``."""
    model = cfg["model"]
    bb = model.get("backbone", {})
    head = model.get("bbox_head", {})
    test = cfg.get("test_cfg", {})
    kwargs = {}
    if "depth" in bb:
        stage_blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3),
                        152: (3, 8, 36, 3)}
        if bb["depth"] not in stage_blocks:
            raise ValueError(f"unsupported backbone depth {bb['depth']}")
        kwargs["depth"] = bb["depth"]
        kwargs["stage_blocks"] = stage_blocks[bb["depth"]]
    if "stage_blocks" in bb:  # explicit override (tests / ablations)
        kwargs["stage_blocks"] = tuple(bb["stage_blocks"])
    if "strides" in bb:
        kwargs["strides"] = tuple(bb["strides"])
    if "dilations" in bb:
        kwargs["dilations"] = tuple(bb["dilations"])
    if "out_indices" in bb:
        kwargs["out_indices"] = tuple(bb["out_indices"])
    if "num_classes" in head:
        kwargs["num_classes"] = head["num_classes"]
    if "stacked_convs" in head:
        kwargs["stacked_convs"] = head["stacked_convs"]
    if "feat_channels" in head:
        kwargs["head_feat"] = head["feat_channels"]
    if model.get("neck", {}).get("out_channels"):
        kwargs["neck_out"] = model["neck"]["out_channels"]
    if "nms_pre" in test:
        kwargs["nms_pre"] = test["nms_pre"]
    if "score_thr" in test:
        kwargs["score_thr"] = test["score_thr"]
    if isinstance(test.get("nms"), dict) and "iou_thr" in test["nms"]:
        kwargs["nms_iou"] = test["nms"]["iou_thr"]
        if "type" in test["nms"]:
            kwargs["nms_type"] = test["nms"]["type"]
    if "max_per_img" in test:
        kwargs["max_per_img"] = test["max_per_img"]
    return CSPConfig(**kwargs)


def build_detector(cfg: Dict, checkpoint: Optional[str] = None,
                   dtype=jnp.float32, seed: int = 0,
                   settings_override: Optional[Dict] = None) -> CSPBlockCopy:
    """Build a CSPBlockCopy detector from a loaded python config dict
    (see ``blockcopy_tpu.utils.registry.load_config``)."""
    model_cfg = cfg["model"]
    assert model_cfg.get("type") == "CSPBlockCopy", model_cfg.get("type")
    csp_cfg = csp_config_from_dict(cfg)
    if checkpoint:
        if checkpoint.endswith((".pth", ".pt")) or checkpoint.endswith(".stu"):
            from blockcopy_tpu.tasks.detection.checkpoint import (
                load_csp_torch_checkpoint,
            )
            params = load_csp_torch_checkpoint(checkpoint, csp_cfg, dtype)
        else:
            from blockcopy_tpu.utils.checkpoint import load_npz
            like = init_csp(jax.random.PRNGKey(0), csp_cfg)
            params = load_npz(checkpoint, like, dtype)
    else:
        params = init_csp(jax.random.PRNGKey(seed), csp_cfg, dtype=dtype)
    settings = default_settings(block_policy="rl_objectdetection",
                                block_num_classes=1)
    settings.update(model_cfg.get("blockcopy_settings", {}))
    settings.update(settings_override or {})
    return CSPBlockCopy(params, csp_cfg, settings)
