"""Detection speed mode: the whole CSP frame step as ONE compiled program.

The ladder engine (``models/csp.CSPBlockCopy``) decodes boxes to numpy every
frame and rasterizes the policy reward on the host — faithful to the
reference's pipeline (``csp_blockcopy.py:46-95``) but structurally host-bound
(one sync per frame).  This stepper keeps the decode (top-k + fixed-size
NMS), the instance-mask output representation, and the IoU information gain
on-device over fixed-size det arrays, so steady-state detection runs with
zero host syncs — the detection analogue of the semseg speed mode.

Carried task state: ``dets (K, 5)``, ``labels (K,)``, ``valid (K,)`` (+
``*_prev``), where K = ``cfg.max_per_img``.  Final boxes leave the chip only
when the caller fetches them.
"""

from __future__ import annotations

import jax.numpy as jnp

from blockcopy_tpu.core.stepper import FixedCapacityStepper, StepperConfig
from blockcopy_tpu.models.csp import CSPConfig, csp_apply, csp_decode
from blockcopy_tpu.tasks.detection.information_gain import (
    SUBSAMPLE,
    instance_mask_fixed,
    iou_gain_fixed,
)


class DetectionStepper(FixedCapacityStepper):
    task_keys = ("dets", "labels", "valid")

    def __init__(self, csp_cfg: CSPConfig, cfg: StepperConfig, frame_shape,
                 capacity: int, dtype=jnp.float32):
        def apply_fn(params, pack, ctx):
            return csp_apply(params, pack, ctx, csp_cfg)

        super().__init__(apply_fn, cfg, frame_shape, capacity, dtype=dtype)
        self.csp_cfg = csp_cfg
        self.img_shape = (frame_shape[1], frame_shape[2])
        assert frame_shape[0] == 1, "detection stepper is single-clip (N=1)"

    # -- task hooks -----------------------------------------------------------

    def _model_fn(self, params, pack, ctx):
        cls_s, bbox_p, off_p = self.apply_fn(params, pack, ctx)
        dets, labels, valid = csp_decode(cls_s, bbox_p, off_p,
                                         self.img_shape, self.csp_cfg)
        return {"dets": dets, "labels": labels, "valid": valid}

    def _output_repr(self, state):
        h, w = self.img_shape
        scale = 0.25 * 128 / self.cfg.block_size
        oh, ow = int(h * scale), int(w * scale)
        return instance_mask_fixed(state["dets"], state["labels"],
                                   state["valid"], (oh, ow),
                                   self.csp_cfg.cls_out_channels, scale)

    def _information_gain(self, state):
        return iou_gain_fixed(state["dets"], state["labels"], state["valid"],
                              state["dets_prev"], state["labels_prev"],
                              state["valid_prev"], self.img_shape, SUBSAMPLE)
