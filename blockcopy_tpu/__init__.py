"""blockcopy_tpu — a TPU-native (JAX/XLA/Pallas) block-sparse video inference framework.

Re-implementation of the capabilities of BlockCopy (ICCV 2021,
thomasverelst/blockcopy-video-processing-pytorch) designed TPU-first:

* block-sparse per-frame execution with temporal feature reuse
  (reference: ``blockcopy/blockcopy/core/tensorwrapper.py``), re-designed as
  static-shape packed block buffers + persistent HBM feature canvases with a
  fused scatter/halo-gather exchange instead of CUDA split/combine/transfer/
  blockpad kernels,
* an online-REINFORCE execution policy (reference:
  ``blockcopy/blockcopy/policy/policy.py``) running fully inside ``jit``,
* task integrations: SwiftNet semantic segmentation and CSP pedestrian
  detection.

Public surface mirrors the reference package ``blockcopy/__init__.py:1-4``.
"""

from blockcopy_tpu.core.argparser import add_argparser_arguments
from blockcopy_tpu.core.engine import BlockCopyModel, blockcopy_noblocks
from blockcopy_tpu.core.blocked import (
    BlockPack,
    is_block,
    split_dense,
    combine,
    to_dense,
)
from blockcopy_tpu.policy.policies import build_policy_from_settings

__version__ = "0.1.0"

__all__ = [
    "add_argparser_arguments",
    "BlockCopyModel",
    "blockcopy_noblocks",
    "BlockPack",
    "is_block",
    "split_dense",
    "combine",
    "to_dense",
    "build_policy_from_settings",
]
