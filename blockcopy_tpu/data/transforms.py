"""Paired image+label transforms (numpy/PIL; NHWC output).

Covers the eval pipeline of the reference (Resize -> ToTensor -> Normalize,
``test_swiftnet.py:62-66``) plus the train-side crops/flips from
``lib/ext_transforms.py`` needed for policy warmup on augmented data.
"""

from __future__ import annotations

import random
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image


class ExtCompose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, img, lbl=None):
        for t in self.transforms:
            img, lbl = t(img, lbl)
        return img, lbl


class ExtResize:
    """Resize to (h, w); bilinear for images, nearest for labels."""

    def __init__(self, size: Tuple[int, int]):
        self.size = size  # (h, w)

    def __call__(self, img: Image.Image, lbl: Optional[Image.Image]):
        h, w = self.size
        img = img.resize((w, h), Image.BILINEAR)
        if lbl is not None:
            lbl = lbl.resize((w, h), Image.NEAREST)
        return img, lbl


class ExtToArray:
    """PIL -> float32 numpy HWC in [0, 1]; labels -> int array."""

    def __call__(self, img, lbl):
        img = np.asarray(img, np.float32) / 255.0
        if lbl is not None:
            lbl = np.asarray(lbl, np.int64)
        return img, lbl


class ExtNormalize:
    def __init__(self, mean: Sequence[float], std: Sequence[float]):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img, lbl):
        return (img - self.mean) / self.std, lbl


class ExtRandomHorizontalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, img, lbl):
        if random.random() < self.p:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
            if lbl is not None:
                lbl = lbl.transpose(Image.FLIP_LEFT_RIGHT)
        return img, lbl


def denormalize(img: np.ndarray, mean, std) -> np.ndarray:
    """Inverse of ExtNormalize, for visualization
    (reference ``lib/utils/misc.py:6-12``)."""
    return img * np.asarray(std, np.float32) + np.asarray(mean, np.float32)
