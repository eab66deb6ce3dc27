"""Demo folder dataset: any directory of images as one long video of 1-frame
clips (reference ``semantic_segmentation/lib/datasets/demo.py:12-53``)."""

from __future__ import annotations

import glob
import logging
import os
import re

from PIL import Image

logger = logging.getLogger(__name__)

_NSRE = re.compile("([0-9]+)")


def natural_sort_key(s):
    return [int(t) if t.isdigit() else t.lower() for t in _NSRE.split(s)]


class DemoImageDataset:
    def __init__(self, root: str, transform=None):
        self.root = root
        self.transform = transform
        files = glob.glob(os.path.join(root, "**/*"), recursive=True)
        files = [f for f in files if f.endswith((".png", ".jpg", ".jpeg"))]
        self.image_paths = sorted(files, key=natural_sort_key)
        logger.info("DemoDataset: loaded %d images from %s",
                    len(self.image_paths), root)

    def __len__(self):
        return len(self.image_paths)

    def __getitem__(self, index):
        path = self.image_paths[index]
        meta = {"path": path, "relpath": os.path.relpath(path, self.root)}
        image = Image.open(path).convert("RGB")
        if self.transform is not None:
            image, _ = self.transform(image, None)
        return [image], 0, meta  # 1-frame clip, no label
