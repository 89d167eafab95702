"""KITTIMotion dataset: RGB image + flow visualization + 3-class label.

Directory layout matches the reference
(`/root/reference/models/dataset/KITTIMotion.py:13-69`):
``{root}/{train|val}/{image,flow,label}/*.png`` with labels encoded in the
red channel as ``class * 100``.

Divergences from the reference (deliberate, documented):
* samples are streamed/decoded on demand instead of eagerly loading the
  whole dataset into memory;
* the three glob lists are *sorted* so image/flow/label triplets actually
  correspond (the reference relies on unsorted ``glob.glob`` order).
"""

from __future__ import annotations

import glob
import os

import numpy as np


class KITTIMotionDataset:
    def __init__(self, root_dir: str, train: bool = True):
        split = "train" if train else "val"
        base = os.path.join(root_dir, split)
        self.images = sorted(glob.glob(os.path.join(base, "image/*.png")))
        self.flows = sorted(glob.glob(os.path.join(base, "flow/*.png")))
        self.labels = sorted(glob.glob(os.path.join(base, "label/*.png")))
        n = len(self.labels)
        if not (len(self.images) == len(self.flows) == n):
            raise ValueError(
                f"mismatched counts under {base}: "
                f"{len(self.images)} images, {len(self.flows)} flows, "
                f"{n} labels")

    def __len__(self) -> int:
        return len(self.labels)

    def __getitem__(self, index: int) -> dict:
        from PIL import Image
        img = np.asarray(Image.open(self.images[index]).convert("RGB"),
                         np.float32) / 255.0
        flow = np.asarray(Image.open(self.flows[index]).convert("RGB"),
                          np.float32) / 255.0
        label_rgb = np.asarray(Image.open(self.labels[index]))
        label = (label_rgb[..., 0] // 100).astype(np.int32)
        return {"image": img, "flow": flow, "label": label}


def synthetic_motion_batches(batch_size: int, height: int = 64,
                             width: int = 128, num_classes: int = 3,
                             seed: int = 0):
    """Infinite synthetic stream with learnable structure: the label is a
    function of the flow image so the net can fit it."""
    rng = np.random.RandomState(seed)
    while True:
        image = rng.rand(batch_size, height, width, 3).astype(np.float32)
        label = rng.randint(0, num_classes, (batch_size, height, width))
        flow = np.zeros((batch_size, height, width, 3), np.float32)
        for c in range(num_classes):
            flow[..., c % 3] += (label == c) * (0.3 + 0.3 * c)
        yield {"image": image, "flow": flow,
               "label": label.astype(np.int32)}
