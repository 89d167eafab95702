"""Generic custom-folder dataset.

The reference names this loader but ships it empty
(`/root/reference/data/dataloader_custom.py`, 0 bytes — survey §2.7). Here:
any directory of images becomes an inference stream with the standard
3-view (prev/cur/next, edge-clamped) sampling, so every predict CLI can run
on user data.
"""

from __future__ import annotations

import glob
import os

from sndepth_tpu.data.kitti_sequence import EvalSequenceDataset

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


class CustomFolderDataset(EvalSequenceDataset):
    def __init__(self, root: str, img_width: int = 416,
                 img_height: int = 128):
        paths = []
        for ext in IMAGE_EXTS:
            paths.extend(glob.glob(os.path.join(root, f"*{ext}")))
        if not paths:
            raise FileNotFoundError(f"no images under {root}")
        super().__init__(sorted(paths), img_width=img_width,
                         img_height=img_height)
