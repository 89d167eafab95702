"""RAFT3D KITTI evaluation loader + submission writer.

Format parity with `/root/reference/utils/data_readers/kitti.py`:
* :class:`KITTIEvalDataset` walks ``{root}/testing/seq/*.png`` with 3-view
  (prev/cur/next, edge-clamped) sampling, parsing ``K_02`` intrinsics from
  the calib files (`kitti.py:23-149`);
* :func:`write_prediction` emits the KITTI submission artifacts: flow png
  (``64*uv + 2^15`` uint16), disparity pngs (``256*d``), and the SE3
  field / tau / phi text dumps (`kitti.py:53-101`).
"""

from __future__ import annotations

import csv
import os
from glob import glob

import numpy as np

from sndepth_tpu.data.frame_codecs import write_disp_kitti, write_flow_kitti
from sndepth_tpu.data.kitti_sequence import EvalSequenceDataset


def parse_k02_intrinsics(calib_file: str) -> np.ndarray:
    """[fx, fy, cx, cy] from a KITTI calib_cam_to_cam file's K_02 row."""
    with open(calib_file) as f:
        for row in csv.reader(f, delimiter=" "):
            if row and row[0] == "K_02:":
                k = np.array(row[1:], np.float32).reshape(3, 3)
                return np.array([k[0, 0], k[1, 1], k[0, 2], k[1, 2]],
                                np.float32)
    raise ValueError(f"no K_02 entry in {calib_file}")


class KITTIEvalDataset(EvalSequenceDataset):
    """3-view loader over the RAFT3D testing sequence with intrinsics."""

    def __init__(self, root: str = "data/raft_datasets",
                 img_width: int = 416, img_height: int = 128):
        imgs = sorted(glob(os.path.join(root, "testing", "seq", "*.png")))
        super().__init__(imgs, img_width=img_width, img_height=img_height)
        calibs = sorted(glob(os.path.join(
            root, "testing", "calib_cam_to_cam", "*.txt")))
        self.intrinsics = [parse_k02_intrinsics(c) for c in calibs]

    def __getitem__(self, index: int) -> dict:
        sample = super().__getitem__(index)
        k = (self.intrinsics[index] if index < len(self.intrinsics)
             else self.intrinsics[-1])
        sample["intrinsics"] = k
        return sample


def write_prediction(out_dir: str, index: int, flow: np.ndarray,
                     Ts_field: np.ndarray, tau: np.ndarray,
                     phi: np.ndarray, disp1: np.ndarray | None = None,
                     disp2: np.ndarray | None = None) -> dict:
    """Write the KITTI submission artifact set. Returns the path map.

    flow: (H, W, 2); Ts_field: (..., 7) SE3 data (the reference dumps the
    last 6 of lietorch's internal columns; here the full 7-value
    translation+quaternion rows go out, documented in the header).
    """
    paths = {}
    subdirs = {"flow": "flow", "T": "T", "tau": "tau", "phi": "phi",
               "disp_0": "disp_0", "disp_1": "disp_1"}
    for sub in subdirs.values():
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    paths["flow"] = os.path.join(out_dir, "flow", "%06d_10.png" % index)
    write_flow_kitti(paths["flow"], flow)

    paths["T"] = os.path.join(out_dir, "T", "%06d.txt" % index)
    np.savetxt(paths["T"], np.asarray(Ts_field).reshape(-1, 7))

    paths["tau"] = os.path.join(out_dir, "tau", "%06d.txt" % index)
    np.savetxt(paths["tau"], np.asarray(tau).reshape(-1, 3), fmt="%.6f",
               delimiter=" ")
    paths["phi"] = os.path.join(out_dir, "phi", "%06d.txt" % index)
    np.savetxt(paths["phi"], np.asarray(phi).reshape(-1, 3), fmt="%.6f",
               delimiter=" ")

    if disp1 is not None:
        paths["disp_0"] = os.path.join(out_dir, "disp_0",
                                       "%06d_10.png" % index)
        write_disp_kitti(paths["disp_0"], disp1)
    if disp2 is not None:
        paths["disp_1"] = os.path.join(out_dir, "disp_1",
                                       "%06d_10.png" % index)
        write_disp_kitti(paths["disp_1"], disp2)
    return paths


def prepare_images_and_depths(image1: np.ndarray, image2: np.ndarray,
                              depth1: np.ndarray, depth2: np.ndarray,
                              depth_scale: float = 1.0):
    """Pad inputs to a multiple of 8 and scale depths
    (`/root/reference/utils/utils_raft3d.py:168-210` behavior)."""
    ht, wd = image1.shape[-3:-1]
    pad_h = (-ht) % 8
    pad_w = (-wd) % 8
    spec = [(0, 0), (0, pad_h), (0, pad_w)]

    def pad_img(x):
        return np.pad(x, spec + [(0, 0)], mode="edge")

    def pad_depth(x):
        return np.pad(x, spec, mode="edge")

    return (pad_img(image1), pad_img(image2),
            depth_scale * pad_depth(depth1), depth_scale * pad_depth(depth2),
            (pad_h, pad_w))
