"""Frame I/O codecs: KITTI flow png, Middlebury .flo, PFM.

Format parity with `/root/reference/utils/data_readers/frame_utils.py` and
the KITTI writers in `/root/reference/utils/data_readers/kitti.py:53-101`:

* KITTI flow png: uint16 BGR-ordered png with ``64*uv + 2^15`` in the first
  two channels and a validity bit in the third;
* KITTI disparity png: uint16 ``256 * disp``;
* Middlebury ``.flo``: ``PIEH`` magic + int32 (w, h) + float32 data;
* PFM: the Freeman lab float map format.

All pure numpy — host-side pipeline code.
"""

from __future__ import annotations

import os
import re

import numpy as np

TAG_CHAR = b"PIEH"


# --- KITTI flow png (uint16) ---

def write_flow_kitti(filename: str, uv: np.ndarray,
                     valid: np.ndarray | None = None) -> None:
    import cv2
    data = 64.0 * uv + 2 ** 15
    if valid is None:
        valid = np.ones(uv.shape[:2] + (1,), np.float64)
    elif valid.ndim == 2:
        valid = valid[..., None]
    packed = np.concatenate([data, valid], axis=-1).astype(np.uint16)
    cv2.imwrite(filename, packed[..., ::-1])


def read_flow_kitti(filename: str) -> tuple[np.ndarray, np.ndarray]:
    import cv2
    raw = cv2.imread(filename, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    raw = raw[..., ::-1].astype(np.float32)
    flow = (raw[..., :2] - 2 ** 15) / 64.0
    valid = raw[..., 2]
    return flow, valid


def write_disp_kitti(filename: str, disp: np.ndarray) -> None:
    import cv2
    cv2.imwrite(filename, (256.0 * disp).astype(np.uint16))


def read_disp_kitti(filename: str) -> np.ndarray:
    import cv2
    return cv2.imread(filename, cv2.IMREAD_ANYDEPTH).astype(np.float32) / 256.0


# --- Middlebury .flo ---

def write_flo(filename: str, flow: np.ndarray) -> None:
    h, w = flow.shape[:2]
    with open(filename, "wb") as f:
        f.write(TAG_CHAR)
        np.array([w, h], np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_flo(filename: str) -> np.ndarray:
    with open(filename, "rb") as f:
        magic = f.read(4)
        if magic != TAG_CHAR:
            raise ValueError(f"bad .flo magic in {filename}: {magic!r}")
        w, h = np.fromfile(f, np.int32, 2)
        data = np.fromfile(f, np.float32, 2 * int(w) * int(h))
    return data.reshape(int(h), int(w), 2)


# --- PFM ---

def read_pfm(filename: str) -> np.ndarray:
    with open(filename, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError("not a PFM file")
        dims = re.match(rb"^(\d+)\s(\d+)\s$", f.readline())
        if not dims:
            raise ValueError("malformed PFM header")
        w, h = map(int, dims.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (h, w, 3) if color else (h, w)
    return np.flipud(data.reshape(shape))


def write_pfm(filename: str, image: np.ndarray, scale: float = 1.0) -> None:
    image = np.flipud(image).astype(np.float32)
    color = image.ndim == 3 and image.shape[2] == 3
    with open(filename, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode())
        endian = image.dtype.byteorder
        if endian == "<" or (endian == "=" and np.little_endian):
            scale = -scale
        f.write(f"{scale}\n".encode())
        image.tofile(f)


def read_gen(filename: str):
    """Extension-dispatching reader (`frame_utils.py:149-162`)."""
    ext = os.path.splitext(filename)[-1].lower()
    if ext in (".png", ".jpeg", ".jpg", ".ppm"):
        from PIL import Image
        return np.asarray(Image.open(filename))
    if ext == ".flo":
        return read_flo(filename)
    if ext == ".pfm":
        return read_pfm(filename)
    raise ValueError(f"unsupported extension: {ext}")
