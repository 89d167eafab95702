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
    from sndepth_tpu import native
    if native.available():
        raw = native.decode(filename).astype(np.float32)
    else:
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
    from sndepth_tpu import native
    if native.available():
        return native.decode(filename).astype(np.float32) / 256.0
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


# --- DPT depth (Sintel, `frame_utils.py:112-124`) ---

TAG_FLOAT = 202021.25


def read_dpt(filename: str) -> np.ndarray:
    """Sintel ``.dpt`` depth: float32 tag + int32 (w, h) + float32 map."""
    with open(filename, "rb") as f:
        check = np.fromfile(f, np.float32, 1)[0]
        if check != np.float32(TAG_FLOAT):
            raise ValueError(
                f"wrong .dpt tag in {filename}: {check} (big-endian file?)")
        w = int(np.fromfile(f, np.int32, 1)[0])
        h = int(np.fromfile(f, np.int32, 1)[0])
        if not (w > 0 and h > 0 and 1 < w * h < 100000000):
            raise ValueError(f"bad .dpt dims {w}x{h} in {filename}")
        return np.fromfile(f, np.float32, -1).reshape(h, w)


def write_dpt(filename: str, depth: np.ndarray) -> None:
    h, w = depth.shape
    with open(filename, "wb") as f:
        np.float32(TAG_FLOAT).tofile(f)
        np.array([w, h], np.int32).tofile(f)
        depth.astype(np.float32).tofile(f)


# --- Sintel camera (`frame_utils.py:126-147`) ---

def read_cam(filename: str) -> tuple[np.ndarray, np.ndarray]:
    """Sintel ``.cam``: returns (pvec, kvec) exactly like the reference's
    ``cam_read`` — pvec = [t(3), quat(4)] of the extrinsic, kvec =
    [fx, fy, cx, cy]."""
    from scipy.spatial.transform import Rotation
    with open(filename, "rb") as f:
        np.fromfile(f, np.float32, 1)           # tag (unchecked upstream)
        M = np.fromfile(f, np.float64, 9).reshape(3, 3)
        N = np.fromfile(f, np.float64, 12).reshape(3, 4)
    kvec = np.array([M[0, 0], M[1, 1], M[0, 2], M[1, 2]])
    q = Rotation.from_matrix(N[:3, :3]).as_quat()
    pvec = np.concatenate([N[:3, 3], q], 0)
    return pvec, kvec


def write_cam(filename: str, M: np.ndarray, N: np.ndarray) -> None:
    with open(filename, "wb") as f:
        np.float32(TAG_FLOAT).tofile(f)
        M.astype(np.float64).tofile(f)
        N.astype(np.float64).tofile(f)


def read_gen(filename: str):
    """Extension-dispatching reader (`frame_utils.py:149-162`)."""
    ext = os.path.splitext(filename)[-1].lower()
    if ext in (".png", ".jpeg", ".jpg", ".ppm"):
        from PIL import Image
        return np.asarray(Image.open(filename))
    if ext in (".bin", ".raw"):
        return np.load(filename)
    if ext == ".flo":
        return read_flo(filename)
    if ext == ".pfm":
        return read_pfm(filename)
    if ext == ".dpt":
        return read_dpt(filename)
    if ext == ".cam":
        return read_cam(filename)
    raise ValueError(f"unsupported extension: {ext}")
