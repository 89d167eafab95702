"""Differentiable pinhole-camera geometry ops (TPU-native, NHWC).

Functional JAX re-design of the reference geometry layer
(`/root/reference/utils/utils_edited.py:149-362`). Semantics are matched to the
reference bit-for-bit where it matters for training parity:

* ``euler2mat`` composes R = Rx @ Ry @ Rz (reference `utils_edited.py:210`).
  The reference computes clamped copies of the angles but then uses the
  *unclamped* values (`utils_edited.py:179-186`); we reproduce that (no clamp).
* ``pose_vec2mat`` maps a 6-vector ``[tx ty tz rx ry rz]`` to a 4x4 transform
  with R = euler2mat(rz, ry, rx) (reference `utils_edited.py:268-289`).
* ``cam2pixel`` divides by ``z + 1e-10`` (reference `utils_edited.py:260-261`).
* Pixel grids are plain ``0..W-1 / 0..H-1`` coordinates. The reference builds
  them through a linspace(-1,1) round-trip (`utils_edited.py:291-328`) which is
  numerically the identity; we build them directly.

Everything here is shape-static, jit-friendly, and batched: no Python control
flow depends on values, so the whole stack fuses into a single XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def meshgrid(height: int, width: int, *, homogeneous: bool = True,
             dtype=jnp.float32) -> Array:
    """Pixel-coordinate grid, shape (2|3, H, W) with channels (x, y[, 1])."""
    x = jnp.arange(width, dtype=dtype)
    y = jnp.arange(height, dtype=dtype)
    xg = jnp.broadcast_to(x[None, :], (height, width))
    yg = jnp.broadcast_to(y[:, None], (height, width))
    if homogeneous:
        return jnp.stack([xg, yg, jnp.ones_like(xg)], axis=0)
    return jnp.stack([xg, yg], axis=0)


def euler2mat(z: Array, y: Array, x: Array) -> Array:
    """Batched rotation matrices from Euler angles; R = Rx @ Ry @ Rz.

    Args: z, y, x of shape (B,). Returns (B, 3, 3).
    """
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cx, sx = jnp.cos(x), jnp.sin(x)
    ones = jnp.ones_like(z)
    zeros = jnp.zeros_like(z)

    rot_z = jnp.stack([
        jnp.stack([cz, -sz, zeros], -1),
        jnp.stack([sz, cz, zeros], -1),
        jnp.stack([zeros, zeros, ones], -1),
    ], -2)
    rot_y = jnp.stack([
        jnp.stack([cy, zeros, sy], -1),
        jnp.stack([zeros, ones, zeros], -1),
        jnp.stack([-sy, zeros, cy], -1),
    ], -2)
    rot_x = jnp.stack([
        jnp.stack([ones, zeros, zeros], -1),
        jnp.stack([zeros, cx, -sx], -1),
        jnp.stack([zeros, sx, cx], -1),
    ], -2)
    return rot_x @ rot_y @ rot_z


def pose_vec2mat(vec: Array) -> Array:
    """6-DoF pose vector -> 4x4 transform. vec: (B, 6) = [t(3), rx, ry, rz]."""
    b = vec.shape[0]
    t = vec[:, :3, None]                       # (B, 3, 1)
    rot = euler2mat(vec[:, 5], vec[:, 4], vec[:, 3])
    top = jnp.concatenate([rot, t], axis=2)    # (B, 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], vec.dtype)[None, None, :], (b, 1, 4))
    return jnp.concatenate([top, bottom], axis=1)


def invert_pose_mat(mat: Array) -> Array:
    """Closed-form inverse of a rigid 4x4 transform (no generic solve).

    The reference calls ``torch.inverse`` on the pose
    (`utils_edited.py:345`); for a rigid transform the inverse is
    [Rᵀ, -Rᵀt], which is faster and better conditioned on TPU.
    """
    rot = mat[:, :3, :3]
    t = mat[:, :3, 3:]
    rot_t = jnp.swapaxes(rot, -1, -2)
    top = jnp.concatenate([rot_t, -rot_t @ t], axis=2)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], mat.dtype)[None, None, :],
        (mat.shape[0], 1, 4))
    return jnp.concatenate([top, bottom], axis=1)


def pixel2cam(depth: Array, pixel_coords: Array, intrinsics: Array,
              *, homogeneous: bool = True) -> Array:
    """Back-project pixels to camera frame.

    depth: (B, H, W); pixel_coords: (B, 3, H, W); intrinsics: (B, 3, 3).
    Returns (B, 4(|3), H, W). Matches `utils_edited.py:216-239`.
    """
    k_inv = invert_intrinsics(intrinsics)
    # Broadcast-FMA form, not a (B,3,3) @ (B,3,HW) matmul: the pixel-dim
    # matmul has a contraction of 3, which the MXU runs at ~2 TFLOPS and
    # whose backward emits skinny (B,3,HW)x(B,HW,3) reduction dots —
    # measured ~10 ms/step at batch 128 across the camera ops. As
    # per-plane FMAs (same left-to-right add order as the matmul row
    # sums) the whole chain is VPU work that fuses with its neighbours.
    pc = [pixel_coords[:, j] for j in range(3)]
    rows = []
    for c in range(3):
        acc = k_inv[:, c, 0][:, None, None] * pc[0]
        acc = acc + k_inv[:, c, 1][:, None, None] * pc[1]
        acc = acc + k_inv[:, c, 2][:, None, None] * pc[2]
        rows.append(acc * depth)
    if homogeneous:
        rows.append(jnp.ones_like(rows[0]))
    return jnp.stack(rows, axis=1)


def invert_intrinsics(k: Array) -> Array:
    """Closed-form inverse of a (B, 3, 3) pinhole intrinsics matrix."""
    fx, fy = k[:, 0, 0], k[:, 1, 1]
    cx, cy = k[:, 0, 2], k[:, 1, 2]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    inv_fx, inv_fy = 1.0 / fx, 1.0 / fy
    r1 = jnp.stack([inv_fx, zeros, -cx * inv_fx], -1)
    r2 = jnp.stack([zeros, inv_fy, -cy * inv_fy], -1)
    r3 = jnp.stack([zeros, zeros, ones], -1)
    return jnp.stack([r1, r2, r3], -2)


def cam2pixel(cam_coords: Array, proj: Array) -> Array:
    """Project homogeneous camera coords through a 4x4 projection.

    cam_coords: (B, 4, H, W); proj: (B, 4, 4). Returns (B, H, W, 2).
    Matches `utils_edited.py:241-266` including the ``z + 1e-10`` guard.
    """
    # Broadcast-FMA form for the same reason as :func:`pixel2cam` (the
    # contraction dim is 4; only rows 0-2 of the projection are needed).
    cc = [cam_coords[:, j] for j in range(4)]
    rows = []
    for c in range(3):
        acc = proj[:, c, 0][:, None, None] * cc[0]
        acc = acc + proj[:, c, 1][:, None, None] * cc[1]
        acc = acc + proj[:, c, 2][:, None, None] * cc[2]
        acc = acc + proj[:, c, 3][:, None, None] * cc[3]
        rows.append(acc)
    x_n = rows[0] / (rows[2] + 1e-10)
    y_n = rows[1] / (rows[2] + 1e-10)
    return jnp.stack([x_n, y_n], axis=-1)


def intrinsics_4x4(intrinsics: Array) -> Array:
    """Pad (B, 3, 3) K to a (B, 4, 4) homogeneous projection matrix."""
    b = intrinsics.shape[0]
    k = jnp.concatenate(
        [intrinsics, jnp.zeros((b, 3, 1), intrinsics.dtype)], axis=2)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], intrinsics.dtype)[None, None, :],
        (b, 1, 4))
    return jnp.concatenate([k, bottom], axis=1)


def compute_rigid_flow(pose: Array, depth: Array, intrinsics: Array,
                       reverse_pose: bool) -> Array:
    """Rigid flow induced by a 6-DoF pose over a depth map.

    pose: (B, 6); depth: (B, H, W); intrinsics: (B, 3, 3).
    Returns flow (B, H, W, 2). Matches `utils_edited.py:331-362`.
    """
    b, h, w = depth.shape
    mat = pose_vec2mat(pose)
    if reverse_pose:
        mat = invert_pose_mat(mat)

    pix = jnp.broadcast_to(
        meshgrid(h, w, dtype=depth.dtype)[None], (b, 3, h, w))
    tgt_pix = jnp.moveaxis(pix[:, :2], 1, -1)              # (B, H, W, 2)
    cam = pixel2cam(depth, pix, intrinsics)
    proj = intrinsics_4x4(intrinsics) @ mat
    src_pix = cam2pixel(cam, proj)
    return src_pix - tgt_pix


def compute_multi_scale_intrinsics(intrinsics: Array, num_scales: int) -> Array:
    """Per-scale intrinsics, halving fx/fy/cx/cy each scale.

    intrinsics: (B, 3, 3) -> (B, S, 3, 3). Matches `utils_edited.py:149-169`.
    """
    scales = []
    for s in range(num_scales):
        f = 1.0 / (2 ** s)
        fx = intrinsics[:, 0, 0] * f
        fy = intrinsics[:, 1, 1] * f
        cx = intrinsics[:, 0, 2] * f
        cy = intrinsics[:, 1, 2] * f
        zeros = jnp.zeros_like(fx)
        ones = jnp.ones_like(fx)
        r1 = jnp.stack([fx, zeros, cx], -1)
        r2 = jnp.stack([zeros, fy, cy], -1)
        r3 = jnp.stack([zeros, zeros, ones], -1)
        scales.append(jnp.stack([r1, r2, r3], -2))
    return jnp.stack(scales, axis=1)
