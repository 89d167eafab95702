"""RAFT3D projective geometry (pinhole, intrinsics as [fx fy cx cy]).

Parity with `/root/reference/models/raft3d/projective_ops.py` (minus its
scattered ``.cuda()`` pinning). Coordinates are (x, y, inverse-depth);
validity masks use MIN_DEPTH = 0.05.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sndepth_tpu.ops import se3

Array = jax.Array

MIN_DEPTH = 0.05


def project(points: Array, intrinsics: Array) -> Array:
    """points: (B, H, W, 3) -> (x, y, 1/z) coords (B, H, W, 3).
    intrinsics: (B, 4) = [fx, fy, cx, cy]."""
    x, y, z = jnp.moveaxis(points, -1, 0)
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[:, None, None], -1, 0)
    u = fx * (x / z) + cx
    v = fy * (y / z) + cy
    return jnp.stack([u, v, 1.0 / z], axis=-1)


def inv_project(depths: Array, intrinsics: Array) -> Array:
    """depths: (B, H, W) -> 3-D points (B, H, W, 3)."""
    h, w = depths.shape[-2:]
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[:, None, None], -1, 0)
    x = jnp.broadcast_to(jnp.arange(w, dtype=depths.dtype)[None, :], (h, w))
    y = jnp.broadcast_to(jnp.arange(h, dtype=depths.dtype)[:, None], (h, w))
    X = depths * ((x - cx) / fx)
    Y = depths * ((y - cy) / fy)
    return jnp.stack([X, Y, depths], axis=-1)


def projective_transform(transforms: Array, depth: Array,
                         intrinsics: Array) -> tuple[Array, Array]:
    """Project I1 points into I2 through the SE3 field.

    transforms: (B, H, W, 7); depth: (B, H, W); intrinsics: (B, 4).
    Returns ((B, H, W, 3) coords, (B, H, W) validity)."""
    x0 = inv_project(depth, intrinsics)
    x1 = se3.act(transforms, x0)
    coords = project(x1, intrinsics)
    valid = (x0[..., -1] > MIN_DEPTH) & (x1[..., -1] > MIN_DEPTH)
    return coords, valid.astype(depth.dtype)


def induced_flow(transforms: Array, depth: Array, intrinsics: Array
                 ) -> tuple[Array, Array, Array]:
    """2-D (x, y, dzinv) and 3-D flow fields induced by the SE3 field."""
    x0 = inv_project(depth, intrinsics)
    x1 = se3.act(transforms, x0)
    p0 = project(x0, intrinsics)
    p1 = project(x1, intrinsics)
    valid = (x0[..., -1] > MIN_DEPTH) & (x1[..., -1] > MIN_DEPTH)
    return p1 - p0, x1 - x0, valid.astype(depth.dtype)


def backproject_flow3d(flow2d: Array, depth0: Array, depth1: Array,
                       intrinsics: Array) -> Array:
    """3-D flow from 2-D flow + two depth maps (single image, (H, W, 2))."""
    h, w = flow2d.shape[0:2]
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[None], -1, 0)
    x0 = jnp.broadcast_to(jnp.arange(w, dtype=depth0.dtype)[None, :], (h, w))
    y0 = jnp.broadcast_to(jnp.arange(h, dtype=depth0.dtype)[:, None], (h, w))
    x1 = x0 + flow2d[..., 0]
    y1 = y0 + flow2d[..., 1]
    X0 = depth0 * ((x0 - cx) / fx)
    Y0 = depth0 * ((y0 - cy) / fy)
    X1 = depth1 * ((x1 - cx) / fx)
    Y1 = depth1 * ((y1 - cy) / fy)
    return jnp.stack([X1 - X0, Y1 - Y0, depth1 - depth0], axis=-1)


def grid_sampler(img: Array, coords: Array) -> tuple[Array, Array]:
    """Bilinear sample (B, H, W, C) at pixel coords (B, Ht, Wt, 2) with an
    in-bounds validity mask — the reference's grid_sample wrapper
    (`sampler_ops.py:4-18`), NHWC and without the NDC round trip."""
    from sndepth_tpu.ops.warp import bilinear_sampler_zero_pad
    b, h, w, _ = img.shape
    x, y = coords[..., 0], coords[..., 1]
    valid = ((x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1))
    return bilinear_sampler_zero_pad(img, coords), valid.astype(img.dtype)


def depth_sampler(depths: Array, coords: Array) -> tuple[Array, Array]:
    """Sample a depth map (B, H, W) at coords (B, Ht, Wt, 2)."""
    sampled, valid = grid_sampler(depths[..., None], coords)
    return sampled[..., 0], valid
