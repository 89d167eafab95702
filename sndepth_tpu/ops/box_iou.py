"""Rotated BEV / 3-D box IoU in pure JAX.

Replaces the mmdet3d ``iou3d`` CUDA extension the reference's
RuntimeTrackerBase optionally uses for duplicate-track suppression
(`/root/reference/models/track_head_plugin/tracker.py:16-41`).

Intersection of two rotated rectangles is computed with static shapes:
candidate points = corners of A inside B + corners of B inside A + all 16
edge-edge intersections (24 slots, masked), angle-sorted around their
centroid, shoelace area over the valid prefix. Fully vectorized with vmap —
no dynamic shapes, jit/scan safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def box_corners(boxes: Array) -> Array:
    """(..., 5) [cx, cy, w, l, rot] -> (..., 4, 2) corners (ccw)."""
    cx, cy, w, l, r = jnp.moveaxis(boxes, -1, 0)
    cos, sin = jnp.cos(r), jnp.sin(r)
    dx = jnp.stack([w, w, -w, -w], -1) * 0.5
    dy = jnp.stack([l, -l, -l, l], -1) * 0.5
    x = cx[..., None] + dx * cos[..., None] - dy * sin[..., None]
    y = cy[..., None] + dx * sin[..., None] + dy * cos[..., None]
    return jnp.stack([x, y], -1)


def _point_in_rect(points: Array, corners: Array) -> Array:
    """points (P, 2) inside convex quad (4, 2) (ccw or cw tolerant)."""
    a = corners
    b = jnp.roll(corners, -1, axis=0)
    edge = b - a                                      # (4, 2)
    rel = points[:, None, :] - a[None]                # (P, 4, 2)
    cross = edge[None, :, 0] * rel[..., 1] - edge[None, :, 1] * rel[..., 0]
    return jnp.all(cross >= -1e-7, axis=1) | jnp.all(cross <= 1e-7, axis=1)


def _segment_intersections(c1: Array, c2: Array) -> tuple[Array, Array]:
    """All 16 edge-edge intersection points between two quads."""
    p = c1
    r = jnp.roll(c1, -1, axis=0) - c1                 # (4, 2)
    q = c2
    s = jnp.roll(c2, -1, axis=0) - c2

    pi = jnp.repeat(p, 4, axis=0)                     # (16, 2)
    ri = jnp.repeat(r, 4, axis=0)
    qi = jnp.tile(q, (4, 1))
    si = jnp.tile(s, (4, 1))

    denom = ri[:, 0] * si[:, 1] - ri[:, 1] * si[:, 0]
    safe = jnp.where(jnp.abs(denom) < 1e-10, 1.0, denom)
    qp = qi - pi
    t = (qp[:, 0] * si[:, 1] - qp[:, 1] * si[:, 0]) / safe
    u = (qp[:, 0] * ri[:, 1] - qp[:, 1] * ri[:, 0]) / safe
    valid = ((jnp.abs(denom) >= 1e-10) & (t >= 0) & (t <= 1)
             & (u >= 0) & (u <= 1))
    pts = pi + t[:, None] * ri
    return pts, valid


def _polygon_area(points: Array, valid: Array) -> Array:
    """Area of the convex hull of masked points via angle sort + shoelace."""
    count = jnp.sum(valid)
    centroid = jnp.sum(points * valid[:, None], axis=0) / jnp.maximum(
        count, 1.0)
    rel = points - centroid
    ang = jnp.arctan2(rel[:, 1], rel[:, 0])
    ang = jnp.where(valid, ang, 1e9)                  # invalid last
    order = jnp.argsort(ang)
    pts = points[order]
    n = points.shape[0]
    idx = jnp.arange(n)
    nxt = jnp.where(idx + 1 < count, idx + 1, 0)
    p_i = pts[idx]
    p_n = pts[nxt]
    cross = (p_i[:, 0] - centroid[0]) * (p_n[:, 1] - centroid[1]) - \
            (p_n[:, 0] - centroid[0]) * (p_i[:, 1] - centroid[1])
    cross = jnp.where(idx < count, cross, 0.0)
    return jnp.abs(jnp.sum(cross)) * 0.5


def _pair_intersection_area(box1: Array, box2: Array) -> Array:
    c1 = box_corners(box1)
    c2 = box_corners(box2)
    inter_pts, inter_valid = _segment_intersections(c1, c2)
    in1 = _point_in_rect(c1, c2)
    in2 = _point_in_rect(c2, c1)
    points = jnp.concatenate([c1, c2, inter_pts], axis=0)    # (24, 2)
    valid = jnp.concatenate([in1, in2, inter_valid], axis=0)
    area = _polygon_area(points, valid)
    return jnp.where(jnp.sum(valid) >= 3, area, 0.0)


def rotated_bev_iou(boxes1: Array, boxes2: Array) -> Array:
    """(N, 5) x (M, 5) [cx, cy, w, l, rot] -> (N, M) IoU matrix."""
    inter = jax.vmap(lambda b1: jax.vmap(
        lambda b2: _pair_intersection_area(b1, b2))(boxes2))(boxes1)
    a1 = (boxes1[:, 2] * boxes1[:, 3])[:, None]
    a2 = (boxes2[:, 2] * boxes2[:, 3])[None, :]
    return inter / jnp.maximum(a1 + a2 - inter, 1e-7)


def iou_3d(boxes1: Array, boxes2: Array) -> Array:
    """(N, 7) x (M, 7) [cx, cy, cz, w, l, h, rot] -> (N, M) 3-D IoU."""
    bev1 = boxes1[:, [0, 1, 3, 4, 6]]
    bev2 = boxes2[:, [0, 1, 3, 4, 6]]
    inter_bev = rotated_bev_iou(bev1, bev2)
    a1 = (bev1[:, 2] * bev1[:, 3])[:, None]
    a2 = (bev2[:, 2] * bev2[:, 3])[None, :]
    inter_area = inter_bev * (a1 + a2) / (1.0 + inter_bev)

    z1_lo = boxes1[:, 2] - boxes1[:, 5] / 2
    z1_hi = boxes1[:, 2] + boxes1[:, 5] / 2
    z2_lo = boxes2[:, 2] - boxes2[:, 5] / 2
    z2_hi = boxes2[:, 2] + boxes2[:, 5] / 2
    overlap_z = jnp.maximum(
        jnp.minimum(z1_hi[:, None], z2_hi[None, :]) -
        jnp.maximum(z1_lo[:, None], z2_lo[None, :]), 0.0)
    inter_vol = inter_area * overlap_z
    v1 = (boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5])[:, None]
    v2 = (boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5])[None, :]
    return inter_vol / jnp.maximum(v1 + v2 - inter_vol, 1e-7)
