"""Rotated BEV IoU vs a Monte-Carlo rasterization oracle."""

import numpy as np
import jax.numpy as jnp

from sndepth_tpu.ops.box_iou import box_corners, iou_3d, rotated_bev_iou


def _mc_iou(b1, b2, n=400):
    """Grid-sampling oracle for rotated-rect IoU."""
    def inside(pts, box):
        cx, cy, w, l, r = box
        rel = pts - np.array([cx, cy])
        cos, sin = np.cos(-r), np.sin(-r)
        x = rel[:, 0] * cos - rel[:, 1] * sin
        y = rel[:, 0] * sin + rel[:, 1] * cos
        return (np.abs(x) <= w / 2) & (np.abs(y) <= l / 2)

    lo = np.minimum(b1[:2], b2[:2]) - max(b1[2] + b1[3], b2[2] + b2[3])
    hi = np.maximum(b1[:2], b2[:2]) + max(b1[2] + b1[3], b2[2] + b2[3])
    xs = np.linspace(lo[0], hi[0], n)
    ys = np.linspace(lo[1], hi[1], n)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel()], -1)
    in1 = inside(pts, b1)
    in2 = inside(pts, b2)
    inter = np.sum(in1 & in2)
    union = np.sum(in1 | in2)
    return inter / max(union, 1)


def test_identical_boxes():
    b = jnp.array([[1.0, 2.0, 2.0, 4.0, 0.3]])
    iou = np.asarray(rotated_bev_iou(b, b))
    np.testing.assert_allclose(iou, 1.0, atol=1e-4)


def test_disjoint_boxes():
    b1 = jnp.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b2 = jnp.array([[10.0, 10.0, 1.0, 1.0, 0.5]])
    np.testing.assert_allclose(np.asarray(rotated_bev_iou(b1, b2)), 0.0,
                               atol=1e-6)


def test_axis_aligned_overlap():
    # unit squares overlapping by half
    b1 = jnp.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b2 = jnp.array([[0.5, 0.0, 1.0, 1.0, 0.0]])
    # inter 0.5, union 1.5 -> 1/3
    np.testing.assert_allclose(np.asarray(rotated_bev_iou(b1, b2)),
                               1.0 / 3.0, atol=1e-4)


def test_rotated_vs_monte_carlo():
    rng = np.random.RandomState(0)
    for _ in range(6):
        b1 = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1),
                       rng.uniform(1, 3), rng.uniform(1, 3),
                       rng.uniform(-np.pi, np.pi)], np.float32)
        b2 = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1),
                       rng.uniform(1, 3), rng.uniform(1, 3),
                       rng.uniform(-np.pi, np.pi)], np.float32)
        got = float(rotated_bev_iou(jnp.array(b1)[None],
                                    jnp.array(b2)[None])[0, 0])
        want = _mc_iou(b1, b2)
        np.testing.assert_allclose(got, want, atol=0.02)


def test_iou3d_height_overlap():
    b1 = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    b2 = jnp.array([[0.0, 0.0, 1.0, 2.0, 2.0, 2.0, 0.0]])
    # same footprint, z-overlap 1 of 2 -> inter 4, union 12 -> 1/3
    np.testing.assert_allclose(np.asarray(iou_3d(b1, b2)), 1.0 / 3.0,
                               atol=1e-4)


def test_corners():
    c = np.asarray(box_corners(jnp.array([0.0, 0.0, 2.0, 4.0, 0.0])))
    assert c.shape == (4, 2)
    np.testing.assert_allclose(sorted(c[:, 0].tolist()), [-1, -1, 1, 1])
    np.testing.assert_allclose(sorted(c[:, 1].tolist()), [-2, -2, 2, 2])
