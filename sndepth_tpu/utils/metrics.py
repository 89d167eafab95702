"""Evaluation metrics: depth (Eigen), surface normals, segmentation mIoU.

Formula parity with the reference:
* depth: `/root/reference/models/test_disp.py:129-148` (plus the GT-median
  scaling + clip protocol at `:107-116`, caps `:24-25`);
* normals: `/root/reference/utils/utils_coders.py:73-84`;
* mIoU: `/root/reference/evaluate.py:12-22` (confusion-matrix per-class IoU).

Implemented in jnp so whole-dataset evaluation can run jitted on device; all
functions also accept numpy arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

DEPTH_MIN = 1e-3   # `test_disp.py:24`
DEPTH_MAX = 80.0   # `test_disp.py:25`

DEPTH_ERROR_NAMES = ("abs_diff", "abs_rel", "sq_rel", "rms", "log_rms",
                     "abs_log", "a1", "a2", "a3")


def compute_depth_errors(gt: Array, pred: Array) -> dict:
    """Eigen-style depth metrics over flattened valid pixels."""
    gt = jnp.asarray(gt, jnp.float32)
    pred = jnp.asarray(pred, jnp.float32)
    thresh = jnp.maximum(gt / pred, pred / gt)
    log_diff = jnp.log(gt) - jnp.log(pred)
    return {
        "abs_diff": jnp.mean(jnp.abs(gt - pred)),
        "abs_rel": jnp.mean(jnp.abs(gt - pred) / gt),
        "sq_rel": jnp.mean((gt - pred) ** 2 / gt),
        "rms": jnp.sqrt(jnp.mean((gt - pred) ** 2)),
        "log_rms": jnp.sqrt(jnp.mean(log_diff ** 2)),
        "abs_log": jnp.mean(jnp.abs(log_diff)),
        "a1": jnp.mean(thresh < 1.25),
        "a2": jnp.mean(thresh < 1.25 ** 2),
        "a3": jnp.mean(thresh < 1.25 ** 3),
    }


def median_scaled_depth_errors(gt: Array, pred: Array,
                               mask: Array | None = None) -> dict:
    """The full eval protocol: mask, clip to [1e-3, 80], scale prediction by
    median(gt)/median(pred), then compute the metric set."""
    gt = jnp.asarray(gt, jnp.float32).ravel()
    pred = jnp.asarray(pred, jnp.float32).ravel()
    if mask is not None:
        # Host-side protocol (variable-size); fine outside jit.
        m = jnp.asarray(mask).ravel()
        gt, pred = gt[m], pred[m]
    pred = jnp.clip(pred, DEPTH_MIN, DEPTH_MAX)
    scale = jnp.median(gt) / jnp.median(pred)
    return compute_depth_errors(gt, pred * scale)


def normal_angular_errors(pred_normals: Array, gt_normals: Array,
                          mask: Array | None = None) -> Array:
    """Per-pixel angular error in degrees between unit-ish normal maps.

    pred/gt: (..., 3). Returns the flattened error vector (optionally
    masked) to feed :func:`compute_normal_errors`.
    """
    pred = jnp.asarray(pred_normals, jnp.float32)
    gt = jnp.asarray(gt_normals, jnp.float32)
    pred = pred / (jnp.linalg.norm(pred, axis=-1, keepdims=True) + 1e-12)
    gt = gt / (jnp.linalg.norm(gt, axis=-1, keepdims=True) + 1e-12)
    cos = jnp.clip(jnp.sum(pred * gt, axis=-1), -1.0, 1.0)
    err = jnp.degrees(jnp.arccos(cos)).ravel()
    if mask is not None:
        err = err[jnp.asarray(mask).ravel()]
    return err


def compute_normal_errors(errors: Array) -> dict:
    """Aggregate angular-error stats (`utils_coders.py:73-84`)."""
    e = jnp.asarray(errors, jnp.float32)
    n = e.shape[0]
    return {
        "mean": jnp.mean(e),
        "median": jnp.median(e),
        "rmse": jnp.sqrt(jnp.sum(e * e) / n),
        "a1": 100.0 * jnp.sum(e < 5) / n,
        "a2": 100.0 * jnp.sum(e < 7.5) / n,
        "a3": 100.0 * jnp.sum(e < 11.25) / n,
        "a4": 100.0 * jnp.sum(e < 22.5) / n,
        "a5": 100.0 * jnp.sum(e < 30) / n,
    }


def confusion_matrix(pred: Array, target: Array, num_classes: int) -> Array:
    """(num_classes, num_classes) confusion counts; rows = target."""
    pred = jnp.asarray(pred).ravel().astype(jnp.int32)
    target = jnp.asarray(target).ravel().astype(jnp.int32)
    idx = target * num_classes + pred
    counts = jnp.bincount(idx, length=num_classes * num_classes)
    return counts.reshape(num_classes, num_classes)


def mean_iou(pred: Array, target: Array, num_classes: int) -> Array:
    """Mean per-class IoU from a confusion matrix (`evaluate.py:12-22`).

    Classes absent from both prediction and target contribute IoU 0, like
    the reference's nan-free torchmetrics path with zero division -> 0.
    """
    cm = confusion_matrix(pred, target, num_classes).astype(jnp.float32)
    tp = jnp.diag(cm)
    union = cm.sum(0) + cm.sum(1) - tp
    iou = jnp.where(union > 0, tp / jnp.maximum(union, 1.0), 0.0)
    return jnp.mean(iou)
