"""NMS-free box decoding (top-k over class scores).

Parity with `/root/reference/models/register_module/nms_free_coder.py:10`
and `detr3d_track_coder.py:10`: sigmoid scores over (num_query x
num_classes), top-k selection, box denormalization, post-center range and
score-threshold masks. Fixed-size outputs with a validity mask instead of
boolean filtering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sndepth_tpu.utils.uniad import denormalize_bbox

Array = jax.Array


def nms_free_decode(cls_scores: Array, bbox_preds: Array, max_num: int = 100,
                    score_threshold: float | None = None,
                    post_center_range=None,
                    obj_idxes: Array | None = None,
                    track_scores: Array | None = None) -> dict:
    """cls_scores: (nq, num_classes) logits; bbox_preds: (nq, 10).

    Returns dict of fixed-size arrays (max_num leading dim) + ``valid``
    mask. With ``obj_idxes``/``track_scores`` given, behaves like
    DETRTrack3DCoder (track scores select, obj ids pass through).
    """
    nq, num_classes = cls_scores.shape
    probs = jax.nn.sigmoid(cls_scores)

    if track_scores is None:
        flat = probs.reshape(-1)
        k = min(max_num, flat.shape[0])
        scores, idx = jax.lax.top_k(flat, k)
        query_idx = idx // num_classes
        labels = idx % num_classes
    else:
        k = min(max_num, nq)
        scores, query_idx = jax.lax.top_k(track_scores, k)
        labels = jnp.argmax(probs[query_idx], axis=-1)

    boxes = denormalize_bbox(bbox_preds[query_idx])
    valid = jnp.ones((k,), bool)
    if score_threshold is not None:
        valid &= scores > score_threshold
    if post_center_range is not None:
        rng = jnp.asarray(post_center_range)
        centers = boxes[..., :3]
        valid &= jnp.all(centers >= rng[:3], axis=-1)
        valid &= jnp.all(centers <= rng[3:], axis=-1)

    out = {"bboxes": boxes, "scores": scores, "labels": labels,
           "valid": valid, "query_idx": query_idx}
    if obj_idxes is not None:
        out["obj_idxes"] = obj_idxes[query_idx]
    return out
