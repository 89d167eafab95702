"""Track losses: focal classification, L1 box regression, Hungarian
matching, ClipMatcher.

Re-design of `/root/reference/models/register_module/track_loss.py` and
`hungarian_assigner_3d_track.py` / `match_cost.py`:
* focal loss (gamma=2, alpha=0.25) and weighted L1 over normalized boxes;
* assignment cost = focal-style cls cost + L1 box cost
  (`hungarian_assigner_3d_track.py:14-122`, `match_cost.py:7-30`);
* Hungarian solve via ``scipy.optimize.linear_sum_assignment`` behind
  ``jax.pure_callback`` (fixed-size cost in, fixed-size assignment out, so
  it composes with jit), exactly as the reference calls scipy;
* ClipMatcher: per-frame matching against GT with already-tracked objects
  pinned to their slots, num-boxes normalization via ``psum`` when running
  under pmap/pjit (the reference's ``get_world_size`` normalization,
  `track_loss.py:28-41`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def sigmoid_focal_loss(logits: Array, targets: Array, alpha: float = 0.25,
                       gamma: float = 2.0) -> Array:
    """Per-element focal loss; targets are {0,1} same shape as logits."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def optax_sigmoid_ce(logits: Array, labels: Array) -> Array:
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def focal_cls_cost(logits: Array, gt_labels: Array, alpha: float = 0.25,
                   gamma: float = 2.0) -> Array:
    """(nq, C) logits x (ng,) labels -> (nq, ng) classification cost
    (`match_cost` FocalLossCost semantics)."""
    p = jax.nn.sigmoid(logits)
    eps = 1e-12
    neg_cost = -jnp.log(1 - p + eps) * (1 - alpha) * (p ** gamma)
    pos_cost = -jnp.log(p + eps) * alpha * ((1 - p) ** gamma)
    return (pos_cost - neg_cost)[:, gt_labels]


def l1_bbox_cost(pred_boxes: Array, gt_boxes: Array) -> Array:
    """(nq, D) x (ng, D) -> (nq, ng) L1 cost (BBox3DL1Cost)."""
    return jnp.sum(
        jnp.abs(pred_boxes[:, None, :] - gt_boxes[None, :, :]), axis=-1)


def hungarian_match(cost: Array, valid_cols: Array) -> tuple[Array, Array]:
    """Linear-sum assignment over a fixed-size cost matrix.

    cost: (nq, ng_max); valid_cols: (ng_max,) bool mask of real GT columns.
    Invalid columns get +inf-ish cost and are excluded on the host.
    Returns (row_idx, col_idx) each (ng_max,) with -1 padding: the query
    assigned to each GT column (or -1).
    """
    nq, ng = cost.shape

    def _solve(c, v):
        from scipy.optimize import linear_sum_assignment
        c = np.asarray(c, np.float64)
        v = np.asarray(v, bool)
        rows = np.full((ng,), -1, np.int32)
        cols = np.full((ng,), -1, np.int32)
        idx = np.nonzero(v)[0]
        if len(idx):
            sub = c[:, idx]
            r, csub = linear_sum_assignment(sub)
            for ri, ci in zip(r, csub):
                rows[idx[ci]] = ri
                cols[idx[ci]] = idx[ci]
        return rows, cols

    out_shape = (jax.ShapeDtypeStruct((ng,), jnp.int32),
                 jax.ShapeDtypeStruct((ng,), jnp.int32))
    return jax.pure_callback(_solve, out_shape, cost, valid_cols,
                             vmap_method="sequential")


def match_frame(logits: Array, boxes: Array, gt_labels: Array,
                gt_boxes: Array, gt_valid: Array,
                pinned_query: Array | None = None,
                cls_weight: float = 2.0, bbox_weight: float = 0.25
                ) -> tuple[Array, Array]:
    """Assign GTs to queries (ClipMatcher inner step).

    ``pinned_query[g]`` >= 0 pins GT g to that query slot (an object
    already tracked keeps its slot, `track_loss.py` per-frame logic);
    unmatched GTs go through Hungarian on the remaining queries.
    Returns (assigned_query_per_gt (ng,), matched mask (ng,)).
    """
    nq = logits.shape[0]
    ng = gt_labels.shape[0]
    cost = (cls_weight * focal_cls_cost(logits, gt_labels) +
            bbox_weight * l1_bbox_cost(boxes, gt_boxes))

    if pinned_query is None:
        pinned_query = jnp.full((ng,), -1, jnp.int32)

    # Exclude pinned queries from Hungarian competition.
    pinned_mask_q = jnp.zeros((nq,), bool)
    pinned_mask_q = pinned_mask_q.at[
        jnp.clip(pinned_query, 0, nq - 1)].set(pinned_query >= 0)
    cost = jnp.where(pinned_mask_q[:, None], 1e9, cost)

    need_match = gt_valid & (pinned_query < 0)
    rows, _ = hungarian_match(cost, need_match)
    assigned = jnp.where(pinned_query >= 0, pinned_query, rows)
    matched = gt_valid & (assigned >= 0)
    return assigned, matched


def frame_losses(logits: Array, boxes: Array, gt_labels: Array,
                 gt_boxes: Array, gt_valid: Array, assigned: Array,
                 matched: Array, num_classes: int,
                 num_boxes: Array | None = None) -> dict:
    """Focal cls over all queries + L1 over matched pairs.

    ``num_boxes`` is the cross-device box count for normalization; under
    pjit/pmap pass ``jax.lax.psum(local_count, 'data')`` (the reference's
    world-size normalization, `track_loss.py:28-41`).
    """
    nq = logits.shape[0]
    if num_boxes is None:
        num_boxes = jnp.maximum(jnp.sum(matched.astype(jnp.float32)), 1.0)

    # classification targets: background everywhere, GT class at assigned.
    onehot = jnp.zeros((nq, num_classes))
    safe_q = jnp.clip(assigned, 0, nq - 1)
    updates = jax.nn.one_hot(gt_labels, num_classes) * matched[:, None]
    onehot = onehot.at[safe_q].add(updates)
    onehot = jnp.clip(onehot, 0.0, 1.0)
    loss_cls = jnp.sum(sigmoid_focal_loss(logits, onehot)) / num_boxes

    pred = boxes[safe_q]
    l1 = jnp.sum(jnp.abs(pred - gt_boxes), axis=-1) * matched
    loss_bbox = jnp.sum(l1) / num_boxes
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox}


def clip_matcher_loss(per_frame_outputs: list[dict],
                      per_frame_gt: list[dict], num_classes: int = 10,
                      axis_name: str | None = None) -> dict:
    """MOTR-style clip loss: match each frame, pinning objects that were
    matched in earlier frames to their slots.

    per_frame_outputs[t]: {"logits": (nq, C), "boxes": (nq, 10),
                           "obj_idxes": (nq,)}
    per_frame_gt[t]: {"labels": (ng,), "boxes": (ng, 10), "valid": (ng,),
                      "instance_ids": (ng,)}
    """
    total_cls = 0.0
    total_bbox = 0.0
    for out, gt in zip(per_frame_outputs, per_frame_gt):
        # Pin GTs whose instance id is already on a query slot.
        obj = out["obj_idxes"]                         # (nq,)
        inst = gt["instance_ids"]                      # (ng,)
        same = (obj[None, :] == inst[:, None]) & (inst[:, None] >= 0)
        pinned = jnp.where(jnp.any(same, axis=1),
                           jnp.argmax(same, axis=1), -1).astype(jnp.int32)

        num_local = jnp.sum(gt["valid"].astype(jnp.float32))
        if axis_name is not None:
            num_boxes = jnp.maximum(
                jax.lax.pmean(num_local, axis_name), 1.0)
        else:
            num_boxes = jnp.maximum(num_local, 1.0)

        assigned, matched = match_frame(out["logits"], out["boxes"],
                                        gt["labels"], gt["boxes"],
                                        gt["valid"], pinned)
        losses = frame_losses(out["logits"], out["boxes"], gt["labels"],
                              gt["boxes"], gt["valid"], assigned, matched,
                              num_classes, num_boxes)
        total_cls += losses["loss_cls"]
        total_bbox += losses["loss_bbox"]
    n = len(per_frame_outputs)
    return {"loss_cls": total_cls / n, "loss_bbox": total_bbox / n,
            "loss_total": (total_cls + total_bbox) / n}
