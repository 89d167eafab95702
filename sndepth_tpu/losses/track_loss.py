"""Track losses: focal classification, L1 box regression, Hungarian
matching, ClipMatcher.

Re-design of `/root/reference/models/register_module/track_loss.py` and
`hungarian_assigner_3d_track.py` / `match_cost.py`:
* focal loss (gamma=2, alpha=0.25) and weighted L1 over normalized boxes;
* assignment cost = focal-style cls cost + L1 box cost
  (`hungarian_assigner_3d_track.py:14-122`, `match_cost.py:7-30`);
* assignment solve: on-device auction LAP (:mod:`sndepth_tpu.losses.lap`)
  by default — no host sync inside the jitted train step; set
  ``SNDEPTH_LAP_BACKEND=scipy`` for the reference-identical
  ``scipy.optimize.linear_sum_assignment`` behind ``jax.pure_callback``
  (fixed-size cost in, fixed-size assignment out, so it composes with
  jit), exactly as the reference calls scipy;
* ClipMatcher: per-frame matching against GT with already-tracked objects
  pinned to their slots, num-boxes normalization via ``psum`` when running
  under pmap/pjit (the reference's ``get_world_size`` normalization,
  `track_loss.py:28-41`).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_LAP_BACKEND = os.environ.get("SNDEPTH_LAP_BACKEND", "auction")


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


def dice_cost(pred_masks: Array, gt_masks: Array,
              weight: float = 1.0) -> Array:
    """(n1, H1, W1) predicted masks x (n2, H2, W2) GT masks -> (n1, n2)
    soft-Dice matching cost (`match_cost.py:32-84` DiceCost): GT is
    bilinearly resized to the prediction grid, then
    ``1 - 2<p,g> / (|p|^2 + |g|^2 + 2e-3)``.

    Flattened-inner-product form maps the pairwise numerator onto one MXU
    matmul instead of the reference's broadcasted elementwise product."""
    n1, h1, w1 = pred_masks.shape
    n2, h2, w2 = gt_masks.shape
    if (h1, w1) != (h2, w2):
        # antialias=False matches torch F.interpolate(mode='bilinear')
        gt_masks = jax.image.resize(gt_masks, (n2, h1, w1),
                                    method="linear", antialias=False)
    p = pred_masks.reshape(n1, -1)
    g = gt_masks.reshape(n2, -1)
    a = p @ g.T
    b = jnp.sum(p * p, axis=-1)[:, None] + 1e-3
    c = jnp.sum(g * g, axis=-1)[None, :] + 1e-3
    return (1.0 - 2.0 * a / (b + c)) * weight


def hungarian_match(cost: Array, valid_cols: Array) -> tuple[Array, Array]:
    """Linear-sum assignment over a fixed-size cost matrix.

    cost: (nq, ng_max); valid_cols: (ng_max,) bool mask of real GT columns.
    Invalid columns get +inf-ish cost and are excluded on the host.
    Returns (row_idx, col_idx) each (ng_max,) with -1 padding: the query
    assigned to each GT column (or -1).

    Backend: ``SNDEPTH_LAP_BACKEND=auction`` (default, on-device
    eps-scaled auction — within ng*1e-3 of optimal, no host callback) or
    ``scipy`` (exact Hungarian on host via pure_callback).
    """
    nq, ng = cost.shape

    if _LAP_BACKEND != "scipy":
        from sndepth_tpu.losses.lap import auction_lap
        rows = auction_lap(jax.lax.stop_gradient(cost),
                           jax.lax.stop_gradient(valid_cols))
        cols = jnp.where(rows >= 0, jnp.arange(ng, dtype=jnp.int32), -1)
        return rows, cols

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
    # Assignment is discrete: gradients never flow through it (the
    # reference's scipy matcher runs under no_grad likewise), so detach
    # the cost — pure_callback has no JVP rule.
    return jax.pure_callback(_solve, out_shape,
                             jax.lax.stop_gradient(cost),
                             jax.lax.stop_gradient(valid_cols),
                             vmap_method="sequential")


def match_frame(logits: Array, boxes: Array, gt_labels: Array,
                gt_boxes: Array, gt_valid: Array,
                pinned_query: Array | None = None,
                cls_weight: float = 2.0, bbox_weight: float = 0.25,
                exclude_query: Array | None = None
                ) -> tuple[Array, Array]:
    """Assign GTs to queries (ClipMatcher inner step).

    ``pinned_query[g]`` >= 0 pins GT g to that query slot (an object
    already tracked keeps its slot, `track_loss.py` per-frame logic);
    unmatched GTs go through Hungarian on the remaining queries.
    ``exclude_query`` (nq,) bool removes slots from Hungarian competition
    (the reference only matches slots with obj_idx == -1; sdc/FP slots are
    -2, `track_loss.py:415-418`).
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
    if exclude_query is not None:
        pinned_mask_q = pinned_mask_q | exclude_query
    cost = jnp.where(pinned_mask_q[:, None], 1e9, cost)

    need_match = gt_valid & (pinned_query < 0)
    rows, _ = hungarian_match(cost, need_match)
    assigned = jnp.where(pinned_query >= 0, pinned_query, rows)
    matched = gt_valid & (assigned >= 0)
    return assigned, matched


def frame_losses(logits: Array, boxes: Array, gt_labels: Array,
                 gt_boxes: Array, gt_valid: Array, assigned: Array,
                 matched: Array, num_classes: int,
                 num_boxes: Array | None = None,
                 cls_weight: float = 1.0, bbox_weight: float = 1.0,
                 code_weights=None, sdc_slot: int | None = None,
                 sdc_label: Array | None = None,
                 sdc_box: Array | None = None) -> dict:
    """Focal cls over all queries + (code-)weighted L1 over matched pairs.

    ``num_boxes`` is the cross-device box count for normalization; under
    pjit/pmap pass ``jax.lax.psum(local_count, 'data')`` (the reference's
    world-size normalization, `track_loss.py:28-41`).
    With ``sdc_slot`` set, the ego (sdc) query contributes an extra cls +
    bbox term against ``sdc_label``/``sdc_box`` (`track_loss.py:251-262,
    303-328`).
    """
    nq = logits.shape[0]
    if num_boxes is None:
        num_boxes = jnp.maximum(jnp.sum(matched.astype(jnp.float32)), 1.0)

    # classification targets: background everywhere, GT class at assigned.
    onehot = jnp.zeros((nq, num_classes))
    safe_q = jnp.clip(assigned, 0, nq - 1)
    updates = jax.nn.one_hot(gt_labels, num_classes) * matched[:, None]
    onehot = onehot.at[safe_q].add(updates)
    if sdc_slot is not None and sdc_label is not None:
        onehot = onehot.at[sdc_slot].set(
            jax.nn.one_hot(sdc_label, num_classes))
    onehot = jnp.clip(onehot, 0.0, 1.0)
    loss_cls = jnp.sum(sigmoid_focal_loss(logits, onehot)) / num_boxes

    cw = (jnp.asarray(code_weights, boxes.dtype) if code_weights is not None
          else jnp.ones((boxes.shape[-1],), boxes.dtype))
    pred = boxes[safe_q]
    l1 = jnp.sum(jnp.abs(pred - gt_boxes) * cw, axis=-1) * matched
    loss_bbox = jnp.sum(l1)
    if sdc_slot is not None and sdc_box is not None:
        loss_bbox = loss_bbox + jnp.sum(
            jnp.abs(boxes[sdc_slot] - sdc_box) * cw)
    loss_bbox = loss_bbox / num_boxes
    return {"loss_cls": cls_weight * loss_cls,
            "loss_bbox": bbox_weight * loss_bbox}


def past_traj_loss(pred_trajs: Array, gt_trajs: Array, gt_traj_mask: Array,
                   assigned: Array, matched: Array) -> Array:
    """Masked L1 past-trajectory loss (`track_loss.py:191-234`).

    pred_trajs: (nq, steps, 2); gt_trajs/gt_traj_mask: (ng, steps, 2);
    assigned/matched: (ng,) query index per GT / valid-match mask.
    compute_past_traj_loss: sum(|src-tgt| * mask) / (sum(mask>0) + 1e-5).
    """
    nq = pred_trajs.shape[0]
    safe_q = jnp.clip(assigned, 0, nq - 1)
    src = pred_trajs[safe_q]                          # (ng, steps, 2)
    m = gt_traj_mask * matched[:, None, None]
    loss = jnp.sum(jnp.abs(src - gt_trajs) * m)
    return loss / (jnp.sum((m > 0).astype(loss.dtype)) + 1e-5)


# Default mmdet code_weights (`track_loss.py:67-69`), truncated to the
# 10-dim track box layout [cx, cy, w, l, cz, h, sin, cos, vx, vy]: the
# velocity dims are down-weighted.
CODE_WEIGHTS_10 = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2)


def train_frame_layer_losses(
        layer_logits: Array, layer_boxes: Array, layer_trajs: Array,
        obj_idxes: Array, gt: dict, num_classes: int,
        cls_weight: float = 2.0, bbox_weight: float = 0.25,
        traj_weight: float = 1.0, sdc_slot: int | None = None,
        axis_name: str | None = None) -> tuple[dict, Array, Array, Array]:
    """One training frame of the ClipMatcher over every decoder layer
    (`track_loss.py:352-556` match_for_single_frame, incl. the aux-layer
    loop at `:524-553`).

    layer_*: (L, nq, ...) per-decoder-layer predictions; the FINAL layer's
    matching decides the track->GT binding carried to the next frame; each
    aux layer re-matches the unmatched slots against its own predictions
    but shares the pinned (already-tracked) assignments, exactly as the
    reference re-runs ``match_for_single_decoder_layer`` per aux output.

    obj_idxes: (nq,) GT instance ids currently bound to slots (-1 free,
    -2 reserved: sdc/FP slots never enter matching).
    gt: {labels (ng,), boxes (ng,10), valid (ng,), instance_ids (ng,),
         past_traj (ng,steps,2), past_traj_mask (ng,steps,2),
         sdc_label () , sdc_box (10,)}  (sdc_* optional).

    Returns (losses dict with loss_cls/loss_bbox/loss_past_trajs summed
    over layers, new_obj_idxes, final assigned (ng,), final matched (ng,)).
    """
    num_layers, nq = layer_logits.shape[:2]
    inst = gt["instance_ids"]

    # Pinning: GT g sits on slot q if obj_idxes[q] == instance_ids[g] >= 0.
    same = (obj_idxes[None, :] == inst[:, None]) & (inst[:, None] >= 0)
    pinned = jnp.where(jnp.any(same, axis=1),
                       jnp.argmax(same, axis=1), -1).astype(jnp.int32)

    # Slots excluded from Hungarian competition: already bound or reserved.
    reserved = obj_idxes != -1
    if sdc_slot is not None:
        reserved = reserved | (jnp.arange(nq) == sdc_slot)

    # num_samples accounting (`track_loss.py:509`): GTs + disappeared
    # tracks (slots bound to an instance absent from this frame's GT).
    bound = obj_idxes >= 0
    present = jnp.any((obj_idxes[:, None] == inst[None, :]) &
                      (gt["valid"][None, :]), axis=1)
    num_disappear = jnp.sum((bound & ~present).astype(jnp.float32))
    num_valid_gt = jnp.sum(gt["valid"].astype(jnp.float32))
    num_samples = num_valid_gt + num_disappear

    def one_layer(logits, boxes, trajs, final):
        assigned, matched = match_frame(
            logits, boxes, gt["labels"], gt["boxes"], gt["valid"], pinned,
            exclude_query=reserved)
        nb = jnp.maximum(num_samples, 1.0)
        if axis_name is not None:
            nb = jnp.maximum(jax.lax.pmean(num_samples, axis_name), 1.0)
        losses = frame_losses(logits, boxes, gt["labels"], gt["boxes"],
                              gt["valid"], assigned, matched, num_classes,
                              num_boxes=nb, cls_weight=cls_weight,
                              bbox_weight=bbox_weight,
                              code_weights=CODE_WEIGHTS_10,
                              sdc_slot=sdc_slot,
                              sdc_label=gt.get("sdc_label"),
                              sdc_box=gt.get("sdc_box"))
        losses["loss_past_trajs"] = traj_weight * past_traj_loss(
            trajs, gt["past_traj"], gt["past_traj_mask"], assigned, matched)
        return losses, assigned, matched

    total = {"loss_cls": 0.0, "loss_bbox": 0.0, "loss_past_trajs": 0.0}
    final_assigned = final_matched = None
    for li in range(num_layers):
        is_final = li == num_layers - 1
        losses, assigned, matched = one_layer(
            layer_logits[li], layer_boxes[li], layer_trajs[li], is_final)
        for k in total:
            total[k] = total[k] + losses[k]
        if is_final:
            final_assigned, final_matched = assigned, matched

    # Bind newly matched slots to their GT instance ids (final layer only,
    # `track_loss.py:479-484`).
    new_obj = obj_idxes
    upd = final_matched & (pinned < 0)
    safe_q = jnp.clip(final_assigned, 0, nq - 1)
    new_obj = new_obj.at[safe_q].set(
        jnp.where(upd, inst, new_obj[safe_q]))
    return total, new_obj, final_assigned, final_matched


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
