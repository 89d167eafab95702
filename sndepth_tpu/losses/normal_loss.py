"""Surface-normal training loss (uncertainty-weighted angular NLL).

The reference repo consumes pretrained normal weights and ships no normal
training loss; this supplies the loss its decoder's kappa channel exists
for (the NLL of the angular von-Mises-Fisher-style model from the
surface_normal_uncertainty lineage whose decoder the reference vendors):

    L = -log kappa + kappa * arccos(<n_pred, n_gt>) + log(1 + exp(-k*pi))
        (the "NLL_angmf" form, up to the constant normalizer)

applied per scale to the decoder's sampled points (train mode) or dense
maps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def angular_nll(pred: Array, gt: Array, mask: Array | None = None) -> Array:
    """pred: (..., 4) [unit normal | kappa]; gt: (..., 3) unit normals."""
    n_pred = pred[..., :3]
    kappa = pred[..., 3]
    cos = jnp.clip(jnp.sum(n_pred * gt, axis=-1), -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos)
    loss = (-jnp.log(jnp.square(kappa) + 1.0)
            + kappa * theta
            + jnp.log(1.0 + jnp.exp(-kappa * jnp.pi)))
    if mask is not None:
        return jnp.sum(loss * mask) / (jnp.sum(mask) + 1e-8)
    return jnp.mean(loss)


def decoder_multi_scale_loss(norm_outs, sampled_preds, sampled_idx,
                             gt_normals: Array,
                             gt_mask: Array | None = None) -> Array:
    """Loss over the decoder's pyramid: the coarsest (dense) output plus
    each scale's sampled refinement points, with GT gathered at the sample
    coordinates.

    norm_outs[s]: (B, h_s, w_s, 4); sampled_preds[s]: (B, N, 4) (s >= 1);
    sampled_idx[s]: (rows, cols); gt_normals: (B, H, W, 3) at full res.
    """
    from sndepth_tpu.models.normal_decoder import gather_points
    from sndepth_tpu.ops.resize import resize_bilinear_align_corners

    total = 0.0
    # dense coarse term
    coarse = norm_outs[0]
    gt_c = resize_bilinear_align_corners(gt_normals, coarse.shape[1],
                                         coarse.shape[2])
    gt_c = gt_c / (jnp.linalg.norm(gt_c, axis=-1, keepdims=True) + 1e-8)
    mask_c = None
    if gt_mask is not None:
        mask_c = resize_bilinear_align_corners(
            gt_mask.astype(jnp.float32)[..., None], coarse.shape[1],
            coarse.shape[2])[..., 0] > 0.5
    total = total + angular_nll(coarse, gt_c,
                                mask_c.astype(jnp.float32)
                                if mask_c is not None else None)

    for s in range(1, len(norm_outs)):
        if sampled_preds[s] is None or sampled_idx[s] is None:
            continue
        h_s, w_s = norm_outs[s].shape[1:3]
        gt_s = resize_bilinear_align_corners(gt_normals, h_s, w_s)
        gt_s = gt_s / (jnp.linalg.norm(gt_s, axis=-1, keepdims=True) + 1e-8)
        if isinstance(sampled_idx[s], tuple):
            # gather form: (B, N, 4) points at (rows, cols)
            rows, cols = sampled_idx[s]
            gt_pts = gather_points(gt_s, rows, cols)
            mask_pts = None
            if gt_mask is not None:
                m = resize_bilinear_align_corners(
                    gt_mask.astype(jnp.float32)[..., None], h_s, w_s)
                mask_pts = gather_points(m, rows, cols)[..., 0]
            total = total + angular_nll(sampled_preds[s], gt_pts, mask_pts)
        else:
            # dense form: (B, h, w, 4) prediction + (B, h, w) selection
            # mask — same weighted mean over the same selected points.
            sel = sampled_idx[s]
            if gt_mask is not None:
                m = resize_bilinear_align_corners(
                    gt_mask.astype(jnp.float32)[..., None], h_s, w_s)
                sel = sel * m[..., 0]
            total = total + angular_nll(sampled_preds[s], gt_s, sel)
    return total / len(norm_outs)
