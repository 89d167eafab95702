"""Track runtime state: fixed-capacity Instances, tracker lifecycle,
memory bank, query interaction.

Re-design of `/root/reference/models/track_head_plugin/`:
* :class:`TrackInstances` replaces the Detectron2-style dynamic
  ``Instances`` container (`track_instance.py:6-197`) with a fixed-capacity
  (901-slot) pytree + an ``active`` mask — the reference's boolean indexing
  and list surgery (`track_uniad.py:642-656`) become masked updates, so the
  whole tracker jits and scans;
* :func:`tracker_update` = RuntimeTrackerBase (`tracker.py:16-41`):
  score-threshold birth, miss-tolerance death;
* :class:`MemoryBank` (`modules.py:7-92`): per-track temporal embedding
  FIFO fused by attention;
* :class:`QueryInteractionModule` (`modules.py:115-260`): track-embedding
  update via self-attention + FFN (train-time random drop / FP injection
  are masked ops driven by an rng key);
* :func:`velocity_update_reference_points` (`track_uniad.py:241`).
"""

from __future__ import annotations

from typing import Any

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


@flax.struct.dataclass
class TrackInstances:
    """Fixed-capacity per-query track state (capacity = num_query slots)."""
    ref_pts: Array          # (N, 3) sigmoid-space reference points
    query: Array            # (N, 2C) [query_pos | query_feat] embedding
    output_embedding: Array  # (N, C) last decoder output per slot
    obj_idxes: Array        # (N,) int32, -1 = unassigned slot
    scores: Array           # (N,) float
    track_scores: Array     # (N,) float
    pred_logits: Array      # (N, num_classes)
    pred_boxes: Array       # (N, 10)
    disappear_time: Array   # (N,) int32
    mem_bank: Array         # (N, mem_len, C) embedding FIFO
    mem_valid: Array        # (N, mem_len) bool
    save_period: Array      # (N,) int32 memory-bank save cooldown
    #                         (`modules.py:38-45`)
    iou: Array              # (N,) matched-GT IoU (train bookkeeping,
    #                         `track_uniad.py:210-212`; zeros at inference)

    @property
    def num_slots(self) -> int:
        return self.ref_pts.shape[0]


def empty_tracks(num_query: int, embed_dims: int, num_classes: int = 10,
                 mem_len: int = 4, query_init: Array | None = None,
                 ref_init: Array | None = None) -> TrackInstances:
    """`_generate_empty_tracks` (`track_uniad.py:183`)."""
    c = embed_dims
    return TrackInstances(
        ref_pts=(ref_init if ref_init is not None
                 else jnp.zeros((num_query, 3))),
        query=(query_init if query_init is not None
               else jnp.zeros((num_query, 2 * c))),
        output_embedding=jnp.zeros((num_query, c)),
        obj_idxes=jnp.full((num_query,), -1, jnp.int32),
        scores=jnp.zeros((num_query,)),
        track_scores=jnp.zeros((num_query,)),
        pred_logits=jnp.zeros((num_query, num_classes)),
        pred_boxes=jnp.zeros((num_query, 10)),
        disappear_time=jnp.zeros((num_query,), jnp.int32),
        mem_bank=jnp.zeros((num_query, mem_len, c)),
        mem_valid=jnp.zeros((num_query, mem_len), bool),
        save_period=jnp.zeros((num_query,), jnp.int32),
        iou=jnp.zeros((num_query,)),
    )


def tracker_update(tracks: TrackInstances, score_thresh: float = 0.4,
                   filter_score_thresh: float = 0.35,
                   miss_tolerance: int = 5,
                   next_obj_id: Array | None = None,
                   dedup_iou_threshold: float | None = None
                   ) -> tuple[TrackInstances, Array]:
    """RuntimeTrackerBase.update (`tracker.py:16-41`), fully masked.

    Birth: unassigned slots whose score exceeds ``score_thresh`` get fresh
    object ids. Death: assigned slots under ``filter_score_thresh`` for
    ``miss_tolerance`` consecutive frames are freed (obj_idx = -1).
    With ``dedup_iou_threshold`` set, newborn candidates whose BEV box
    overlaps an existing active track above the threshold are suppressed
    (the reference's optional 3-D-IoU dedup, via
    :func:`sndepth_tpu.ops.box_iou.rotated_bev_iou`).
    Returns (tracks, next_obj_id)."""
    if next_obj_id is None:
        next_obj_id = jnp.zeros((), jnp.int32)
    scores = tracks.track_scores
    assigned = tracks.obj_idxes >= 0

    # Death bookkeeping.
    low = assigned & (scores < filter_score_thresh)
    disappear = jnp.where(low, tracks.disappear_time + 1, 0)
    dead = disappear >= miss_tolerance
    obj_idxes = jnp.where(dead, -1, tracks.obj_idxes)
    disappear = jnp.where(dead, 0, disappear)

    # Birth: enumerate new ids in slot order.
    newborn = (~assigned) & (scores >= score_thresh)
    if dedup_iou_threshold is not None:
        from sndepth_tpu.ops.box_iou import rotated_bev_iou
        from sndepth_tpu.utils.uniad import denormalize_bbox
        boxes = denormalize_bbox(tracks.pred_boxes)       # (N, 9)
        bev = boxes[:, [0, 1, 3, 4, 6]]
        iou = rotated_bev_iou(bev, bev)
        alive = (obj_idxes >= 0).astype(iou.dtype)
        max_overlap = jnp.max(iou * alive[None, :], axis=1)
        newborn = newborn & (max_overlap < dedup_iou_threshold)
    birth_rank = jnp.cumsum(newborn.astype(jnp.int32)) - 1
    obj_idxes = jnp.where(newborn, next_obj_id + birth_rank, obj_idxes)
    next_obj_id = next_obj_id + jnp.sum(newborn.astype(jnp.int32))

    return tracks.replace(obj_idxes=obj_idxes,
                          disappear_time=disappear), next_obj_id


def active_mask(tracks: TrackInstances,
                filter_score_thresh: float = 0.35) -> Array:
    """Slots carried to the next frame (`track_uniad.py:482-488`): assigned
    and either scoring now or not yet timed out."""
    return (tracks.obj_idxes >= 0) & (
        (tracks.track_scores >= filter_score_thresh) |
        (tracks.disappear_time > 0))


def velocity_update_reference_points(tracks: TrackInstances,
                                     velocity_xy: Array, dt: Array,
                                     pc_range) -> TrackInstances:
    """Propagate active reference points by box velocity over dt seconds
    (`track_uniad.py:241-280`), staying in sigmoid grid space."""
    x0, y0, _, x1, y1, _ = pc_range
    ref = tracks.ref_pts
    world_x = ref[:, 0] * (x1 - x0) + x0
    world_y = ref[:, 1] * (y1 - y0) + y0
    world_x = world_x + velocity_xy[:, 0] * dt
    world_y = world_y + velocity_xy[:, 1] * dt
    new_ref = jnp.stack([(world_x - x0) / (x1 - x0),
                         (world_y - y0) / (y1 - y0),
                         ref[:, 2]], axis=-1)
    use = (tracks.obj_idxes >= 0)[:, None]
    return tracks.replace(ref_pts=jnp.where(use, new_ref, ref))


class MemoryBank(nn.Module):
    """Temporal embedding FIFO + attention fusion (`modules.py:7-92`).

    Structure mirrors the reference exactly: ``temporal_attn`` over the
    per-track history bank, residual + ``temporal_norm1``, a
    ``temporal_fc1``/``temporal_fc2`` FFN with residual +
    ``temporal_norm2`` (`modules.py:55-80`) — applied only to slots whose
    newest bank entry is valid, others pass through untouched; the pushed
    embedding goes through ``save_proj`` (`modules.py:47-53`) and saves
    run on a ``save_period`` cooldown of 3 frames above
    ``save_thresh`` (`modules.py:38-45`; the reference train path saves
    every scoring frame — handled by ``train`` here)."""
    embed_dims: int = 256
    mem_len: int = 4
    save_thresh: float = 0.0     # memory_bank_score_thresh (config)
    dtype: Any = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, tracks: TrackInstances) -> TrackInstances:
        emb = tracks.output_embedding                        # (N, C)
        bank = tracks.mem_bank                               # (N, M, C)
        valid = tracks.mem_valid                             # (N, M)

        # Fuse history into the current embedding for slots whose newest
        # memory entry is valid (`modules.py:61`); others pass through.
        q = emb[:, None, :]
        attn = nn.MultiHeadDotProductAttention(
            num_heads=8, dtype=self.dtype, name="temporal_attn")(
                q, bank, mask=valid[:, None, None, :])
        fused = nn.LayerNorm(dtype=self.dtype,
                             name="temporal_norm1")(emb + attn[:, 0])
        # hidden_dim = embed_dims (`track_uniad.py:138-143`)
        ff = nn.Dense(self.embed_dims, dtype=self.dtype,
                      name="temporal_fc1")(fused)
        ff = nn.Dense(self.embed_dims, dtype=self.dtype,
                      name="temporal_fc2")(nn.relu(ff))
        fused = nn.LayerNorm(dtype=self.dtype,
                             name="temporal_norm2")(fused + ff)
        has_hist = valid[:, -1:]
        fused = jnp.where(has_hist, fused, emb)

        # FIFO push on the save-period cooldown (`modules.py:38-53`).
        if self.train:
            save = tracks.scores > 0.0
            period = tracks.save_period
        else:
            save = ((tracks.save_period == 0)
                    & (tracks.scores > self.save_thresh))
            period = jnp.maximum(tracks.save_period - 1, 0)
            period = jnp.where(save, 3, period)
        saved = nn.Dense(self.embed_dims, dtype=self.dtype,
                         name="save_proj")(fused)
        push = save[:, None, None]
        new_bank = jnp.concatenate([bank[:, 1:], saved[:, None]], axis=1)
        new_valid = jnp.concatenate(
            [valid[:, 1:], jnp.ones_like(valid[:, :1])], axis=1)
        bank = jnp.where(push, new_bank, bank)
        valid = jnp.where(push[..., 0], new_valid, valid)

        return tracks.replace(output_embedding=fused, mem_bank=bank,
                              mem_valid=valid, save_period=period)


def qim_select_train(tracks: TrackInstances, rng: Array,
                     random_drop: float = 0.1, fp_ratio: float = 0.3,
                     iou_thresh: float = 0.5) -> Array:
    """Train-time QIM slot selection (`modules.py:190-246`
    ``_select_active_tracks`` / ``_random_drop_tracks`` / ``_add_fp_tracks``)
    as a fixed-capacity masked op.

    Active = bound to a GT with matched IoU above ``iou_thresh``; each
    active slot is dropped with prob ``random_drop``; then ~``fp_ratio``
    false-positive slots per kept track are injected, chosen as the
    top-scoring *inactive* slots (the reference's v2 top-score selection).
    Returns the (N,) bool mask of slots carried to the next frame.
    """
    n = tracks.obj_idxes.shape[0]
    rng_drop, rng_fp = jax.random.split(rng)
    active = (tracks.obj_idxes >= 0) & (tracks.iou > iou_thresh)
    keep = jax.random.uniform(rng_drop, (n,)) > random_drop
    kept_active = active & keep

    # FP injection: num_fp ~ Binomial(kept, fp_ratio); take the top-num_fp
    # scoring inactive slots.
    fp_draw = jax.random.uniform(rng_fp, (n,)) < fp_ratio
    num_fp = jnp.sum((kept_active & fp_draw).astype(jnp.int32))
    inactive = tracks.obj_idxes < 0
    scores = jnp.where(inactive, tracks.scores, -jnp.inf)
    order = jnp.argsort(-scores)                     # best inactive first
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n))
    fp_mask = inactive & (rank < num_fp)
    return kept_active | fp_mask


class QueryInteractionModule(nn.Module):
    """MOTR QIM (`modules.py:115-260`): refresh selected tracks' query
    embeddings. Structure mirrors ``_update_track_embedding``: self-attn
    with q = k = query_pos + output_embedding, value = output_embedding,
    FFN, then a dedicated FFN updating the feature half of the query (and
    optionally the position half, ``update_query_pos`` — True in the
    reference train config, `track_uniad.py:984`)."""
    embed_dims: int = 256
    update_query_pos: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tracks: TrackInstances,
                 update_mask: Array | None = None) -> TrackInstances:
        c = self.embed_dims
        if update_mask is None:
            update_mask = tracks.obj_idxes >= 0
        emb = tracks.output_embedding                        # (N, C)
        query_pos = tracks.query[:, :c]
        query_feat = tracks.query[:, c:]
        mask = update_mask[None]

        qk = (query_pos + emb)[None]                         # (1, N, C)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=8, dtype=self.dtype)(
                qk, qk, emb[None], mask=mask[:, None, None, :])
        tgt = nn.LayerNorm(dtype=self.dtype)(emb[None] + attn)
        # hidden_dim = embed_dims (`track_uniad.py:129-133`)
        ff = nn.Dense(c, dtype=self.dtype)(tgt)
        ff = nn.Dense(c, dtype=self.dtype)(nn.relu(ff))
        tgt = nn.LayerNorm(dtype=self.dtype)(tgt + ff)[0]    # (N, C)

        if self.update_query_pos:
            pos2 = nn.Dense(c, dtype=self.dtype, name="pos_ffn1")(tgt)
            pos2 = nn.Dense(c, dtype=self.dtype,
                            name="pos_ffn2")(nn.relu(pos2))
            new_pos = nn.LayerNorm(dtype=self.dtype,
                                   name="pos_norm")(query_pos + pos2)
            query_pos = jnp.where(update_mask[:, None], new_pos, query_pos)

        feat2 = nn.Dense(c, dtype=self.dtype, name="feat_ffn1")(tgt)
        feat2 = nn.Dense(c, dtype=self.dtype,
                         name="feat_ffn2")(nn.relu(feat2))
        new_feat = nn.LayerNorm(dtype=self.dtype,
                                name="feat_norm")(query_feat + feat2)
        query_feat = jnp.where(update_mask[:, None], new_feat, query_feat)

        return tracks.replace(
            query=jnp.concatenate([query_pos, query_feat], axis=-1))
