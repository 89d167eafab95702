"""UniADTrack: camera-only multi-object tracking (TPU-native).

Re-design of `/root/reference/models/track_uniad.py:26-875`: grid-mask
augmentation -> ResNet+FPN image features -> BEVFormer encoder (temporal +
spatial deformable attention) -> DETR decoder over 901 queries (900 object
+ 1 ego) -> runtime track lifecycle with memory bank and query interaction.

The reference's per-frame python state (``self.prev_bev``,
``self.test_track_instances``, dynamic Instances surgery,
`track_uniad.py:725-792`) becomes an explicit :class:`TrackState` pytree
threaded through :meth:`simple_test_track` — the whole per-frame step is
one jittable function, scannable over a video.

Divergences (documented): per-camera dynamic rebatching is dense masked
compute. The backbone's DCNv2 stages follow the reference stage plan
(`stage_with_dcn=(False, False, True, True)`, `track_uniad.py:962-966`) via
``models/deformable.py:DeformConv2d`` when ``use_dcn=True`` (the reference
default, see :func:`uniad_reference_config`).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp

from sndepth_tpu.models.coders import nms_free_decode
from sndepth_tpu.models.track_head import BEVFormerTrackHead
from sndepth_tpu.models.track_runtime import (MemoryBank,
                                              QueryInteractionModule,
                                              TrackInstances, empty_tracks,
                                              qim_select_train,
                                              tracker_update,
                                              velocity_update_reference_points)

Array = jax.Array


def uniad_reference_config(**overrides) -> "UniADTrack":
    """The reference's full-scale model config as a constructed module —
    parity with ``get_model_cfg`` (`track_uniad.py:877-1122`): 200x200 BEV,
    901 queries (900 obj + 1 ego), 256 dims, 6-layer encoder/decoder,
    ResNet-101 backbone, 10 classes, nuScenes pc_range."""
    cfg = dict(num_query=901, num_classes=10, embed_dims=256,
               bev_h=200, bev_w=200, num_cams=6, encoder_layers=6,
               decoder_layers=6, backbone_blocks=(3, 4, 23, 3),
               pc_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
               score_thresh=0.4, filter_score_thresh=0.35,
               miss_tolerance=5, mem_len=4,
               # caffe-style R101 with fully frozen (eval-mode) BN
               # (`track_uniad.py:953-966`) — exactly a per-channel
               # affine, so released checkpoints convert losslessly.
               backbone_style="caffe", backbone_norm="affine")
    cfg.update(overrides)
    return UniADTrack(**cfg)


@flax.struct.dataclass
class TrackState:
    """Carried across frames (explicit version of `track_uniad.py:759-782`)."""
    prev_bev: Array | None
    tracks: TrackInstances
    next_obj_id: Array
    timestamp: Array          # seconds
    has_prev: Array           # bool scalar


class _ChannelAffine(nn.Module):
    """Per-channel scale+bias — an eval-mode (frozen) BatchNorm.

    The reference backbone freezes its BN completely
    (`track_uniad.py:959-961`: ``norm_cfg=dict(type='BN2d',
    requires_grad=False), norm_eval=True, frozen_stages=4``), so at every
    forward it is exactly this affine; the weight converter folds the BN
    gamma/beta/mean/var into (scale, bias). Param shapes match
    nn.GroupNorm so config switches keep tree shapes aligned."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return (x * scale.astype(self.dtype)
                + bias.astype(self.dtype)).astype(self.dtype)


class _Bottleneck(nn.Module):
    features: int
    stride: int
    dtype: Any
    use_dcn: bool = False   # DCNv2 on the 3x3 (`track_uniad.py:962-966`)
    style: str = "pytorch"  # "caffe" puts the stride on the first 1x1
    norm: str = "gn"        # "affine" = frozen-BN per-channel affine

    @nn.compact
    def __call__(self, x: Array) -> Array:
        def gn(h):
            if self.norm == "affine":
                return _ChannelAffine(dtype=self.dtype)(h)
            return nn.GroupNorm(num_groups=32, dtype=self.dtype)(h)

        s1 = self.stride if self.style == "caffe" else 1
        s2 = 1 if self.style == "caffe" else self.stride
        h = nn.Conv(self.features, (1, 1), strides=(s1,) * 2,
                    use_bias=False, dtype=self.dtype)(x)
        h = nn.relu(gn(h))
        if self.use_dcn:
            from sndepth_tpu.models.deformable import DeformConv2d
            h = DeformConv2d(self.features, kernel=3, stride=s2,
                             dtype=self.dtype)(h)
        else:
            # Explicit (1,1) padding: torch pads symmetrically; flax SAME
            # on stride-2 pads (0,1) which misaligns the windows.
            h = nn.Conv(self.features, (3, 3), strides=(s2,) * 2,
                        padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype)(h)
        h = nn.relu(gn(h))
        h = nn.Conv(4 * self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(h)
        h = gn(h)
        if self.stride != 1 or x.shape[-1] != 4 * self.features:
            x = nn.Conv(4 * self.features, (1, 1),
                        strides=(self.stride,) * 2, use_bias=False,
                        dtype=self.dtype)(x)
            x = gn(x)
        return nn.relu(x + h)


class ResNetFPN(nn.Module):
    """ResNet (default depth-101 stage plan) + 4-level FPN -> embed_dims
    channels at 1/8, 1/16, 1/32, 1/64 (`track_uniad.py:953-980` config)."""
    stage_blocks: Sequence[int] = (3, 4, 23, 3)
    embed_dims: int = 256
    # DCNv2 stages, reference `stage_with_dcn=(False, False, True, True)`
    stage_with_dcn: Sequence[bool] = (False, False, True, True)
    style: str = "pytorch"   # reference config is "caffe"
    norm: str = "gn"         # "affine" = frozen BN (reference config)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        # Explicit torch-style symmetric padding on the strided stem ops
        # (flax SAME pads asymmetrically on even inputs -> misaligned
        # windows vs the released checkpoints).
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype)(x.astype(self.dtype))
        if self.norm == "affine":
            h = nn.relu(_ChannelAffine(dtype=self.dtype)(h))
        else:
            h = nn.relu(nn.GroupNorm(num_groups=32, dtype=self.dtype)(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

        feats = []
        for si, (blocks, width) in enumerate(
                zip(self.stage_blocks, (64, 128, 256, 512))):
            for bi in range(blocks):
                stride = 2 if (bi == 0 and si > 0) else 1
                h = _Bottleneck(width, stride, self.dtype,
                                use_dcn=self.stage_with_dcn[si],
                                style=self.style, norm=self.norm)(h)
            feats.append(h)
        c2, c3, c4, c5 = feats   # 1/4 .. 1/32

        laterals = [nn.Conv(self.embed_dims, (1, 1), dtype=self.dtype)(c)
                    for c in (c3, c4, c5)]
        # top-down fusion
        for i in (1, 0):
            up = jax.image.resize(laterals[i + 1], laterals[i].shape,
                                  method="nearest")
            laterals[i] = laterals[i] + up
        outs = [nn.Conv(self.embed_dims, (3, 3), padding="SAME",
                        dtype=self.dtype)(l) for l in laterals]
        # relu_before_extra_convs=True in the reference neck
        # (`track_uniad.py:967-975`).
        extra = nn.Conv(self.embed_dims, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)),
                        dtype=self.dtype)(nn.relu(outs[-1]))
        return outs + [extra]    # 1/8, 1/16, 1/32, 1/64


class UniADTrack(nn.Module):
    """Camera tracking model. All per-frame tensors NHWC."""
    num_query: int = 901
    num_classes: int = 10
    embed_dims: int = 256
    bev_h: int = 200
    bev_w: int = 200
    num_cams: int = 6
    encoder_layers: int = 6
    decoder_layers: int = 6
    backbone_blocks: Sequence[int] = (3, 4, 23, 3)
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    score_thresh: float = 0.4
    filter_score_thresh: float = 0.35
    miss_tolerance: int = 5
    mem_len: int = 4
    backbone_style: str = "pytorch"
    backbone_norm: str = "gn"
    dtype: Any = jnp.float32
    # Rematerialize encoder/decoder sublayers in backward (reference-scale
    # training memory; see bevformer.BEVFormerEncoder.remat).
    remat: bool = False

    def setup(self):
        self.backbone = ResNetFPN(self.backbone_blocks, self.embed_dims,
                                  style=self.backbone_style,
                                  norm=self.backbone_norm,
                                  dtype=self.dtype)
        self.head = BEVFormerTrackHead(
            bev_h=self.bev_h, bev_w=self.bev_w, embed_dims=self.embed_dims,
            num_classes=self.num_classes, num_query=self.num_query,
            num_encoder_layers=self.encoder_layers,
            num_decoder_layers=self.decoder_layers, num_cams=self.num_cams,
            pc_range=self.pc_range, dtype=self.dtype, remat=self.remat)
        self.query_embedding = self.param(
            "query_embedding", nn.initializers.normal(1.0),
            (self.num_query, 2 * self.embed_dims))
        self.ref_points_linear = nn.Dense(3, name="reference_points")
        self.memory_bank = MemoryBank(self.embed_dims, self.mem_len,
                                      dtype=self.dtype)
        self.qim = QueryInteractionModule(
            embed_dims=self.embed_dims, update_query_pos=True,
            dtype=self.dtype)

    def fresh_tracks(self) -> TrackInstances:
        """`_generate_empty_tracks` (`track_uniad.py:183`)."""
        query_pos = self.query_embedding[:, :self.embed_dims]
        ref = jax.nn.sigmoid(self.ref_points_linear(query_pos))
        return empty_tracks(self.num_query, self.embed_dims,
                            self.num_classes, self.mem_len,
                            query_init=self.query_embedding, ref_init=ref)

    def extract_img_feat(self, imgs: Array) -> list[Array]:
        """imgs: (num_cams, B, H, W, 3) -> per-level
        (num_cams, B, h, w, C) (`track_uniad.py:155-181`)."""
        cams, b, h, w, c = imgs.shape
        flat = imgs.reshape(cams * b, h, w, c)
        feats = self.backbone(flat)
        return [f.reshape(cams, b, *f.shape[1:]) for f in feats]

    def get_bevs(self, imgs: Array, lidar2img: Array,
                 prev_bev: Array | None = None,
                 ego_shift: Array | None = None,
                 ego_rotation_deg: Array | None = None,
                 can_bus: Array | None = None) -> Array:
        feats = self.extract_img_feat(imgs)
        img_hw = (imgs.shape[2], imgs.shape[3])
        return self.head.get_bev_features(
            feats, lidar2img, img_hw, prev_bev=prev_bev,
            ego_shift=ego_shift, ego_rotation_deg=ego_rotation_deg,
            can_bus=can_bus)

    def init_state(self) -> TrackState:
        return TrackState(
            prev_bev=jnp.zeros((1, self.bev_h * self.bev_w,
                                self.embed_dims)),
            tracks=self.fresh_tracks(),
            next_obj_id=jnp.zeros((), jnp.int32),
            timestamp=jnp.zeros(()),
            has_prev=jnp.zeros((), bool))

    def __call__(self, imgs: Array, lidar2img: Array, state: TrackState,
                 timestamp: Array | None = None,
                 ego_shift: Array | None = None,
                 ego_rotation_deg: Array | None = None,
                 max_dets: int = 100):
        """One inference frame (`_forward_single_frame_inference`,
        `track_uniad.py:625-723`). Returns (new_state, results dict)."""
        tracks = state.tracks
        if timestamp is None:
            timestamp = state.timestamp

        # Velocity-based reference propagation for live tracks (`:241`).
        dt = jnp.where(state.has_prev, timestamp - state.timestamp, 0.0)
        velocity = tracks.pred_boxes[:, 8:10]
        tracks = velocity_update_reference_points(tracks, velocity, dt,
                                                  self.pc_range)

        prev_bev = jnp.where(state.has_prev, 1.0, 0.0) * state.prev_bev
        bev = self.get_bevs(imgs, lidar2img,
                            prev_bev=prev_bev if ego_shift is None
                            else prev_bev,
                            ego_shift=ego_shift,
                            ego_rotation_deg=ego_rotation_deg)

        # Active slots keep their track query/refs; inactive slots reset to
        # the fresh learned embedding (fixed-capacity version of the
        # reference's concat of [active tracks, empty queries]).
        fresh = self.fresh_tracks()
        live = (tracks.obj_idxes >= 0)[:, None]
        query = jnp.where(live, tracks.query, fresh.query)
        ref_pts = jnp.where(live, tracks.ref_pts, fresh.ref_pts)

        det = self.head.get_detections(bev, query[None], ref_pts[None])
        logits = det["all_cls_scores"][-1, 0]          # (nq, classes)
        boxes = det["all_bbox_preds"][-1, 0]           # (nq, 10)
        out_emb = det["query_feats"][0]                # (nq, C)
        new_ref = det["ref_pts"][0]                    # (nq, 3)

        track_scores = jnp.max(jax.nn.sigmoid(logits), axis=-1)
        tracks = tracks.replace(
            query=jnp.concatenate(
                [query[:, :self.embed_dims], out_emb], axis=-1),
            ref_pts=new_ref,
            output_embedding=out_emb,
            scores=track_scores,
            track_scores=track_scores,
            pred_logits=logits,
            pred_boxes=boxes)

        tracks, next_obj_id = tracker_update(
            tracks, self.score_thresh, self.filter_score_thresh,
            self.miss_tolerance, state.next_obj_id)
        tracks = self.memory_bank(tracks)
        tracks = self.qim(tracks)

        results = nms_free_decode(logits, boxes, max_num=max_dets,
                                  score_threshold=None,
                                  obj_idxes=tracks.obj_idxes,
                                  track_scores=track_scores)

        # Keep the carried state's dtypes: a bf16 model otherwise changes
        # prev_bev's — and (r5) the track fields' (ref_pts/scores/
        # pred_logits/pred_boxes pick up bf16 from the heads) — dtypes
        # after frame 1, and every later frame recompiles (diagnosed on
        # TPU twice: 23.5 s "frame" r3; a ~390 s refscale recompile
        # hiding inside the r5 steady loop).
        tracks = jax.tree_util.tree_map(
            lambda new, old: (new.astype(old.dtype)
                              if hasattr(old, "dtype") else new),
            tracks, state.tracks)
        new_state = TrackState(
            prev_bev=bev.astype(state.prev_bev.dtype), tracks=tracks,
            next_obj_id=next_obj_id,
            timestamp=jnp.asarray(timestamp, state.timestamp.dtype),
            has_prev=jnp.ones((), bool))
        return new_state, results

    # ------------------------------------------------------------------
    # Training path (`track_uniad.py:363-624` _forward_single_frame_train
    # + forward_track_train), fixed-capacity masked formulation.
    # ------------------------------------------------------------------

    def _merge_with_fresh(self, tracks: TrackInstances,
                          keep: Array) -> TrackInstances:
        """QIM's ``Instances.cat([init_track_instances, active])``
        (`modules.py:252-259`) in fixed-capacity form: slots not kept are
        reset to the learned fresh query/ref with cleared state."""
        fresh = self.fresh_tracks()
        k1 = keep[:, None]
        return tracks.replace(
            query=jnp.where(k1, tracks.query, fresh.query),
            ref_pts=jnp.where(k1, tracks.ref_pts, fresh.ref_pts),
            output_embedding=jnp.where(k1, tracks.output_embedding,
                                       fresh.output_embedding),
            obj_idxes=jnp.where(keep, tracks.obj_idxes, fresh.obj_idxes),
            scores=jnp.where(keep, tracks.scores, fresh.scores),
            track_scores=jnp.where(keep, tracks.track_scores,
                                   fresh.track_scores),
            pred_logits=jnp.where(k1, tracks.pred_logits,
                                  fresh.pred_logits),
            pred_boxes=jnp.where(k1, tracks.pred_boxes, fresh.pred_boxes),
            disappear_time=jnp.where(keep, tracks.disappear_time,
                                     fresh.disappear_time),
            mem_bank=jnp.where(keep[:, None, None], tracks.mem_bank,
                               fresh.mem_bank),
            mem_valid=jnp.where(k1, tracks.mem_valid, fresh.mem_valid),
            iou=jnp.where(keep, tracks.iou, fresh.iou))

    def train_frame(self, imgs: Array, lidar2img: Array,
                    tracks: TrackInstances, prev_bev: Array,
                    has_prev: Array, gt: dict, dt_next: Array,
                    random_drop: float = 0.1, fp_ratio: float = 0.3):
        """One training frame (`_forward_single_frame_train`,
        `track_uniad.py:363-480`): detect with gradients, match every
        decoder layer against GT (ClipMatcher), bind new tracks, update
        the carry through memory bank + train-mode QIM.

        gt: dict of fixed-size arrays — labels (ng,), boxes (ng, 10)
        normalized, valid (ng,), instance_ids (ng,), past_traj
        (ng, steps, 2), past_traj_mask (ng, steps, 2), and optional
        sdc_label () / sdc_box (10,).

        Divergence (documented): the reference recomputes the history BEV
        from all previous frames without grad every frame — O(T^2) and
        flagged by its own TODO (`track_uniad.py:544`); here the previous
        frame's BEV is carried detached (the RNN way).

        Returns (new_tracks, bev, losses dict, aux dict).
        """
        from sndepth_tpu.losses.track_loss import train_frame_layer_losses
        from sndepth_tpu.ops.box_iou import iou_3d
        from sndepth_tpu.utils.uniad import denormalize_bbox

        nq = self.num_query
        sdc_slot = nq - 1
        prev = jax.lax.stop_gradient(
            jnp.where(has_prev, 1.0, 0.0) * prev_bev)
        bev = self.get_bevs(imgs, lidar2img, prev_bev=prev)

        det = self.head.get_detections(bev, tracks.query[None],
                                       tracks.ref_pts[None])
        logits_l = det["all_cls_scores"][:, 0]        # (L, nq, C)
        boxes_l = det["all_bbox_preds"][:, 0]         # (L, nq, 10)
        trajs_l = det["all_past_traj_preds"][:, 0]    # (L, nq, S, 2)
        out_emb = det["query_feats"][0]
        new_ref = det["ref_pts"][0]

        track_scores = jax.lax.stop_gradient(
            jnp.max(jax.nn.sigmoid(logits_l[-1]), axis=-1))

        losses, new_obj, assigned, matched = train_frame_layer_losses(
            logits_l, boxes_l, trajs_l, tracks.obj_idxes, gt,
            self.num_classes, sdc_slot=sdc_slot)

        # Matched-pair 3D IoU for QIM's active-track selection
        # (`track_loss.py:486-500`).
        pred9 = denormalize_bbox(boxes_l[-1])
        gt9 = denormalize_bbox(gt["boxes"])
        safe_q = jnp.clip(assigned, 0, nq - 1)
        pair_iou = jax.lax.stop_gradient(jnp.diagonal(
            iou_3d(pred9[safe_q][:, :7], gt9[:, :7])))
        iou = jnp.zeros((nq,)).at[safe_q].set(
            jnp.where(matched, pair_iou, 0.0))

        # Reference-point carry (`track_uniad.py:428-445`): fresh z from
        # the learned linear, xy from the decoder refs propagated by the
        # predicted velocity over dt_next.
        velo = jax.lax.stop_gradient(boxes_l[-1][:, 8:10])
        x0, y0, _, x1, y1, _ = self.pc_range
        wx = new_ref[:, 0] * (x1 - x0) + x0 + velo[:, 0] * dt_next
        wy = new_ref[:, 1] * (y1 - y0) + y0 + velo[:, 1] * dt_next
        ref_xy = jnp.stack([(wx - x0) / (x1 - x0),
                            (wy - y0) / (y1 - y0)], axis=-1)
        fresh_ref = self.fresh_tracks().ref_pts
        ref_pts = jax.lax.stop_gradient(
            jnp.concatenate([ref_xy, fresh_ref[:, 2:3]], axis=-1))

        tracks = tracks.replace(
            query=jnp.concatenate(
                [tracks.query[:, :self.embed_dims], out_emb], axis=-1),
            ref_pts=ref_pts,
            output_embedding=out_emb,
            scores=track_scores, track_scores=track_scores,
            pred_logits=logits_l[-1], pred_boxes=boxes_l[-1],
            obj_idxes=new_obj, iou=iou)

        tracks = self.memory_bank(tracks)
        keep = qim_select_train(tracks, self.make_rng("qim"),
                                random_drop=random_drop, fp_ratio=fp_ratio)
        tracks = self.qim(tracks, update_mask=keep)
        tracks = self._merge_with_fresh(tracks, keep)

        aux = {"num_matched": jnp.sum(matched.astype(jnp.int32)),
               "num_kept": jnp.sum(keep.astype(jnp.int32))}
        return tracks, bev, losses, aux

    def train_clip(self, imgs_seq: Array, lidar2img: Array, gt_clip: dict,
                   timestamps: Array):
        """Clip-level training forward (`forward_track_train`,
        `track_uniad.py:499-586`): python loop over T frames (T static),
        track carry threaded through, losses summed over frames and
        decoder layers. gt_clip holds per-frame leading-T arrays.

        Returns (total_loss, aux dict with per-term losses).
        """
        t_frames = imgs_seq.shape[0]
        tracks = self.fresh_tracks()
        prev_bev = jnp.zeros((1, self.bev_h * self.bev_w, self.embed_dims))
        has_prev = jnp.zeros((), bool)

        total = {"loss_cls": 0.0, "loss_bbox": 0.0, "loss_past_trajs": 0.0}
        num_matched = 0
        for t in range(t_frames):
            gt_t = {k: v[t] for k, v in gt_clip.items()}
            dt_next = (timestamps[t + 1] - timestamps[t]
                       if t + 1 < t_frames else jnp.zeros(()))
            tracks, prev_bev, losses, aux = self.train_frame(
                imgs_seq[t], lidar2img, tracks, prev_bev, has_prev, gt_t,
                dt_next)
            has_prev = jnp.ones((), bool)
            for k in total:
                total[k] = total[k] + losses[k]
            num_matched = num_matched + aux["num_matched"]

        for k in total:
            total[k] = total[k] / t_frames
        loss = total["loss_cls"] + total["loss_bbox"] + \
            total["loss_past_trajs"]
        total["loss_total"] = loss
        total["num_matched"] = num_matched
        return loss, total

    def simple_test_track(self, imgs_seq: Array, lidar2img: Array,
                          timestamps: Array | None = None):
        """Track a clip: imgs_seq (T, num_cams, B, H, W, 3). Python loop
        over frames (T is small); each frame body is the jittable
        __call__."""
        state = self.init_state()
        results = []
        for t in range(imgs_seq.shape[0]):
            ts = timestamps[t] if timestamps is not None else jnp.asarray(
                float(t) * 0.5)
            state, res = self(imgs_seq[t], lidar2img, state, timestamp=ts)
            results.append(res)
        return state, results
