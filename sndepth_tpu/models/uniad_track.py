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

Divergences (documented): the DCNv2 stages of the reference backbone use
standard convs here; per-camera dynamic rebatching is dense masked compute.
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
               miss_tolerance=5, mem_len=4)
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


class _Bottleneck(nn.Module):
    features: int
    stride: int
    dtype: Any

    @nn.compact
    def __call__(self, x: Array) -> Array:
        def gn(h):
            return nn.GroupNorm(num_groups=32, dtype=self.dtype)(h)

        h = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        h = nn.relu(gn(h))
        h = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", use_bias=False, dtype=self.dtype)(h)
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
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x.astype(self.dtype))
        h = nn.relu(nn.GroupNorm(num_groups=32, dtype=self.dtype)(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")

        feats = []
        for si, (blocks, width) in enumerate(
                zip(self.stage_blocks, (64, 128, 256, 512))):
            for bi in range(blocks):
                stride = 2 if (bi == 0 and si > 0) else 1
                h = _Bottleneck(width, stride, self.dtype)(h)
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
        extra = nn.Conv(self.embed_dims, (3, 3), strides=(2, 2),
                        padding="SAME", dtype=self.dtype)(outs[-1])
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
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNetFPN(self.backbone_blocks, self.embed_dims,
                                  self.dtype)
        self.head = BEVFormerTrackHead(
            bev_h=self.bev_h, bev_w=self.bev_w, embed_dims=self.embed_dims,
            num_classes=self.num_classes, num_query=self.num_query,
            num_encoder_layers=self.encoder_layers,
            num_decoder_layers=self.decoder_layers, num_cams=self.num_cams,
            pc_range=self.pc_range, dtype=self.dtype)
        self.query_embedding = self.param(
            "query_embedding", nn.initializers.normal(1.0),
            (self.num_query, 2 * self.embed_dims))
        self.ref_points_linear = nn.Dense(3, name="reference_points")
        self.memory_bank = MemoryBank(self.embed_dims, self.mem_len,
                                      self.dtype)
        self.qim = QueryInteractionModule(self.embed_dims, self.dtype)

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
                 ego_rotation_deg: Array | None = None) -> Array:
        feats = self.extract_img_feat(imgs)
        img_hw = (imgs.shape[2], imgs.shape[3])
        return self.head.get_bev_features(
            feats, lidar2img, img_hw, prev_bev=prev_bev,
            ego_shift=ego_shift, ego_rotation_deg=ego_rotation_deg)

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

        # Keep the carried BEV in the state's dtype: a bf16 model otherwise
        # changes prev_bev's dtype after frame 1 and every later frame
        # recompiles (diagnosed on TPU: 23.5 s "frame" = recompilation).
        new_state = TrackState(
            prev_bev=bev.astype(state.prev_bev.dtype), tracks=tracks,
            next_obj_id=next_obj_id,
            timestamp=jnp.asarray(timestamp, state.timestamp.dtype),
            has_prev=jnp.ones((), bool))
        return new_state, results

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
