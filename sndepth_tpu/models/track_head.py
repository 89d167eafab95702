"""BEVFormerTrackHead: BEV feature construction + DETR detection head.

Re-design of `/root/reference/models/track_head.py` (+ the
PerceptionTransformer orchestration in
`register_module/transformer_modules/transformer.py`):
* learned BEV query embedding + sine positional encoding ->
  :meth:`get_bev_features` (encoder over camera features, with prev-BEV
  ego-motion compensation);
* :meth:`get_detections`: decoder over [track queries], per-layer
  classification / regression branches with sigmoid-space box refinement
  (`track_head.py:162-235`).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from sndepth_tpu.models.bevformer import (BEVFormerEncoder,
                                          DetectionTransformerDecoder,
                                          inverse_sigmoid, shift_prev_bev)
from sndepth_tpu.utils.uniad import pos2posemb2d

Array = jax.Array


class _Branch(nn.Module):
    """Per-decoder-layer cls/reg/past-traj MLP (`track_head.py:84-128`
    builds one clone per layer with with_box_refine=True; same here).
    The classification branch interleaves LayerNorms
    (`track_head.py:85-90`: Linear, LayerNorm, ReLU per hidden layer);
    the reg/past-traj branches are plain Linear+ReLU stacks."""
    out_dim: int
    hidden: int = 256
    layers: int = 2
    use_ln: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = x
        for _ in range(self.layers):
            h = nn.Dense(self.hidden, dtype=self.dtype)(h)
            if self.use_ln:
                h = nn.LayerNorm(dtype=self.dtype)(h)
            h = nn.relu(h)
        return nn.Dense(self.out_dim, dtype=jnp.float32)(
            h.astype(jnp.float32))


class BEVFormerTrackHead(nn.Module):
    bev_h: int = 200
    bev_w: int = 200
    embed_dims: int = 256
    num_classes: int = 10
    num_query: int = 901
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_cams: int = 6
    num_levels: int = 4
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    past_steps: int = 4
    fut_steps: int = 4
    dtype: Any = jnp.float32
    remat: bool = False    # see BEVFormerEncoder.remat

    def setup(self):
        self.bev_embedding = self.param(
            "bev_embedding", nn.initializers.normal(1.0),
            (self.bev_h * self.bev_w, self.embed_dims))
        self.encoder = BEVFormerEncoder(
            bev_h=self.bev_h, bev_w=self.bev_w, embed_dims=self.embed_dims,
            num_layers=self.num_encoder_layers, num_cams=self.num_cams,
            num_levels=self.num_levels, pc_range=self.pc_range,
            dtype=self.dtype, remat=self.remat)
        self.decoder = DetectionTransformerDecoder(
            embed_dims=self.embed_dims, num_layers=self.num_decoder_layers,
            dtype=self.dtype, remat=self.remat)
        # One branch clone per decoder layer (`track_head.py:117-121`).
        n = self.num_decoder_layers
        self.cls_branches = [_Branch(self.num_classes, use_ln=True,
                                     dtype=self.dtype)
                             for _ in range(n)]
        self.reg_branches = [_Branch(10, dtype=self.dtype)
                             for _ in range(n)]
        # Past-trajectory regression branch (`track_head.py:100-107`):
        # (past_steps + fut_steps) x 2 offsets per query.
        self.past_traj_branches = [
            _Branch((self.past_steps + self.fut_steps) * 2,
                    dtype=self.dtype) for _ in range(n)]
        # PerceptionTransformer learned embeddings + can-bus MLP
        # (`transformer_modules/transformer.py:69-80`): per-level and
        # per-camera feature embeddings added to the flattened values,
        # and an 18-dim can-bus signal MLP added to the BEV queries.
        self.level_embeds = self.param(
            "level_embeds", nn.initializers.normal(1.0),
            (self.num_levels, self.embed_dims))
        self.cams_embeds = self.param(
            "cams_embeds", nn.initializers.normal(1.0),
            (self.num_cams, self.embed_dims))
        self.can_bus_mlp = [
            nn.Dense(self.embed_dims // 2, name="can_bus_mlp1"),
            nn.Dense(self.embed_dims, name="can_bus_mlp2"),
            nn.LayerNorm(name="can_bus_norm"),
        ]

    def bev_positional(self) -> Array:
        ys = (jnp.arange(self.bev_h, dtype=jnp.float32) + 0.5) / self.bev_h
        xs = (jnp.arange(self.bev_w, dtype=jnp.float32) + 0.5) / self.bev_w
        xg = jnp.broadcast_to(xs[None, :], (self.bev_h, self.bev_w))
        yg = jnp.broadcast_to(ys[:, None], (self.bev_h, self.bev_w))
        pos = jnp.stack([xg, yg], -1).reshape(-1, 2)
        return pos2posemb2d(pos, self.embed_dims // 2)[None]

    def get_bev_features(self, mlvl_feats: Sequence[Array],
                         lidar2img: Array, img_hw: tuple[int, int],
                         prev_bev: Array | None = None,
                         ego_shift: Array | None = None,
                         ego_rotation_deg: Array | None = None,
                         can_bus: Array | None = None) -> Array:
        """mlvl_feats: list over levels of (num_cams, B, h_l, w_l, C)."""
        b = mlvl_feats[0].shape[1]
        spatial_shapes = [(f.shape[2], f.shape[3]) for f in mlvl_feats]
        # Camera + level embeddings on the flattened values
        # (`transformer.py:160-170`).
        value = jnp.concatenate(
            [f.reshape(self.num_cams, b, -1, self.embed_dims)
             + self.cams_embeds[:, None, None, :].astype(f.dtype)
             + self.level_embeds[li][None, None, None, :].astype(f.dtype)
             for li, f in enumerate(mlvl_feats)], axis=2)

        bev_queries = jnp.broadcast_to(
            self.bev_embedding[None], (b,) + self.bev_embedding.shape)
        # can-bus signal MLP added to every BEV query
        # (`transformer.py:73-80,152-155`); zeros = stationary ego.
        if can_bus is None:
            can_bus = jnp.zeros((18,), jnp.float32)
        cb = nn.relu(self.can_bus_mlp[0](can_bus))
        cb = nn.relu(self.can_bus_mlp[1](cb))
        cb = self.can_bus_mlp[2](cb)
        bev_queries = bev_queries + cb.astype(bev_queries.dtype)
        bev_pos = self.bev_positional().astype(bev_queries.dtype)

        if prev_bev is not None and ego_shift is not None:
            prev_bev = shift_prev_bev(prev_bev, self.bev_h, self.bev_w,
                                      ego_shift, ego_rotation_deg)
        return self.encoder(bev_queries, value, lidar2img, img_hw,
                            spatial_shapes, prev_bev=prev_bev,
                            bev_pos=bev_pos)

    def get_detections(self, bev: Array, object_query: Array,
                       ref_points: Array):
        """bev: (B, bev_h*bev_w, C); object_query: (B, nq, 2C) laid out
        [query_pos | query_feat]; ref_points: (B, nq, 3) sigmoid space.
        Returns dict with per-layer logits/boxes and final query state."""
        query_pos, query = jnp.split(object_query, 2, axis=-1)

        def reg_fn(q, layer):
            return self.reg_branches[layer](q)

        states, refs = self.decoder(query, bev, ref_points,
                                    (self.bev_h, self.bev_w), query_pos,
                                    reg_branches=reg_fn)

        logits_layers = []
        boxes_layers = []
        traj_layers = []
        for li in range(states.shape[0]):
            q = states[li]
            ref = refs[li - 1] if li > 0 else ref_points
            logits = self.cls_branches[li](q)
            reg = self.reg_branches[li](q)
            traj = self.past_traj_branches[li](q).reshape(
                q.shape[:-1] + (self.past_steps + self.fut_steps, 2))
            ref_inv = inverse_sigmoid(ref)
            cx = jax.nn.sigmoid(reg[..., 0:1] + ref_inv[..., 0:1])
            cy = jax.nn.sigmoid(reg[..., 1:2] + ref_inv[..., 1:2])
            cz = jax.nn.sigmoid(reg[..., 4:5] + ref_inv[..., 2:3])
            x0, y0, z0, x1, y1, z1 = self.pc_range
            cx = cx * (x1 - x0) + x0
            cy = cy * (y1 - y0) + y0
            cz = cz * (z1 - z0) + z0
            boxes = jnp.concatenate(
                [cx, cy, reg[..., 2:4], cz, reg[..., 5:10]], axis=-1)
            logits_layers.append(logits)
            boxes_layers.append(boxes)
            traj_layers.append(traj)

        return {
            "all_cls_scores": jnp.stack(logits_layers),
            "all_bbox_preds": jnp.stack(boxes_layers),
            "all_past_traj_preds": jnp.stack(traj_layers),
            "query_feats": states[-1],
            "ref_pts": refs[-1],
        }
