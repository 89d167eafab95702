"""BEVFormer encoder / decoder (TPU-native).

Re-design of `/root/reference/models/register_module/transformer_modules/`
(`encoder.py`, `decoder.py`, `transformer.py`):

* pillar reference points over the BEV grid + projection into each camera
  via lidar2img matrices (`encoder.py:60-170`);
* encoder layers = TemporalSelfAttention -> SpatialCrossAttention -> FFN,
  each with a pre-add LayerNorm residual (`encoder.py:239-402`);
* DETR-style decoder with iterative sigmoid-space box refinement
  (`decoder.py:53-130`);
* PerceptionTransformer: can-bus shift/rotation of the previous BEV and
  encoder/decoder orchestration (`transformer.py:100-231`).

All data-dependent constructs in the reference (nonzero rebatching,
per-camera query lists) are masked dense ops here — static shapes, XLA
collectives-ready.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from sndepth_tpu.models.deformable import (CustomMSDeformableAttention,
                                           SpatialCrossAttention,
                                           TemporalSelfAttention)

Array = jax.Array


def inverse_sigmoid(x: Array, eps: float = 1e-5) -> Array:
    x = jnp.clip(x, eps, 1.0 - eps)
    return jnp.log(x / (1.0 - x))


def bev_pillar_points(bev_h: int, bev_w: int, num_z: int,
                      pc_range: Sequence[float], dtype=jnp.float32
                      ) -> Array:
    """3-D pillar reference points over the BEV grid (`encoder.py:60-100`).

    Returns (num_z, bev_h*bev_w, 3) points in lidar coordinates.
    """
    zs = (jnp.arange(num_z, dtype=dtype) + 0.5) / num_z
    xs = (jnp.arange(bev_w, dtype=dtype) + 0.5) / bev_w
    ys = (jnp.arange(bev_h, dtype=dtype) + 0.5) / bev_h
    xg = jnp.broadcast_to(xs[None, :], (bev_h, bev_w)).reshape(-1)
    yg = jnp.broadcast_to(ys[:, None], (bev_h, bev_w)).reshape(-1)
    x0, y0, z0, x1, y1, z1 = pc_range
    px = x0 + xg * (x1 - x0)
    py = y0 + yg * (y1 - y0)
    pz = z0 + zs[:, None] * (z1 - z0)
    pts = jnp.stack([
        jnp.broadcast_to(px[None], (num_z, bev_h * bev_w)),
        jnp.broadcast_to(py[None], (num_z, bev_h * bev_w)),
        jnp.broadcast_to(pz, (num_z, bev_h * bev_w)),
    ], axis=-1)
    return pts


def project_points_to_cams(points: Array, lidar2img: Array,
                           img_h: int, img_w: int
                           ) -> tuple[Array, Array]:
    """Project pillar points into every camera (`encoder.py:101-170`).

    points: (D, nq, 3); lidar2img: (B, num_cams, 4, 4).
    Returns (reference_points_cam (cams, B, nq, D, 2) in [0,1],
             bev_mask (cams, B, nq, D) bool).
    """
    d, nq, _ = points.shape
    hom = jnp.concatenate([points, jnp.ones((d, nq, 1), points.dtype)], -1)
    # (B, cams, D, nq, 4)
    proj = jnp.einsum("bcij,dnj->bcdni", lidar2img, hom)
    eps = 1e-5
    z = proj[..., 2]
    valid = z > eps
    xy = proj[..., :2] / jnp.maximum(z[..., None], eps)
    xy = xy / jnp.asarray([img_w, img_h], xy.dtype)
    inside = ((xy[..., 0] > 0.0) & (xy[..., 0] < 1.0) &
              (xy[..., 1] > 0.0) & (xy[..., 1] < 1.0))
    mask = valid & inside
    # -> (cams, B, nq, D, ...)
    xy = xy.transpose(1, 0, 3, 2, 4)
    mask = mask.transpose(1, 0, 3, 2)
    return xy, mask


class FFN(nn.Module):
    embed_dims: int = 256
    feedforward: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Dense(self.feedforward, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dense(self.embed_dims, dtype=self.dtype)(h)
        return x + h


class BEVFormerEncoder(nn.Module):
    """Stack of BEVFormer layers producing the BEV feature map."""
    bev_h: int = 200
    bev_w: int = 200
    embed_dims: int = 256
    num_layers: int = 6
    num_cams: int = 6
    num_levels: int = 4
    num_points_in_pillar: int = 4
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    dtype: Any = jnp.float32
    # Rematerialize each attention/FFN sublayer in the backward pass:
    # reference-scale training (200x200 BEV = 40k queries, 6 layers, T
    # frames) otherwise materializes TB-scale deformable-sampling
    # residuals (measured 2.19 TB single-chip compile demand, BASELINE.md).
    remat: bool = False

    @nn.compact
    def __call__(self, bev_queries: Array, value: Array, lidar2img: Array,
                 img_hw: tuple[int, int],
                 spatial_shapes: Sequence[tuple],
                 prev_bev: Array | None = None,
                 bev_pos: Array | None = None) -> Array:
        """bev_queries: (B, bev_h*bev_w, C); value: (cams, B, keys, C);
        lidar2img: (B, cams, 4, 4)."""
        b = bev_queries.shape[0]
        nq = self.bev_h * self.bev_w

        pillar = bev_pillar_points(self.bev_h, self.bev_w,
                                   self.num_points_in_pillar, self.pc_range)
        ref_cam, bev_mask = project_points_to_cams(
            pillar, lidar2img, img_hw[0], img_hw[1])

        xs = (jnp.arange(self.bev_w, dtype=jnp.float32) + 0.5) / self.bev_w
        ys = (jnp.arange(self.bev_h, dtype=jnp.float32) + 0.5) / self.bev_h
        xg = jnp.broadcast_to(xs[None, :], (self.bev_h, self.bev_w))
        yg = jnp.broadcast_to(ys[:, None], (self.bev_h, self.bev_w))
        ref_2d = jnp.broadcast_to(
            jnp.stack([xg, yg], -1).reshape(1, nq, 1, 2), (b, nq, 1, 2))

        if self.remat:
            # nn.remat renames the class ("Checkpoint<cls>"), so pass
            # explicit names reproducing the unwrapped auto-numbering —
            # the param tree is then identical with/without remat
            # (tests/test_uniad_train.py asserts this). spatial_shapes
            # args are static (hashable shape tuples).
            TSA = nn.remat(TemporalSelfAttention, static_argnums=(4,))
            SCA = nn.remat(SpatialCrossAttention, static_argnums=(5,))
            Ffn = nn.remat(FFN)
        else:
            TSA, SCA, Ffn = (TemporalSelfAttention, SpatialCrossAttention,
                             FFN)
        # Static (hashable) shape lists for jax.checkpoint's static args.
        sshapes = tuple((int(h2), int(w2)) for h2, w2 in spatial_shapes)
        bev = bev_queries
        for i in range(self.num_layers):
            nm = (lambda c, i=i: f"{c}_{i}") if self.remat else \
                (lambda c: None)
            bev = TSA(self.embed_dims, dtype=self.dtype,
                      name=nm("TemporalSelfAttention"))(
                bev, prev_bev, ref_2d, ((self.bev_h, self.bev_w),),
                bev_pos)
            bev = nn.LayerNorm(dtype=self.dtype)(bev)
            bev = SCA(
                self.embed_dims, self.num_cams, self.num_levels,
                dtype=self.dtype, name=nm("SpatialCrossAttention"))(
                    bev, value, ref_cam, bev_mask, sshapes, bev_pos)
            bev = nn.LayerNorm(dtype=self.dtype)(bev)
            bev = Ffn(self.embed_dims, 512, dtype=self.dtype,
                      name=nm("FFN"))(bev)
            bev = nn.LayerNorm(dtype=self.dtype)(bev)
        return bev


class DetectionTransformerDecoder(nn.Module):
    """DETR decoder over the BEV map with iterative reference refinement
    (`decoder.py:53-130`). Returns per-layer query states and the running
    reference points."""
    embed_dims: int = 256
    num_layers: int = 6
    num_heads: int = 8
    dtype: Any = jnp.float32
    remat: bool = False    # see BEVFormerEncoder.remat

    @nn.compact
    def __call__(self, query: Array, bev: Array, reference_points: Array,
                 bev_hw: tuple[int, int], query_pos: Array | None,
                 reg_branches=None):
        """query: (B, nq, C); bev: (B, bev_h*bev_w, C);
        reference_points: (B, nq, 3) sigmoid-space."""
        CDA = (nn.remat(CustomMSDeformableAttention, static_argnums=(4,))
               if self.remat else CustomMSDeformableAttention)
        states = []
        refs = []
        ref = reference_points
        for li in range(self.num_layers):
            q = query + (query_pos if query_pos is not None else 0.0)
            # value = the PRE-positional query (mmcv MultiheadAttention
            # binds value before query_pos is added).
            sa = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype)(q, q, query)
            query = nn.LayerNorm(dtype=self.dtype)(query + sa)
            query = CDA(
                self.embed_dims, dtype=self.dtype,
                name=(f"CustomMSDeformableAttention_{li}" if self.remat
                      else None))(
                    query, bev, ref[..., :2],
                    ((int(bev_hw[0]), int(bev_hw[1])),), query_pos)
            query = nn.LayerNorm(dtype=self.dtype)(query)
            query = FFN(self.embed_dims, 512, dtype=self.dtype)(query)
            query = nn.LayerNorm(dtype=self.dtype)(query)

            if reg_branches is not None:
                delta = reg_branches(query, li)
                new_xy = jax.nn.sigmoid(
                    delta[..., :2] + inverse_sigmoid(ref[..., :2]))
                new_z = jax.nn.sigmoid(
                    delta[..., 4:5] + inverse_sigmoid(ref[..., 2:3]))
                ref = jax.lax.stop_gradient(
                    jnp.concatenate([new_xy, new_z], axis=-1))
            states.append(query)
            refs.append(ref)
        return jnp.stack(states), jnp.stack(refs)


def shift_prev_bev(prev_bev: Array, bev_h: int, bev_w: int,
                   delta_xy: Array, rotation_deg: Array | None = None
                   ) -> Array:
    """Ego-motion compensation of the previous BEV (`transformer.py:100+`):
    translate by the can-bus shift (grid fraction) and optionally rotate
    about the grid center.

    prev_bev: (B, bev_h*bev_w, C); delta_xy: (B, 2) in grid fractions.
    Implemented as one bilinear resample of the BEV grid."""
    from sndepth_tpu.ops.warp import bilinear_sampler_zero_pad
    b, _, c = prev_bev.shape
    grid_x = jnp.broadcast_to(
        jnp.arange(bev_w, dtype=jnp.float32)[None, :], (bev_h, bev_w))
    grid_y = jnp.broadcast_to(
        jnp.arange(bev_h, dtype=jnp.float32)[:, None], (bev_h, bev_w))
    coords = jnp.stack([grid_x, grid_y], -1)[None]        # 1,h,w,2
    coords = jnp.broadcast_to(coords, (b, bev_h, bev_w, 2))

    if rotation_deg is not None:
        theta = jnp.deg2rad(rotation_deg).reshape(b, 1, 1)
        cx, cy = (bev_w - 1) / 2.0, (bev_h - 1) / 2.0
        x = coords[..., 0] - cx
        y = coords[..., 1] - cy
        xr = jnp.cos(theta) * x - jnp.sin(theta) * y + cx
        yr = jnp.sin(theta) * x + jnp.cos(theta) * y + cy
        coords = jnp.stack([xr, yr], -1)

    shift = delta_xy.reshape(b, 1, 1, 2) * jnp.asarray(
        [bev_w, bev_h], jnp.float32)
    coords = coords + shift
    prev = prev_bev.reshape(b, bev_h, bev_w, c)
    out = bilinear_sampler_zero_pad(prev, coords)
    return out.reshape(b, bev_h * bev_w, c)
