"""Multi-scale deformable attention (TPU-native).

Replaces the mmcv CUDA extension ``ms_deform_attn_forward/backward``
(`/root/reference/models/register_module/transformer_modules/
multi_scale_deformable_attn_function.py:11-12`) and its users:

* :func:`ms_deformable_attention` — the sampling core, semantics of
  ``multi_scale_deformable_attn_pytorch`` (bilinear gather at learned
  normalized locations x attention weights, summed over levels/points);
* :class:`MSDeformableAttention3D` — BEVFormer's spatial cross-attention
  inner module (`spatial_cross_attention.py:178-398`): offsets around D
  pillar reference points, no output projection;
* :class:`TemporalSelfAttention` — deformable attention over the stacked
  [prev_bev, cur_bev] value (`temporal_self_attention.py:25-269`);
* :class:`CustomMSDeformableAttention` — the decoder's single-value
  variant with output projection (`decoder.py:133-345`).

JAX autodiff supplies the backward the CUDA code hand-writes. The gather
reuses the bilinear sampler (the Pallas warp kernel on TPU, an XLA gather
elsewhere) with a P-major, 128-lane-packed coordinate layout — the r5
fix that took reference-scale BEVFormer encoding from 48 s to ~0.5 s per
layer (SNDEPTH_MSDA_COORDS=pmajor|flat|natural; BASELINE.md UniAD row).
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from sndepth_tpu.ops.warp import bilinear_sampler_zero_pad

Array = jax.Array


def _msda_core(value, spatial_shapes, sampling_locations,
               attention_weights):
    b, _, heads, dim = value.shape
    _, nq, _, L, P, _ = sampling_locations.shape

    outputs = []
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, start:start + h * w]                  # B, hw, H, D
        start += h * w
        v = v.transpose(0, 2, 1, 3).reshape(b * heads, h, w, dim)

        loc = sampling_locations[:, :, :, lvl]             # B, nq, H, P, 2
        # normalized [0,1] -> pixel coords, align_corners=False convention
        # (grid_sample in the torch fallback): x_px = loc * W - 0.5.
        px = loc * jnp.asarray([w, h], loc.dtype) - 0.5
        px = px.transpose(0, 2, 1, 3, 4).reshape(b * heads, nq, P, 2)
        npx = nq * P
        layout = os.environ.get("SNDEPTH_MSDA_COORDS", "pmajor")
        if npx % 128 == 0 and layout == "pmajor":
            # Point-major (DEFAULT; r5 A/B at UniAD refscale: encoder
            # layer 1000 -> 470 ms vs query-major "flat", which itself
            # beat the r4 "natural" (nq, P) layout 8271 -> 1166):
            # consecutive lanes hold the SAME point rank across 128
            # BEV-adjacent queries — per-rank image y varies slowly
            # along a BEV row, so coord tiles get the tight y-spans the
            # warp kernel's band fast paths want. Only the (small) coords
            # and weights transpose — the weighted point-sum commutes, so
            # the big sampled tensor is reduced IN P-major order (the
            # back-transposes were 4 x 6 ms/layer in the r5 trace).
            pxt = px.transpose(0, 2, 1, 3)             # BH, P, nq, 2
            pxf = pxt.reshape(b * heads, npx // 128, 128, 2)
            sampled = bilinear_sampler_zero_pad(v, pxf)
            sampled = sampled.reshape(b * heads, P, nq, dim)
            wgt = attention_weights[:, :, :, lvl]      # B, nq, H, P
            wgt = wgt.transpose(0, 2, 3, 1).reshape(
                b * heads, P, nq, 1)
            outputs.append(jnp.sum(sampled * wgt, axis=1))  # BH, nq, D
            continue
        if npx % 128 == 0 and layout == "flat":
            # Lane-pack the sample coordinates: the sampler treats its
            # target as an (Ht, Wt) plane with Wt on lanes; the natural
            # (nq, P) layout is 8 lanes wide (6% utilization) and tiles
            # the Pallas warp kernel pathologically. Pixels are
            # independent, so folding to 128-wide rows is a free, exact
            # reshape — neighboring BEV queries project to nearby image
            # points, which also re-enables the kernel's coherent-band
            # fast paths. (Found via the r5 refscale bisect: the BEV
            # encoder was 48.2 s of the 48.2 s frame.)
            pxf = px.reshape(b * heads, npx // 128, 128, 2)
            sampled = bilinear_sampler_zero_pad(v, pxf)
            sampled = sampled.reshape(b * heads, nq, P, dim)
        else:
            sampled = bilinear_sampler_zero_pad(v, px)     # BH, nq, P, D
        wgt = attention_weights[:, :, :, lvl]              # B, nq, H, P
        wgt = wgt.transpose(0, 2, 1, 3).reshape(b * heads, nq, P, 1)
        outputs.append(jnp.sum(sampled * wgt, axis=2))     # BH, nq, D

    out = sum(outputs).reshape(b, heads, nq, dim)
    return out.transpose(0, 2, 1, 3).reshape(b, nq, heads * dim)


# Query count above which the sampling runs in chunks: the XLA tap
# gathers materialize (B*heads*nq*P, head_dim) rows padded 4x on the
# 32-element minor dim — at UniAD reference scale (40k BEV queries)
# that is 4 x 7.3 GB live at once, which alone OOMs a 16 GB chip
# (measured compile OOM breakdown). Chunked under lax.map the peak
# scales with the chunk; values are exact (the op is per-query).
_Q_CHUNK_THRESHOLD = int(os.environ.get("SNDEPTH_MSDA_CHUNK_MIN", "16384"))
_Q_CHUNK_TARGET = int(os.environ.get("SNDEPTH_MSDA_CHUNK", "8192"))


def ms_deformable_attention(value: Array, spatial_shapes: Sequence[tuple],
                            sampling_locations: Array,
                            attention_weights: Array) -> Array:
    """Core sampling op.

    value: (B, num_keys, heads, head_dim) — levels concatenated along keys;
    spatial_shapes: static list of (h, w) per level;
    sampling_locations: (B, nq, heads, L, P, 2) in [0, 1];
    attention_weights: (B, nq, heads, L, P).
    Returns (B, nq, heads * head_dim).
    """
    nq = sampling_locations.shape[1]
    nchunks = -(-nq // _Q_CHUNK_TARGET)
    if nq >= _Q_CHUNK_THRESHOLD and nchunks > 1:
        # Pad the query axis up to a chunk multiple so the OOM guard is
        # not shape-dependent (padded queries carry zero attention
        # weight and are sliced away below).
        qc = -(-nq // nchunks)
        pad = nchunks * qc - nq
        b = sampling_locations.shape[0]

        def split(x):
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((b, pad) + x.shape[2:], x.dtype)], axis=1)
            xc = x.reshape((b, nchunks, qc) + x.shape[2:])
            return jnp.moveaxis(xc, 1, 0)                  # chunk-major

        # jax.checkpoint on the chunk body: without it the map's backward
        # stores every chunk's bilinear-tap tensors as residuals — at
        # reference scale (40k queries, 6+6 layers, T=2) that is the
        # ~550 GiB/device compile-measured demand. Checkpointing makes the
        # backward recompute one chunk at a time INSIDE the loop, which
        # bounds the peak structurally (module-level nn.remat alone is a
        # scheduling hint some backends ignore — measured no-op on
        # XLA:CPU).
        core = jax.checkpoint(
            lambda args: _msda_core(value, spatial_shapes, *args))
        out = jax.lax.map(
            core, (split(sampling_locations), split(attention_weights)))
        out = jnp.moveaxis(out, 0, 1).reshape(b, nchunks * qc, -1)
        return out[:, :nq]
    return _msda_core(value, spatial_shapes, sampling_locations,
                      attention_weights)


def _chunked_dense_msda(qf, ref, v, spatial_shapes, ok, ob, wk, wb,
                        make_loc, h, L, P):
    """Query-chunked offsets->softmax->loc->sampling with a CHECKPOINTED
    chunk body under ``lax.map``.

    At reference scale the full-nq offsets/locations tensors alone are
    ~16 GB per SCA layer and the bilinear tap residuals sum to the
    measured ~550 GiB/device backward demand; chunking only the sampling
    (the old path) still stored full-nq locations as map inputs. Here the
    Dense projections run INSIDE the chunk body from their param arrays,
    so the only full-nq residuals are the query itself and the output —
    and the loop structure bounds the recompute peak regardless of the
    backend's scheduler (module-level nn.remat was measured a no-op on
    XLA:CPU).

    qf: (B, nq, Cq) dense input (model dtype; cast to f32 in-body);
    ref: (B, nq, ...) per-query reference data; v: (B, keys, h, dim);
    ok/ob/wk/wb: offsets/weights Dense params;
    make_loc(off, ref_c) -> (B, qc, h, L, P, 2). Returns (B, nq, h*dim).
    """
    b, nq, _ = qf.shape
    nchunks = max(1, -(-nq // _Q_CHUNK_TARGET))
    qc = -(-nq // nchunks)
    pad = nchunks * qc - nq

    def split(x):
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((b, pad) + x.shape[2:], x.dtype)], axis=1)
        return jnp.moveaxis(
            x.reshape((b, nchunks, qc) + x.shape[2:]), 1, 0)

    @jax.checkpoint
    def body(args):
        q_c, ref_c = args
        q32 = q_c.astype(jnp.float32)
        off = (q32 @ ok + ob).reshape(b, qc, h, L, P, 2)
        wgt = jax.nn.softmax(
            (q32 @ wk + wb).reshape(b, qc, h, L * P), -1
        ).reshape(b, qc, h, L, P)
        loc = make_loc(off, ref_c)
        return _msda_core(v, spatial_shapes, loc, wgt)

    out = jax.lax.map(body, (split(qf), split(ref)))
    out = jnp.moveaxis(out, 0, 1).reshape(b, nchunks * qc, -1)
    return out[:, :nq]


def _dense_params(dense, sample):
    """Force param creation on a bound submodule with a tiny dummy call
    and return its (kernel, bias) arrays for functional in-loop use."""
    _ = dense(sample)
    p = dense.variables["params"]
    return p["kernel"], p["bias"]


class DeformConv2d(nn.Module):
    """Modulated deformable convolution (DCNv2) — the backbone op the
    reference configures for ResNet stages 3-4
    (`track_uniad.py:962-966`: ``dcn=dict(type='DCNv2', ...)``,
    ``stage_with_dcn=(False, False, True, True)``) via the mmcv CUDA
    extension.

    TPU-native: a regular conv predicts per-tap (dy, dx) offsets and a
    sigmoid modulation mask (27 = 9*2 + 9 channels, zero-initialized so
    the op starts as a plain conv); the input is bilinearly gathered at
    the 9 deformed tap positions (reshaped reuse of the same sampler as
    ms-deformable attention) and contracted with the (K, Cin, Cout)
    kernel on the MXU. Autodiff supplies the CUDA backward.
    """
    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, cin = x.shape
        k = self.kernel
        kk = k * k
        s = self.stride
        ho, wo = (h + s - 1) // s, (w + s - 1) // s

        om = nn.Conv(3 * kk, (k, k), strides=(s, s), padding="SAME",
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=jnp.float32, name="conv_offset")(
            x.astype(jnp.float32))
        off = om[..., :2 * kk].reshape(b, ho, wo, kk, 2)   # (dy, dx)
        mask = jax.nn.sigmoid(om[..., 2 * kk:])            # (b,ho,wo,kk)

        # Base tap grid around each output pixel's input-space center.
        r = (k - 1) // 2
        d = jnp.arange(-r, r + 1, dtype=jnp.float32)
        gy, gx = jnp.meshgrid(d, d, indexing="ij")
        grid = jnp.stack([gy.ravel(), gx.ravel()], -1)     # (kk, 2)
        cy = jnp.arange(ho, dtype=jnp.float32)[:, None] * s
        cx = jnp.arange(wo, dtype=jnp.float32)[None, :] * s
        base = jnp.stack([jnp.broadcast_to(cy, (ho, wo)),
                          jnp.broadcast_to(cx, (ho, wo))], -1)
        pos = base[None, :, :, None, :] + grid + off       # b,ho,wo,kk,2
        coords = jnp.stack([pos[..., 1], pos[..., 0]], -1)  # (x, y)

        sampled = bilinear_sampler_zero_pad(
            x.astype(jnp.float32), coords.reshape(b, ho * wo, kk, 2))
        sampled = sampled.reshape(b, ho, wo, kk, cin)
        sampled = sampled * mask[..., None]

        kernel = self.param(
            "kernel", nn.initializers.variance_scaling(
                2.0, "fan_out", "truncated_normal"),
            (kk, cin, self.features), jnp.float32)
        out = jnp.einsum("bhwkc,kcf->bhwf", sampled, kernel,
                         preferred_element_type=jnp.float32)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,), jnp.float32)
        return out.astype(self.dtype)


class MSDeformableAttention3D(nn.Module):
    """Offsets/weights predicted from the query; sampling points are spread
    around each of the D pillar reference points (num_points must be a
    multiple of D at call time). No output projection (the outer
    SpatialCrossAttention owns it)."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query: Array, value: Array,
                 reference_points: Array,
                 spatial_shapes: Sequence[tuple]) -> Array:
        """query: (B, nq, C); value: (B, num_keys, C);
        reference_points: (B, nq, D, 2) normalized; returns (B, nq, C)."""
        b, nq, c = query.shape
        h, L, P = self.num_heads, self.num_levels, self.num_points
        head_dim = c // h

        d_off = nn.Dense(h * L * P * 2, dtype=jnp.float32,
                         kernel_init=nn.initializers.zeros,
                         name="sampling_offsets")
        d_wgt = nn.Dense(h * L * P, dtype=jnp.float32,
                         kernel_init=nn.initializers.zeros,
                         name="attention_weights")
        v = nn.Dense(c, dtype=self.dtype, name="value_proj")(value)
        v = v.reshape(b, -1, h, head_dim)

        d = reference_points.shape[2]
        shapes = jnp.asarray(spatial_shapes, jnp.float32)      # (L, 2) h,w

        if nq >= _Q_CHUNK_THRESHOLD:
            # Chunked-dense path: see _chunked_dense_msda.
            ok, ob = _dense_params(
                d_off, query[:, :1].astype(jnp.float32))
            wk, wb = _dense_params(
                d_wgt, query[:, :1].astype(jnp.float32))
            normc = shapes[None, None, None, :, None, None, ::-1]

            def make_loc(off, ref_c, d=d):
                bc, qc = off.shape[:2]
                refx = ref_c[:, :, None, None, :, None, :]
                offx = off.reshape(bc, qc, h, L, d, P // d, 2)
                return (refx + offx / normc).reshape(bc, qc, h, L, P, 2)

            return _chunked_dense_msda(query, reference_points, v,
                                       spatial_shapes, ok, ob, wk, wb,
                                       make_loc, h, L, P)

        offsets = d_off(query.astype(jnp.float32))
        offsets = offsets.reshape(b, nq, h, L, P, 2)
        weights = d_wgt(query.astype(jnp.float32))
        weights = jax.nn.softmax(
            weights.reshape(b, nq, h, L * P), axis=-1
        ).reshape(b, nq, h, L, P)

        # Spread P points over the D reference anchors
        # (`spatial_cross_attention.py:360-380`).
        ref = reference_points[:, :, None, None, :, None, :]  # b nq 1 1 D 1 2
        off = offsets.reshape(b, nq, h, L, d, P // d, 2)
        norm = shapes[None, None, None, :, None, None, ::-1]   # -> (w, h)
        loc = ref + off / norm
        loc = loc.reshape(b, nq, h, L, P, 2)

        return ms_deformable_attention(v, spatial_shapes, loc, weights)


class SpatialCrossAttention(nn.Module):
    """Per-camera deformable sampling of multi-level image features,
    averaged over the cameras that see each BEV query
    (`spatial_cross_attention.py:31-174`).

    The reference's dynamic per-camera rebatching (a GPU-memory trick with
    data-dependent shapes) is replaced by dense masked compute: every
    camera attends for every query, contributions are masked by
    ``bev_mask`` and normalized by the camera count — numerically the same
    result, static shapes for XLA.
    """
    embed_dims: int = 256
    num_cams: int = 6
    num_levels: int = 4
    num_points: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query: Array, value: Array,
                 reference_points_cam: Array, bev_mask: Array,
                 spatial_shapes: Sequence[tuple],
                 query_pos: Array | None = None) -> Array:
        """query: (B, nq, C); value: (num_cams, B, num_keys, C);
        reference_points_cam: (num_cams, B, nq, D, 2);
        bev_mask: (num_cams, B, nq, D) bool."""
        residual = query
        if query_pos is not None:
            query = query + query_pos
        b, nq, c = query.shape

        attn = MSDeformableAttention3D(
            embed_dims=self.embed_dims, num_levels=self.num_levels,
            num_points=self.num_points, dtype=self.dtype,
            name="deformable_attention")

        cam_q = jnp.broadcast_to(query[None],
                                 (self.num_cams,) + query.shape)
        flat_q = cam_q.reshape(self.num_cams * b, nq, c)
        flat_v = value.reshape(self.num_cams * b, -1, c)
        flat_ref = reference_points_cam.reshape(
            self.num_cams * b, nq, -1, 2)
        out = attn(flat_q, flat_v, flat_ref, spatial_shapes)
        out = out.reshape(self.num_cams, b, nq, c)

        seen = jnp.any(bev_mask, axis=-1)                  # cams, B, nq
        out = jnp.where(seen[..., None], out, 0.0)
        slots = jnp.sum(out, axis=0)
        count = jnp.maximum(jnp.sum(seen, axis=0), 1.0)[..., None]
        slots = slots / count
        slots = nn.Dense(c, dtype=self.dtype, name="output_proj")(slots)
        return slots + residual


class TemporalSelfAttention(nn.Module):
    """Deformable attention over the stacked [prev_bev, cur_bev] value
    (`temporal_self_attention.py:25-269`); outputs of the two branches are
    averaged."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query: Array, prev_value: Array | None,
                 reference_points: Array, spatial_shapes: Sequence[tuple],
                 query_pos: Array | None = None) -> Array:
        """query (cur bev): (B, nq, C); prev_value: (B, nq, C) or None;
        reference_points: (B, nq, 1, 2)."""
        residual = query
        if query_pos is not None:
            query = query + query_pos
        b, nq, c = query.shape
        h, L, P = self.num_heads, self.num_levels, self.num_points
        head_dim = c // h

        if prev_value is None:
            prev_value = residual
        # Two value branches stacked along batch (`:148-158`).
        values = jnp.concatenate([prev_value, residual], axis=0)  # 2B,nq,C
        # Query conditions on [prev, cur] concat (`:143-146`).
        q2 = jnp.concatenate(
            [jnp.concatenate([prev_value, query], axis=-1),
             jnp.concatenate([residual, query], axis=-1)], axis=0)

        d_off = nn.Dense(h * L * P * 2, dtype=jnp.float32,
                         kernel_init=nn.initializers.zeros,
                         name="sampling_offsets")
        d_wgt = nn.Dense(h * L * P, dtype=jnp.float32,
                         kernel_init=nn.initializers.zeros,
                         name="attention_weights")
        v = nn.Dense(c, dtype=self.dtype, name="value_proj")(values)
        v = v.reshape(2 * b, -1, h, head_dim)
        ref = jnp.tile(reference_points, (2, 1, 1, 1))     # 2B, nq, 1, 2
        shapes = jnp.asarray(spatial_shapes, jnp.float32)

        if nq >= _Q_CHUNK_THRESHOLD:
            ok, ob = _dense_params(d_off, q2[:, :1].astype(jnp.float32))
            wk, wb = _dense_params(d_wgt, q2[:, :1].astype(jnp.float32))
            normc = shapes[None, None, None, :, None, ::-1]

            def make_loc(off, ref_c):
                return ref_c[:, :, None, None, :, :] + off / normc

            out = _chunked_dense_msda(q2, ref, v, spatial_shapes,
                                      ok, ob, wk, wb, make_loc, h, L, P)
        else:
            offsets = d_off(q2.astype(jnp.float32))
            offsets = offsets.reshape(2 * b, nq, h, L, P, 2)
            weights = d_wgt(q2.astype(jnp.float32))
            weights = jax.nn.softmax(
                weights.reshape(2 * b, nq, h, L * P), -1
            ).reshape(2 * b, nq, h, L, P)
            norm = shapes[None, None, None, :, None, ::-1]
            loc = ref[:, :, None, None, :, :] + offsets / norm
            out = ms_deformable_attention(v, spatial_shapes, loc, weights)

        out = 0.5 * (out[:b] + out[b:])
        out = nn.Dense(c, dtype=self.dtype, name="output_proj")(out)
        return out + residual


class CustomMSDeformableAttention(nn.Module):
    """Decoder-side deformable attention on the BEV feature map with an
    output projection (`decoder.py:133-345`)."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query: Array, value: Array,
                 reference_points: Array, spatial_shapes: Sequence[tuple],
                 query_pos: Array | None = None) -> Array:
        """query: (B, nq, C); value: (B, num_keys, C);
        reference_points: (B, nq, 2) normalized."""
        residual = query
        if query_pos is not None:
            query = query + query_pos
        b, nq, c = query.shape
        h, L, P = self.num_heads, self.num_levels, self.num_points
        head_dim = c // h

        offsets = nn.Dense(h * L * P * 2, dtype=jnp.float32,
                           kernel_init=nn.initializers.zeros,
                           name="sampling_offsets")(
            query.astype(jnp.float32)).reshape(b, nq, h, L, P, 2)
        weights = nn.Dense(h * L * P, dtype=jnp.float32,
                           kernel_init=nn.initializers.zeros,
                           name="attention_weights")(
            query.astype(jnp.float32))
        weights = jax.nn.softmax(
            weights.reshape(b, nq, h, L * P), -1).reshape(b, nq, h, L, P)

        v = nn.Dense(c, dtype=self.dtype, name="value_proj")(value)
        v = v.reshape(b, -1, h, head_dim)

        shapes = jnp.asarray(spatial_shapes, jnp.float32)
        norm = shapes[None, None, None, :, None, ::-1]
        loc = reference_points[:, :, None, None, None, :] + offsets / norm

        out = ms_deformable_attention(v, spatial_shapes, loc, weights)
        out = nn.Dense(c, dtype=self.dtype, name="output_proj")(out)
        return out + residual
