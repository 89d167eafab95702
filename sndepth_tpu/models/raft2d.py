"""RAFT (2-D optical flow), built from the RAFT3D blocks.

Replaces the hub-downloaded ``torchvision raft_large`` the reference uses
for the motion-segmentation flow input (`/root/reference/predict.py:8-9,24,
61`): same family — feature/context encoders, all-pairs correlation
pyramid with windowed lookup, ConvGRU iterative delta-flow updates, convex
upsampling — sharing this repo's encoder/corr/GRU/upsample implementations.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from sndepth_tpu.models.raft3d import (BasicEncoder, ConvGRU,
                                       corr_lookup_dot, cvx_upsample,
                                       grad_clip, pool_fmap_pyramid)
from sndepth_tpu.ops.warp import bilinear_sampler_zero_pad

Array = jax.Array


class _FlowIteration(nn.Module):
    hidden_dim: int
    corr_radius: int
    dtype: Any

    @nn.compact
    def __call__(self, carry, const):
        flow, net = carry
        fmap1, f2_pyramid, inp, coords0 = const

        coords1 = coords0 + flow
        corr = corr_lookup_dot(fmap1, list(f2_pyramid), coords1,
                               self.corr_radius)

        cor = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype)(corr))
        cor = nn.Conv(192, (3, 3), padding="SAME", dtype=self.dtype)(cor)
        cor = nn.relu(cor)
        flo = nn.relu(nn.Conv(128, (7, 7), padding="SAME",
                              dtype=self.dtype)(flow))
        flo = nn.relu(nn.Conv(64, (3, 3), padding="SAME",
                              dtype=self.dtype)(flo))
        motion = nn.Conv(3 * self.hidden_dim, (3, 3), padding="SAME",
                         dtype=self.dtype)(
            jnp.concatenate([cor, flo], axis=-1))

        net = ConvGRU(self.hidden_dim, dtype=self.dtype)(net, inp, motion)

        def head(out_ch, name):
            h = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"{name}_0")(net)
            h = nn.relu(h)
            h = nn.Conv(out_ch, (1, 1), dtype=jnp.float32,
                        name=f"{name}_1")(h.astype(jnp.float32))
            return grad_clip(h)

        delta = head(2, "delta")
        mask = head(64 * 9, "mask")
        flow = flow + delta
        return (flow, net), mask


class RAFT2D(nn.Module):
    """forward(image1, image2, iters) -> (B, H, W, 2) upsampled flow."""
    hidden_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image1: Array, image2: Array, iters: int = 12,
                 train_mode: bool = False):
        hdim = self.hidden_dim
        b, ht, wd, _ = image1.shape
        h8, w8 = ht // 8, wd // 8

        fnet = BasicEncoder(output_dim=256, dtype=self.dtype)
        fmap1 = fnet(image1).astype(jnp.float32)
        fmap2 = fnet(image2).astype(jnp.float32)
        f2_pyramid = tuple(pool_fmap_pyramid(fmap2, self.corr_levels))

        cnet = BasicEncoder(output_dim=2 * hdim, dtype=self.dtype)
        net_inp = cnet(image1)
        net = jnp.tanh(net_inp[..., :hdim]).astype(jnp.float32)
        inp = nn.relu(net_inp[..., hdim:]).astype(jnp.float32)
        inp = nn.Conv(3 * hdim, (1, 1), dtype=jnp.float32)(inp)

        gx = jnp.broadcast_to(
            jnp.arange(w8, dtype=jnp.float32)[None, :], (h8, w8))
        gy = jnp.broadcast_to(
            jnp.arange(h8, dtype=jnp.float32)[:, None], (h8, w8))
        coords0 = jnp.broadcast_to(
            jnp.stack([gx, gy], -1)[None], (b, h8, w8, 2))

        scan_mod = nn.scan(
            _FlowIteration, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=nn.broadcast,
            out_axes=0, length=iters,
        )(hidden_dim=hdim, corr_radius=self.corr_radius, dtype=self.dtype)

        flow0 = jnp.zeros((b, h8, w8, 2))
        (flow, _), masks = scan_mod((flow0, net),
                                    (fmap1, f2_pyramid, inp, coords0))

        flow_up = cvx_upsample(8.0 * flow, masks[-1])
        if train_mode:
            return flow, flow_up
        return flow_up


# ---------------------------------------------------------------------------
# torchvision raft_large weight-compatible variant
# ---------------------------------------------------------------------------
#
# The reference feeds MotionFusionNet with pretrained torchvision
# ``raft_large`` flow (`/root/reference/predict.py:8-9,24,61`). RAFT2DLarge
# mirrors that network exactly (instance-norm feature encoder, batch-norm
# context encoder, SepConvGRU update, 4-level/r=4 all-pairs correlation with
# align_corners=True lookup, x8 convex upsampling) so
# `utils/convert_weights.py:convert_raft2d_large` can load the released
# checkpoint. Layout is NHWC end-to-end; the correlation volume is one MXU
# einsum and the windowed lookup rides the Pallas zero-pad sampler.


def _instance_norm(x: Array) -> Array:
    """InstanceNorm2d(affine=False, eps=1e-5): per-sample, per-channel."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5)


class _TVConvNormAct(nn.Module):
    """torchvision Conv2dNormActivation: conv (+norm) (+relu). The conv has
    a bias only when there is no norm, matching torchvision."""
    features: int
    kernel: int
    stride: int = 1
    norm: str | None = None      # "instance" | "batch" | None
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        p = self.kernel // 2
        h = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), use_bias=self.norm is None,
                    dtype=self.dtype, name="conv")(x)
        if self.norm == "instance":
            h = _instance_norm(h)
        elif self.norm == "batch":
            h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             dtype=self.dtype, name="norm")(h)
        if self.act:
            h = nn.relu(h)
        return h


class _TVResidualBlock(nn.Module):
    features: int
    stride: int
    norm: str | None
    dtype: Any

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = _TVConvNormAct(self.features, 3, self.stride, self.norm,
                           dtype=self.dtype, name="convnormrelu1")(x)
        y = _TVConvNormAct(self.features, 3, 1, self.norm,
                           dtype=self.dtype, name="convnormrelu2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = _TVConvNormAct(self.features, 1, self.stride, self.norm,
                               act=False, dtype=self.dtype,
                               name="downsample")(x)
        return nn.relu(x + y)


class _TVFeatureEncoder(nn.Module):
    """torchvision FeatureEncoder(layers=(64, 64, 96, 128, 256))."""
    norm: str | None
    output_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = _TVConvNormAct(64, 7, 2, self.norm, dtype=self.dtype,
                           name="convnormrelu")(x.astype(self.dtype))
        for i, (feat, stride) in enumerate(((64, 1), (96, 2), (128, 2))):
            h = _TVResidualBlock(feat, stride, self.norm, self.dtype,
                                 name=f"layer{i + 1}_0")(h)
            h = _TVResidualBlock(feat, 1, self.norm, self.dtype,
                                 name=f"layer{i + 1}_1")(h)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                       name="conv")(h)


def tv_corr_pyramid(fmap1: Array, fmap2: Array,
                    num_levels: int = 4) -> tuple[Array, ...]:
    """All-pairs correlation / sqrt(C), pooled into a pyramid.

    Returns per level (B*H*W, h_i, w_i, 1) volumes (torchvision CorrBlock
    layout, NHWC)."""
    b, h, w, c = fmap1.shape
    corr = jnp.einsum("bhwc,bijc->bhwij", fmap1.astype(jnp.float32),
                      fmap2.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    vol = corr.reshape(b * h * w, h, w, 1) / jnp.sqrt(
        jnp.float32(c))
    pyr = [vol]
    for _ in range(num_levels - 1):
        vol = jax.lax.reduce_window(
            vol, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
            "VALID") * 0.25
        pyr.append(vol)
    return tuple(pyr)


def tv_corr_lookup(pyramid, coords: Array, radius: int = 4) -> Array:
    """Windowed bilinear lookup (align_corners=True, zero pad) on each
    pyramid level. coords: (B, H, W, 2) as (x, y) at level-0 resolution.
    Channel order per level is (dx-major, dy-minor), matching torchvision's
    meshgrid(di, dj, indexing="ij") flatten."""
    b, h, w, _ = coords.shape
    side = 2 * radius + 1
    d = jnp.linspace(-radius, radius, side, dtype=jnp.float32)
    delta = jnp.stack(jnp.meshgrid(d, d, indexing="ij"), axis=-1)
    cc = coords.reshape(b * h * w, 1, 1, 2)
    out = []
    for vol in pyramid:
        sampled = bilinear_sampler_zero_pad(vol, cc + delta[None])
        out.append(sampled.reshape(b, h, w, side * side))
        cc = cc / 2
    return jnp.concatenate(out, axis=-1)


class _TVMotionEncoder(nn.Module):
    dtype: Any

    @nn.compact
    def __call__(self, flow: Array, corr: Array) -> Array:
        co = _TVConvNormAct(256, 1, dtype=self.dtype, name="convcorr1")(corr)
        co = _TVConvNormAct(192, 3, dtype=self.dtype, name="convcorr2")(co)
        fl = _TVConvNormAct(128, 7, dtype=self.dtype, name="convflow1")(flow)
        fl = _TVConvNormAct(64, 3, dtype=self.dtype, name="convflow2")(fl)
        h = _TVConvNormAct(126, 3, dtype=self.dtype, name="conv")(
            jnp.concatenate([co, fl], axis=-1))
        return jnp.concatenate([h, flow], axis=-1)


class _TVConvGRU(nn.Module):
    """Separable-kernel GRU stage (torchvision raft ConvGRU)."""
    kernel: tuple[int, int]
    hidden: int
    dtype: Any

    @nn.compact
    def __call__(self, h: Array, x: Array) -> Array:
        kh, kw = self.kernel
        pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))

        def conv(name, inp):
            return nn.Conv(self.hidden, self.kernel, padding=pad,
                           dtype=self.dtype, name=name)(inp)

        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(conv("convz", hx))
        r = jax.nn.sigmoid(conv("convr", hx))
        q = jnp.tanh(conv("convq", jnp.concatenate([r * h, x], axis=-1)))
        return (1.0 - z) * h + z * q


class _TVIteration(nn.Module):
    """One torchvision RAFT update step, scanned with params broadcast."""
    radius: int
    dtype: Any

    @nn.compact
    def __call__(self, carry, const):
        coords1, hidden = carry
        pyramid, context, coords0 = const[0], const[1], const[2]

        corr = tv_corr_lookup(pyramid, coords1, self.radius)
        flow = coords1 - coords0
        motion = _TVMotionEncoder(self.dtype, name="motion_encoder")(
            flow.astype(self.dtype), corr.astype(self.dtype))
        x = jnp.concatenate([context, motion], axis=-1)
        hidden = _TVConvGRU((1, 5), 128, self.dtype, name="convgru1")(
            hidden, x)
        hidden = _TVConvGRU((5, 1), 128, self.dtype, name="convgru2")(
            hidden, x)
        d = _TVConvNormAct(256, 3, dtype=self.dtype, name="flow_head_1")(
            hidden)
        p = 1
        delta = nn.Conv(2, (3, 3), padding=((p, p), (p, p)),
                        dtype=jnp.float32, name="flow_head_2")(
            d.astype(jnp.float32))
        m = _TVConvNormAct(256, 3, dtype=self.dtype, name="mask_conv1")(
            hidden)
        mask = 0.25 * nn.Conv(64 * 9, (1, 1), dtype=jnp.float32,
                              name="mask_conv2")(m.astype(jnp.float32))
        coords1 = coords1 + delta
        return (coords1, hidden), mask


class RAFT2DLarge(nn.Module):
    """torchvision ``raft_large`` (NHWC, scan-based).

    forward(image1, image2, iters) -> (B, H, W, 2) upsampled flow, or the
    per-iteration low-res flows plus final upsampled flow when
    ``train_mode``. Inputs follow torchvision: RGB normalized to [-1, 1].
    """
    corr_levels: int = 4
    corr_radius: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image1: Array, image2: Array, iters: int = 12,
                 train_mode: bool = False):
        b, ht, wd, _ = image1.shape
        h8, w8 = ht // 8, wd // 8

        fnet = _TVFeatureEncoder(norm="instance", dtype=self.dtype,
                                 name="feature_encoder")
        both = fnet(jnp.concatenate([image1, image2], axis=0))
        fmap1, fmap2 = both[:b], both[b:]
        pyramid = tv_corr_pyramid(fmap1.astype(jnp.float32),
                                  fmap2.astype(jnp.float32),
                                  self.corr_levels)

        cnet = _TVFeatureEncoder(norm="batch", dtype=self.dtype,
                                 name="context_encoder")(image1)
        hidden = jnp.tanh(cnet[..., :128]).astype(jnp.float32)
        context = nn.relu(cnet[..., 128:]).astype(jnp.float32)

        gx = jnp.broadcast_to(
            jnp.arange(w8, dtype=jnp.float32)[None, :], (h8, w8))
        gy = jnp.broadcast_to(
            jnp.arange(h8, dtype=jnp.float32)[:, None], (h8, w8))
        coords0 = jnp.broadcast_to(
            jnp.stack([gx, gy], -1)[None], (b, h8, w8, 2))

        scan_mod = nn.scan(
            _TVIteration, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=nn.broadcast,
            out_axes=0, length=iters,
        )(radius=self.corr_radius, dtype=self.dtype, name="update")

        (coords1, _), masks = scan_mod((coords0, hidden),
                                       (pyramid, context, coords0))
        flow = coords1 - coords0
        flow_up = cvx_upsample(8.0 * flow, masks[-1])
        if train_mode:
            return flow, flow_up
        return flow_up
