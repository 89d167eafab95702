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
