"""FlowNet: residual optical-flow encoder-decoder (NHWC).

Same topology as the reference (`/root/reference/models/FlowNet.py:41-135`):
7-level stride-2 encoder over the channel-stacked flow inputs, transposed-
conv decoder with skips, 4-scale 2-channel flow heads scaled by
``flow_scale_factor``. The reference trains with it disabled
(``train_flow=False``, `baseline.py:49`); it is provided for the full-flow
training mode.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from sndepth_tpu.models.dispnet import (_DownBlock, _IConv, _UpConv,
                                        _crop_like, _upsample2x)

Array = jax.Array


class FlowNet(nn.Module):
    """Input: (B, H, W, C_in) stacked views/warps/errors. Output: 4-scale
    flows, finest first, each (B, H/2^s, W/2^s, 2)."""
    flow_scale_factor: float = 1.0
    dtype: Any = jnp.float32
    # Same lane-packing knobs as DispNetS (the encoder levels share shapes
    # with DispNetS's, where level-0 s2d was a measured win).
    s2d_levels: tuple = (0,)
    s2d_iconv_levels: tuple = ()
    packed_dgrad_levels: tuple = ()

    @nn.compact
    def __call__(self, x: Array):
        x = x.astype(self.dtype)
        enc_planes = (32, 64, 128, 256, 512, 512, 512)
        kernels = (7, 5, 3, 3, 3, 3, 3)
        feats = []
        h = x
        for i, (planes, k) in enumerate(zip(enc_planes, kernels)):
            h = _DownBlock(planes, k, self.dtype, i in self.s2d_levels,
                           i in self.packed_dgrad_levels)(h)
            feats.append(h)
        c1, c2, c3, c4, c5, c6, c7 = feats

        def flow_head(h: Array) -> Array:
            f = nn.Conv(2, (1, 1), dtype=jnp.float32)(
                h.astype(jnp.float32))
            return self.flow_scale_factor * f

        u7 = _crop_like(_UpConv(512, self.dtype)(c7), c6)
        i7 = _IConv(512, self.dtype)(jnp.concatenate([u7, c6], -1))
        u6 = _crop_like(_UpConv(512, self.dtype)(i7), c5)
        i6 = _IConv(512, self.dtype)(jnp.concatenate([u6, c5], -1))
        u5 = _crop_like(_UpConv(256, self.dtype)(i6), c4)
        i5 = _IConv(256, self.dtype)(jnp.concatenate([u5, c4], -1))
        u4 = _crop_like(_UpConv(128, self.dtype)(i5), c3)
        i4 = _IConv(128, self.dtype)(jnp.concatenate([u4, c3], -1))
        flow4 = flow_head(i4)

        u3 = _crop_like(_UpConv(64, self.dtype)(i4), c2)
        f4up = _crop_like(_upsample2x(flow4), c2).astype(self.dtype)
        i3 = _IConv(64, self.dtype)(jnp.concatenate([u3, c2, f4up], -1))
        flow3 = flow_head(i3)

        u2 = _crop_like(_UpConv(32, self.dtype)(i3), c1)
        f3up = _crop_like(_upsample2x(flow3), c1).astype(self.dtype)
        i2 = _IConv(32, self.dtype,
                    5 in self.s2d_iconv_levels)(
                        jnp.concatenate([u2, c1, f3up], -1))
        flow2 = flow_head(i2)

        u1 = _crop_like(_UpConv(16, self.dtype)(i2), x)
        f2up = _crop_like(_upsample2x(flow2), x).astype(self.dtype)
        i1 = _IConv(16, self.dtype,
                    6 in self.s2d_iconv_levels)(
                        jnp.concatenate([u1, f2up], -1))
        flow1 = flow_head(i1)

        return flow1, flow2, flow3, flow4
