"""Alternate disparity networks (unused by the main path, kept for parity).

* :class:`DispNet` — the `/root/reference/models/DispNet.py:46` variant of
  DispNetS: single conv per encoder level, upconv decoder with iconv
  refinement, same 4-scale ``alpha*sigmoid+beta`` heads;
* :class:`DispUNet` — the `/root/reference/models/DispUnet.py` U-Net
  generator family (``define_G``): symmetric skip U-Net with optional
  Gaussian-noise injection, tanh output.

Neither is wired into training (the reference likewise never invokes them
from the working path — survey §2.1); they exist so users of the reference
find the same model surface.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from sndepth_tpu.models.dispnet import (TorchConvTranspose2x, _crop_like,
                                        _upsample2x)

Array = jax.Array


class DispNet(nn.Module):
    alpha: float = 10.0
    beta: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array):
        x = x.astype(self.dtype)
        planes = (32, 64, 128, 256, 512, 512, 512)
        kernels = (7, 5, 3, 3, 3, 3, 3)
        feats = []
        h = x
        for p, k in zip(planes, kernels):
            pd = (k - 1) // 2
            h = nn.Conv(p, (k, k), strides=(2, 2),
                        padding=((pd, pd), (pd, pd)), dtype=self.dtype)(h)
            h = nn.relu(h)
            feats.append(h)
        c1, c2, c3, c4, c5, c6, c7 = feats

        def up(h, features):
            return nn.relu(TorchConvTranspose2x(features, self.dtype)(h))

        def iconv(h, features):
            h = nn.Conv(features, (3, 3), padding="SAME",
                        dtype=self.dtype)(h)
            return nn.relu(h)

        def head(h):
            d = nn.Conv(1, (3, 3), padding="SAME", dtype=jnp.float32)(
                h.astype(jnp.float32))
            return self.alpha * nn.sigmoid(d) + self.beta

        u = _crop_like(up(c7, 512), c6)
        h = iconv(jnp.concatenate([u, c6], -1), 512)
        u = _crop_like(up(h, 512), c5)
        h = iconv(jnp.concatenate([u, c5], -1), 512)
        u = _crop_like(up(h, 256), c4)
        h = iconv(jnp.concatenate([u, c4], -1), 256)
        u = _crop_like(up(h, 128), c3)
        h = iconv(jnp.concatenate([u, c3], -1), 128)
        d4 = head(h)
        u = _crop_like(up(h, 64), c2)
        d4u = _crop_like(_upsample2x(d4), c2).astype(self.dtype)
        h = iconv(jnp.concatenate([u, c2, d4u], -1), 64)
        d3 = head(h)
        u = _crop_like(up(h, 32), c1)
        d3u = _crop_like(_upsample2x(d3), c1).astype(self.dtype)
        h = iconv(jnp.concatenate([u, c1, d3u], -1), 32)
        d2 = head(h)
        u = _crop_like(up(h, 16), x)
        d2u = _crop_like(_upsample2x(d2), x).astype(self.dtype)
        h = iconv(jnp.concatenate([u, d2u], -1), 16)
        d1 = head(h)
        return d1, d2, d3, d4


class GaussianNoiseLayer(nn.Module):
    """Additive unit-Gaussian noise (`DispUnet.py` GaussianNoiseLayer)."""

    @nn.compact
    def __call__(self, x: Array, rng: Array | None = None) -> Array:
        if rng is None:
            return x
        return x + jax.random.normal(rng, x.shape, x.dtype)


class DispUNet(nn.Module):
    """Symmetric skip U-Net generator (`DispUnet.py` _UNetGenerator /
    define_G): num_downs halvings to a bottleneck, tanh output."""
    out_channels: int = 1
    base: int = 64
    num_downs: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, rng: Array | None = None) -> Array:
        x = x.astype(self.dtype)
        skips = []
        h = x
        ch = self.base
        for i in range(self.num_downs):
            h = nn.Conv(min(ch, 8 * self.base), (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.dtype)(h)
            h = nn.leaky_relu(h, 0.2)
            if i != self.num_downs - 1:
                h = nn.GroupNorm(num_groups=None, group_size=1,
                                 dtype=self.dtype)(h)   # instance norm
            skips.append(h)
            ch *= 2

        h = GaussianNoiseLayer()(h, rng)
        for i in reversed(range(self.num_downs)):
            target = skips[i - 1] if i > 0 else x
            features = (min(self.base * 2 ** max(i - 1, 0), 8 * self.base)
                        if i > 0 else self.base)
            h = nn.relu(h)
            h = TorchConvTranspose2x(features, self.dtype)(h)
            h = _crop_like(h, target)
            if i > 0:
                h = nn.GroupNorm(num_groups=None, group_size=1,
                                 dtype=self.dtype)(h)
                h = jnp.concatenate([h, skips[i - 1]], axis=-1)
        out = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                      dtype=jnp.float32)(h.astype(jnp.float32))
        return nn.tanh(out)
