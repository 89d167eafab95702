"""ViT-S/16 image feature extractor (DINO-style), multi-scale averaged.

Replaces the hub-downloaded ``dino_vits16`` in
`/root/reference/models/image_f_extract.py:28-87`: a from-scratch ViT-S/16
(patch 16, depth 12, dim 384, 6 heads) whose CLS embedding, ImageNet-
normalized and averaged over scale factors (1, 1/2, 1/3), forms the
per-image feature the Denoiser consumes.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class _Block(nn.Module):
    dim: int
    heads: int
    dtype: Any

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.MultiHeadDotProductAttention(num_heads=self.heads,
                                            dtype=self.dtype)(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(4 * self.dim, dtype=self.dtype)(y)
        # exact erf GELU: DINO/timm use torch.nn.GELU (erf), not tanh
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        return x + y


class ViT(nn.Module):
    """Returns the final-norm CLS embedding (B, dim). Input NHWC.

    Positional embeddings are bilinear-resized to the token grid so any
    input size whose dims divide the patch size works (DINO behavior).
    """
    patch: int = 16
    dim: int = 384
    depth: int = 12
    heads: int = 6
    base_grid: int = 14          # pos-emb grid for 224x224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, _ = x.shape
        gh, gw = h // self.patch, w // self.patch
        tokens = nn.Conv(self.dim, (self.patch, self.patch),
                         strides=(self.patch, self.patch),
                         dtype=self.dtype)(x.astype(self.dtype))
        tokens = tokens.reshape(b, gh * gw, self.dim)

        cls = self.param("cls", nn.initializers.zeros, (1, 1, self.dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.base_grid * self.base_grid + 1, self.dim))
        cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
        grid_pos = grid_pos.reshape(1, self.base_grid, self.base_grid,
                                    self.dim)
        grid_pos = jax.image.resize(grid_pos, (1, gh, gw, self.dim),
                                    method="bilinear")
        grid_pos = grid_pos.reshape(1, gh * gw, self.dim)

        tokens = tokens + grid_pos.astype(tokens.dtype)
        cls_tok = jnp.broadcast_to(cls + cls_pos, (b, 1, self.dim)
                                   ).astype(tokens.dtype)
        x = jnp.concatenate([cls_tok, tokens], axis=1)
        for _ in range(self.depth):
            x = _Block(self.dim, self.heads, self.dtype)(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x.astype(jnp.float32))
        return x[:, 0]


class MultiScaleImageFeatureExtractor(nn.Module):
    """ImageNet-normalize then average CLS features over scales
    (`image_f_extract.py:57-83`)."""
    scale_factors: Sequence[float] = (1.0, 1.0 / 2, 1.0 / 3)
    dtype: Any = jnp.float32

    def setup(self):
        self.net = ViT(dtype=self.dtype)

    def __call__(self, image_rgb: Array) -> Array:
        mean = jnp.asarray(IMAGENET_MEAN, image_rgb.dtype)
        std = jnp.asarray(IMAGENET_STD, image_rgb.dtype)
        img = (image_rgb - mean) / std

        b, h, w, c = img.shape
        total = None
        for s in self.scale_factors:
            if s == 1.0:
                inp = img
            else:
                nh = max((int(h * s) // 16) * 16, 16)
                nw = max((int(w * s) // 16) * 16, 16)
                inp = jax.image.resize(img, (b, nh, nw, c),
                                       method="bilinear")
            feat = self.net(inp)
            total = feat if total is None else total + feat
        return total / len(self.scale_factors)
