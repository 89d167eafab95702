"""Pose-denoising transformer ("opt former") + embeddings.

Re-design of `/root/reference/models/denoiser.py` and
`/root/reference/utils/embedding.py`:
* sinusoidal timestep embedding + SiLU MLP (out dim 128);
* harmonic pose embedding (2^k frequencies, sin/cos + input append —
  replaces the pytorch3d HarmonicEmbedding dependency);
* 8-layer pre-norm transformer encoder (d=512, 4 heads, ffn 1024) over the
  per-track tokens [pose_emb | time_emb | DINO features | pivot one-hot];
* LayerNorm MLP head -> 9-dim pose update.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def timestep_embedding(timesteps: Array, dim: int,
                       max_period: float = 10000.0) -> Array:
    """Sinusoidal embedding, [cos | sin] ordering (`embedding.py:24-34`)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimeStepEmbedding(nn.Module):
    dim: int = 256
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.dim // 2

    @nn.compact
    def __call__(self, t: Array) -> Array:
        emb = timestep_embedding(t, self.dim)
        h = nn.Dense(self.dim // 2, dtype=self.dtype)(emb)
        h = nn.silu(h)
        return nn.Dense(self.dim // 2, dtype=self.dtype)(h)


def harmonic_embedding(x: Array, n_harmonics: int = 10,
                       append_input: bool = True) -> Array:
    """[sin(2^k x), cos(2^k x), x]: pytorch3d HarmonicEmbedding semantics."""
    freqs = 2.0 ** jnp.arange(n_harmonics, dtype=x.dtype)
    xb = x[..., None] * freqs                       # (..., D, K)
    sin = jnp.sin(xb).reshape(*x.shape[:-1], -1)
    cos = jnp.cos(xb).reshape(*x.shape[:-1], -1)
    parts = [sin, cos] + ([x] if append_input else [])
    return jnp.concatenate(parts, axis=-1)


def harmonic_out_dim(target_dim: int, n_harmonics: int = 10,
                     append_input: bool = True) -> int:
    return target_dim * (2 * n_harmonics + int(append_input))


class TransformerEncoderLayer(nn.Module):
    """Pre-norm encoder layer (torch ``norm_first=True`` semantics)."""
    d_model: int = 512
    nhead: int = 4
    dim_feedforward: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, dtype=self.dtype)(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(self.dim_feedforward, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, dtype=self.dtype)(y)
        return x + y


class TransformerEncoder(nn.Module):
    d_model: int = 512
    nhead: int = 4
    num_layers: int = 8
    dim_feedforward: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for _ in range(self.num_layers):
            x = TransformerEncoderLayer(self.d_model, self.nhead,
                                        self.dim_feedforward,
                                        self.dtype)(x)
        return x


class Denoiser(nn.Module):
    """forward(x, t, z): x (B, N, target_dim) noisy poses; t (B,) timestep;
    z (B, N, z_dim) per-track features -> (B, N, target_dim)."""
    target_dim: int = 9
    z_dim: int = 384
    d_model: int = 512
    nhead: int = 4
    num_layers: int = 8
    dim_feedforward: int = 1024
    mlp_hidden_dim: int = 128
    pivot_cam_onehot: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, t: Array, z: Array) -> Array:
        b, n, _ = x.shape
        t_emb = TimeStepEmbedding(dtype=self.dtype)(t)
        t_emb = jnp.broadcast_to(t_emb[:, None, :], (b, n, t_emb.shape[-1]))
        x_emb = harmonic_embedding(x)

        if self.pivot_cam_onehot:
            pivot = jnp.zeros((b, n, 1), z.dtype).at[:, 0, 0].set(1.0)
            z = jnp.concatenate([z, pivot], axis=-1)

        feats = jnp.concatenate([x_emb, t_emb, z], axis=-1)
        h = nn.Dense(self.d_model, dtype=self.dtype)(feats)
        h = TransformerEncoder(self.d_model, self.nhead, self.num_layers,
                               self.dim_feedforward, self.dtype)(h)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = nn.relu(nn.Dense(self.mlp_hidden_dim, dtype=self.dtype)(h))
        return nn.Dense(self.target_dim, dtype=jnp.float32)(
            h.astype(jnp.float32))


def get_opt_model(dtype=jnp.float32) -> Denoiser:
    """The reference config (`denoiser.py:167-184`)."""
    return Denoiser(dtype=dtype)
