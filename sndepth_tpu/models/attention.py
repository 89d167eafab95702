"""Attention library for the VAE/diffusion stack (NHWC).

Re-design of `/root/reference/submodules/vae/attention.py`: linear
attention, spatial self-attention, multi-head cross-attention, transformer
blocks, and spatial transformers — including the 3-D (cross-frame) variants
that reshape ``(b f) l c <-> b (f l) c`` so attention spans all frames
(`attention.py:474-532`).

TPU-first: attention cores are `jnp.einsum` with f32 accumulation (MXU),
heads vectorized, no xformers-style special-casing — XLA fuses softmax into
the matmuls. A ``model``-axis sharding of heads is possible via the mesh in
`sndepth_tpu.parallel` (heads dim is leading in the einsums).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class LinearAttention(nn.Module):
    """O(N) attention: softmax over keys (`attention.py:86-112`)."""
    heads: int = 4
    dim_head: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Conv(inner * 3, (1, 1), use_bias=False,
                      dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv.reshape(b, h * w, 3 * inner), 3, -1)

        def split_heads(t):
            return t.reshape(b, h * w, self.heads, self.dim_head)

        q, k, v = map(split_heads, (q, k, v))
        k = jax.nn.softmax(k, axis=1)
        context = jnp.einsum("bnhd,bnhe->bhde", k, v,
                             preferred_element_type=jnp.float32)
        out = jnp.einsum("bhde,bnhd->bnhe", context.astype(q.dtype), q)
        out = out.reshape(b, h, w, inner)
        return nn.Conv(c, (1, 1), dtype=self.dtype)(out)


class CrossAttention(nn.Module):
    """Multi-head attention with optional context (`attention.py:157-203`).
    Self-attention when ``context`` is None."""
    heads: int = 8
    dim_head: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array | None = None,
                 mask: Array | None = None) -> Array:
        if context is None:
            context = x
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype)(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype)(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype)(context)

        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, m, self.heads, self.dim_head)
        v = v.reshape(b, m, self.heads, self.dim_head)

        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (self.dim_head ** -0.5)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, inner)
        return nn.Dense(x.shape[-1], dtype=self.dtype)(out)


class SpatialSelfAttention(nn.Module):
    """GroupNorm + single-head conv-projected spatial attention with a
    residual (`attention.py:115-154`)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from sndepth_tpu.models.vae import AttnBlock
        return AttnBlock(self.dtype)(x)


class FeedForward(nn.Module):
    mult: int = 4
    gated: bool = True    # GEGLU, the reference default (`attention.py:60`)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim = x.shape[-1]
        inner = dim * self.mult
        if self.gated:
            h = nn.Dense(inner * 2, dtype=self.dtype)(x)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * nn.gelu(gate)
        else:
            h = nn.gelu(nn.Dense(inner, dtype=self.dtype)(x))
        return nn.Dense(dim, dtype=self.dtype)(h)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> FF, each pre-norm residual
    (`attention.py:206-240`)."""
    heads: int = 8
    dim_head: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array | None = None) -> Array:
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype)(
            nn.LayerNorm(dtype=self.dtype)(x))
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype)(
            nn.LayerNorm(dtype=self.dtype)(x), context)
        x = x + FeedForward(dtype=self.dtype)(
            nn.LayerNorm(dtype=self.dtype)(x))
        return x


class SpatialTransformer(nn.Module):
    """Image-to-sequence transformer: GN + 1x1 in/out projections around
    ``depth`` BasicTransformerBlocks (`attention.py:243-291`)."""
    heads: int = 8
    dim_head: int = 64
    depth: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array | None = None) -> Array:
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype)(x)
        y = nn.Conv(inner, (1, 1), dtype=self.dtype)(y)
        y = y.reshape(b, h * w, inner)
        for _ in range(self.depth):
            y = BasicTransformerBlock(self.heads, self.dim_head,
                                      self.dtype)(y, context)
        y = y.reshape(b, h, w, inner)
        y = nn.Conv(c, (1, 1), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros)(y)
        return y + residual


def chunked_attention(q: Array, k: Array, v: Array, *, chunk: int = 1024,
                      mask: Array | None = None) -> Array:
    """Memory-efficient attention: the TPU-native counterpart of the
    reference's xformers path (`attention.py:294-347`).

    Never materializes the full (n, m) logits: queries are processed in
    ``chunk``-sized blocks under ``lax.map``, so peak memory is
    O(chunk * m) while every matmul stays MXU-shaped. Same math as the
    dense softmax path (f32 accumulation), bit-stable parity tested.

    q: (b, n, h, d); k/v: (b, m, h, d); mask: (b, m) keys validity.
    """
    b, n, h, d = q.shape
    scale = d ** -0.5
    pad = (-n) % chunk
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    qc = qp.reshape(b, (n + pad) // chunk, chunk, h, d)
    qc = jnp.moveaxis(qc, 1, 0)            # (nc, b, chunk, h, d)

    def one_chunk(qb):
        logits = jnp.einsum("bnhd,bmhd->bhnm", qb, k,
                            preferred_element_type=jnp.float32) * scale
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bmhd->bnhd", attn, v)

    out = jax.lax.map(one_chunk, qc)       # (nc, b, chunk, h, d)
    out = jnp.moveaxis(out, 0, 1).reshape(b, n + pad, h, d)
    return out[:, :n]


class BasicTransformerBlock21(nn.Module):
    """The reference's ``BasicTransformerBlock_21`` (`attention.py:349-399`):
    like :class:`BasicTransformerBlock` but ``disable_self_attn`` turns the
    first attention into cross-attention. The torch ``checkpoint=True``
    behavior maps to ``nn.remat(BasicTransformerBlock21)`` at use sites;
    the softmax-vs-xformers mode switch is moot on TPU — XLA fuses the
    dense path, and :func:`chunked_attention` is the long-sequence form."""
    heads: int = 8
    dim_head: int = 64
    disable_self_attn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array | None = None) -> Array:
        sa_ctx = context if self.disable_self_attn else None
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype,
                               name="attn1")(
            nn.LayerNorm(dtype=self.dtype, name="norm1")(x), sa_ctx)
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype,
                               name="attn2")(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x), context)
        x = x + FeedForward(dtype=self.dtype, name="ff")(
            nn.LayerNorm(dtype=self.dtype, name="norm3")(x))
        return x


class SpatialTransformer21(nn.Module):
    """The reference's ``SpatialTransformer_21`` (`attention.py:401-471`):
    per-depth context list, ``use_linear`` projections (Dense on tokens
    instead of 1x1 convs — identical math, the flag is kept for checkpoint
    parity), ``disable_self_attn`` plumbed through."""
    heads: int = 8
    dim_head: int = 64
    depth: int = 1
    use_linear: bool = False
    disable_self_attn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array,
                 context: Array | list[Array] | None = None) -> Array:
        if not isinstance(context, list):
            context = [context] * self.depth
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype)(x)
        if self.use_linear:
            y = y.reshape(b, h * w, c)
            y = nn.Dense(inner, dtype=self.dtype)(y)
        else:
            y = nn.Conv(inner, (1, 1), dtype=self.dtype)(y)
            y = y.reshape(b, h * w, inner)
        for d in range(self.depth):
            y = BasicTransformerBlock21(
                self.heads, self.dim_head,
                disable_self_attn=self.disable_self_attn,
                dtype=self.dtype)(y, context[d])
        if self.use_linear:
            y = nn.Dense(c, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros)(y)
            y = y.reshape(b, h, w, c)
        else:
            y = y.reshape(b, h, w, inner)
            y = nn.Conv(c, (1, 1), dtype=self.dtype,
                        kernel_init=nn.initializers.zeros)(y)
        return y + residual


class SpatialTransformer3D(nn.Module):
    """Cross-frame variant: tokens from all ``frames`` of a clip attend
    jointly — ``(b f) h w c -> b (f h w) c`` (`attention.py:474-532`)."""
    frames: int
    heads: int = 8
    dim_head: int = 64
    depth: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array | None = None) -> Array:
        bf, h, w, c = x.shape
        f = self.frames
        b = bf // f
        inner = self.heads * self.dim_head
        residual = x
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype)(x)
        y = nn.Conv(inner, (1, 1), dtype=self.dtype)(y)
        y = y.reshape(b, f * h * w, inner)
        for _ in range(self.depth):
            y = BasicTransformerBlock(self.heads, self.dim_head,
                                      self.dtype)(y, context)
        y = y.reshape(bf, h, w, inner)
        y = nn.Conv(c, (1, 1), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros)(y)
        return y + residual
