"""AutoencoderKL: Stable-Diffusion-style KL autoencoder over RGBD (NHWC).

Re-design of `/root/reference/models/AutoencoderKL.py` and the DDPM-derived
conv Encoder/Decoder in `/root/reference/submodules/vae/vae_model.py`:
4-channel (RGB + depth) input, z=4 latent at 1/8 resolution, channel
multipliers (1, 2, 4, 4), 2 res-blocks per level, mid-block self-attention
(`get_autoencoder`, `AutoencoderKL.py:151-177`).

Diagonal Gaussian posterior utilities mirror
`/root/reference/submodules/vae/distributions.py:26-93`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 4
    out_channels: int = 4
    base_ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    double_z: bool = True


def _gn(x, dtype):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=dtype)(x)


class ResnetBlock(nn.Module):
    """DDPM res-block (`vae_model.py:80-140`); optional timestep embedding
    is injected between the two convs as in the reference."""
    out_ch: int
    dtype: Any

    @nn.compact
    def __call__(self, x: Array, temb: Array | None = None) -> Array:
        h = nn.swish(_gn(x, self.dtype))
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype)(h)
        if temb is not None:
            h = h + nn.Dense(self.out_ch, dtype=self.dtype,
                             name="temb_proj")(nn.swish(temb))[:, None, None]
        h = nn.swish(_gn(h, self.dtype))
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype)(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype)(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over (H*W) tokens."""
    dtype: Any

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        y = _gn(x, self.dtype)
        q = nn.Conv(c, (1, 1), dtype=self.dtype)(y).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype)(y).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype)(y).reshape(b, h * w, c)
        attn = jnp.einsum("bic,bjc->bij", q, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * (c ** -0.5), axis=-1).astype(v.dtype)
        out = jnp.einsum("bij,bjc->bic", attn, v).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype)(out)
        return x + out


class VAEEncoder(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.config
        h = nn.Conv(cfg.base_ch, (3, 3), padding="SAME",
                    dtype=self.dtype)(x.astype(self.dtype))
        for i, mult in enumerate(cfg.ch_mult):
            for _ in range(cfg.num_res_blocks):
                h = ResnetBlock(cfg.base_ch * mult, self.dtype)(h)
            if i != len(cfg.ch_mult) - 1:
                # SD uses asymmetric (0,1) padding before a stride-2 conv.
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2),
                            padding="VALID", dtype=self.dtype)(h)
        h = ResnetBlock(h.shape[-1], self.dtype)(h)
        h = AttnBlock(self.dtype)(h)
        h = ResnetBlock(h.shape[-1], self.dtype)(h)
        h = nn.swish(_gn(h, self.dtype))
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(out_ch, (3, 3), padding="SAME", dtype=jnp.float32)(
            h.astype(jnp.float32))


class VAEDecoder(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        cfg = self.config
        ch = cfg.base_ch * cfg.ch_mult[-1]
        h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype)(
            z.astype(self.dtype))
        h = ResnetBlock(ch, self.dtype)(h)
        h = AttnBlock(self.dtype)(h)
        h = ResnetBlock(ch, self.dtype)(h)
        for i, mult in reversed(list(enumerate(cfg.ch_mult))):
            for _ in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(cfg.base_ch * mult, self.dtype)(h)
            if i != 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, 2 * hh, 2 * ww, c),
                                     method="nearest")
                h = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype)(h)
        h = nn.swish(_gn(h, self.dtype))
        return nn.Conv(cfg.out_channels, (3, 3), padding="SAME",
                       dtype=jnp.float32)(h.astype(jnp.float32))


class DiagonalGaussian:
    """Posterior over latents (`distributions.py:26-68`). moments: NHWC with
    channels [mean | logvar]."""

    def __init__(self, moments: Array):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, rng: Array) -> Array:
        noise = jax.random.normal(rng, self.mean.shape, self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self) -> Array:
        return self.mean

    def kl(self, other: "DiagonalGaussian | None" = None) -> Array:
        if other is None:
            return 0.5 * jnp.sum(self.mean ** 2 + self.var - 1.0
                                 - self.logvar, axis=(1, 2, 3))
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var - 1.0
            + other.logvar - self.logvar, axis=(1, 2, 3))

    def nll(self, sample: Array) -> Array:
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=(1, 2, 3))


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two Gaussians (`distributions.py:71-93`)."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + (mean1 - mean2) ** 2 * jnp.exp(-logvar2))


class AutoencoderKL(nn.Module):
    """encode -> DiagonalGaussian; decode latent -> reconstruction."""
    config: VAEConfig = VAEConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = VAEEncoder(self.config, self.dtype)
        self.decoder = VAEDecoder(self.config, self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.embed_dim, (1, 1))
        self.post_quant_conv = nn.Conv(self.config.z_channels, (1, 1))

    def encode(self, x: Array) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x))
        return DiagonalGaussian(moments)

    def decode(self, z: Array) -> Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: Array, rng: Array | None = None,
                 sample_posterior: bool = True):
        posterior = self.encode(x)
        if sample_posterior and rng is not None:
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        return self.decode(z), posterior


def get_autoencoder(dtype=jnp.bfloat16) -> AutoencoderKL:
    """The reference's RGBD config (`AutoencoderKL.py:151-177`)."""
    return AutoencoderKL(VAEConfig(), dtype=dtype)


# ---------------------------------------------------------------------------
# DDPM-library variants carried by the reference but unused by its pipeline
# (`/root/reference/submodules/vae/vae_model.py:208-744`). Provided for
# inventory completeness; they share the blocks above.
# ---------------------------------------------------------------------------


def _upsample2x(h: Array) -> Array:
    b, hh, ww, c = h.shape
    return jax.image.resize(h, (b, 2 * hh, 2 * ww, c), method="nearest")


class DDPMUNet(nn.Module):
    """Timestep-conditioned UNet (`vae_model.py:208-368` ``Model``): skip
    connections from every down block, optional sinusoid time embedding,
    optional channel-concat context."""
    ch: int = 64
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 64
    use_timestep: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, t: Array | None = None,
                 context: Array | None = None) -> Array:
        from sndepth_tpu.models.denoiser import timestep_embedding

        if context is not None:
            x = jnp.concatenate([x, context], axis=-1)
        temb = None
        if self.use_timestep:
            temb = timestep_embedding(t, self.ch)
            temb = nn.Dense(4 * self.ch, dtype=self.dtype)(temb)
            temb = nn.Dense(4 * self.ch, dtype=self.dtype)(nn.swish(temb))

        curr_res = self.resolution
        hs = [nn.Conv(self.ch, (3, 3), padding="SAME",
                      dtype=self.dtype)(x.astype(self.dtype))]
        for i, mult in enumerate(self.ch_mult):
            for _ in range(self.num_res_blocks):
                h = ResnetBlock(self.ch * mult, self.dtype)(hs[-1], temb)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(self.dtype)(h)
                hs.append(h)
            if i != len(self.ch_mult) - 1:
                # reference Downsample: asymmetric (0,1) pad + stride-2 conv
                d = jnp.pad(hs[-1], ((0, 0), (0, 1), (0, 1), (0, 0)))
                hs.append(nn.Conv(d.shape[-1], (3, 3), strides=(2, 2),
                                  padding="VALID", dtype=self.dtype)(d))
                curr_res //= 2

        h = hs[-1]
        h = ResnetBlock(h.shape[-1], self.dtype)(h, temb)
        h = AttnBlock(self.dtype)(h)
        h = ResnetBlock(h.shape[-1], self.dtype)(h, temb)

        for i, mult in reversed(list(enumerate(self.ch_mult))):
            for _ in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResnetBlock(self.ch * mult, self.dtype)(h, temb)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(self.dtype)(h)
            if i != 0:
                h = nn.Conv(h.shape[-1], (3, 3), padding="SAME",
                            dtype=self.dtype)(_upsample2x(h))
                curr_res *= 2

        h = nn.swish(_gn(h, self.dtype))
        return nn.Conv(self.out_ch, (3, 3), padding="SAME",
                       dtype=jnp.float32)(h.astype(jnp.float32))


class SimpleDecoder(nn.Module):
    """1x1 -> 3 res-blocks (x2,x4,x2 widths) -> 1x1 -> 2x upsample conv
    (`vae_model.py:600-640`)."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        h = nn.Conv(c, (1, 1), dtype=self.dtype)(x.astype(self.dtype))
        for mult in (2, 4, 2):
            h = ResnetBlock(mult * c, self.dtype)(h)
        h = nn.Conv(c, (1, 1), dtype=self.dtype)(h)
        h = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype)(
            _upsample2x(h))
        h = nn.swish(_gn(h, self.dtype))
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       dtype=jnp.float32)(h.astype(jnp.float32))


class UpsampleDecoder(nn.Module):
    """Res-block tower with nearest-2x upsampling between levels
    (`vae_model.py:642-694`)."""
    out_channels: int
    ch: int
    num_res_blocks: int = 2
    ch_mult: Sequence[int] = (2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = x.astype(self.dtype)
        for i, mult in enumerate(self.ch_mult):
            for _ in range(self.num_res_blocks + 1):
                h = ResnetBlock(self.ch * mult, self.dtype)(h)
            if i != len(self.ch_mult) - 1:
                h = nn.Conv(h.shape[-1], (3, 3), padding="SAME",
                            dtype=self.dtype)(_upsample2x(h))
        h = nn.swish(_gn(h, self.dtype))
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       dtype=jnp.float32)(h.astype(jnp.float32))


class LatentRescaler(nn.Module):
    """Res blocks, factor-resize, attention, res blocks, 1x1 out
    (`vae_model.py:696-744`)."""
    factor: float
    mid_channels: int
    out_channels: int
    depth: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                    dtype=self.dtype)(x.astype(self.dtype))
        for _ in range(self.depth):
            h = ResnetBlock(self.mid_channels, self.dtype)(h)
        b, hh, ww, c = h.shape
        h = jax.image.resize(
            h, (b, int(round(hh * self.factor)), int(round(ww * self.factor)),
                c), method="nearest")
        h = AttnBlock(self.dtype)(h)
        for _ in range(self.depth):
            h = ResnetBlock(self.mid_channels, self.dtype)(h)
        return nn.Conv(self.out_channels, (1, 1), dtype=jnp.float32)(
            h.astype(jnp.float32))
