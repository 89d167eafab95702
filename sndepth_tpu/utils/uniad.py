"""UniAD functional utilities: bbox codecs, positional embeddings, GridMask.

Parity with `/root/reference/utils/utils_uniad/`:
* ``normalize_bbox``/``denormalize_bbox``: 9-dim box
  [cx, cy, cz, w, l, h, rot(, vx, vy)] <-> 10-dim network space
  [cx, cy, log w, log l, cz, log h, sin r, cos r, vx, vy]
  (`util_bbox.py:4-52`);
* ``pos2posemb2d``: sine/cosine 2-D query positional embedding
  (`functional.py:41-77`);
* ``bivariate_gaussian_activation`` for trajectory heads
  (`functional.py:5-38`);
* :class:`GridMask` grid-dropout augmentation (`grid_mask.py:7-123`) as a
  stateless function of an rng key.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def normalize_bbox(bboxes: Array) -> Array:
    cx, cy, cz = bboxes[..., 0:1], bboxes[..., 1:2], bboxes[..., 2:3]
    w, l, h = bboxes[..., 3:4], bboxes[..., 4:5], bboxes[..., 5:6]
    rot = bboxes[..., 6:7]
    parts = [cx, cy, jnp.log(w), jnp.log(l), cz, jnp.log(h),
             jnp.sin(rot), jnp.cos(rot)]
    if bboxes.shape[-1] > 7:
        parts += [bboxes[..., 7:8], bboxes[..., 8:9]]
    return jnp.concatenate(parts, axis=-1)


def denormalize_bbox(normalized: Array) -> Array:
    cx, cy = normalized[..., 0:1], normalized[..., 1:2]
    w, l = jnp.exp(normalized[..., 2:3]), jnp.exp(normalized[..., 3:4])
    cz, h = normalized[..., 4:5], jnp.exp(normalized[..., 5:6])
    rot = jnp.arctan2(normalized[..., 6:7], normalized[..., 7:8])
    parts = [cx, cy, cz, w, l, h, rot]
    if normalized.shape[-1] > 8:
        parts += [normalized[..., 8:9], normalized[..., 9:10]]
    return jnp.concatenate(parts, axis=-1)


def pos2posemb2d(pos: Array, num_pos_feats: int = 128,
                 temperature: float = 10000.0) -> Array:
    """(..., 2) normalized positions -> (..., 2*num_pos_feats) embedding."""
    scale = 2.0 * math.pi
    pos = pos * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * (dim_t // 2) / num_pos_feats)
    px = pos[..., 0:1] / dim_t
    py = pos[..., 1:2] / dim_t
    px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])],
                   axis=-1).reshape(*pos.shape[:-1], -1)
    py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])],
                   axis=-1).reshape(*pos.shape[:-1], -1)
    return jnp.concatenate([py, px], axis=-1)


def bivariate_gaussian_activation(ip: Array) -> Array:
    """Trajectory-head activation: mu passthrough, sigma exp, rho tanh."""
    mu_x, mu_y = ip[..., 0:1], ip[..., 1:2]
    if ip.shape[-1] <= 2:
        return ip
    sig_x = jnp.exp(ip[..., 2:3])
    sig_y = jnp.exp(ip[..., 3:4])
    rho = jnp.tanh(ip[..., 4:5])
    return jnp.concatenate([mu_x, mu_y, sig_x, sig_y, rho], axis=-1)


def grid_mask(rng: Array, images: Array, ratio: float = 0.5,
              prob: float = 0.7, d_range: tuple[int, int] = (2, 8)
              ) -> Array:
    """Grid-dropout augmentation (`grid_mask.py`): zero a regular grid of
    square cells with random pitch/offset, applied with probability
    ``prob``. images: (B, H, W, C)."""
    b, h, w, _ = images.shape
    k_apply, k_d, k_ox, k_oy = jax.random.split(rng, 4)
    d = jax.random.randint(k_d, (), d_range[0],
                           min(d_range[1], min(h, w)) + 1)
    keep = (d * ratio).astype(jnp.int32)
    off_x = jax.random.randint(k_ox, (), 0, d_range[1])
    off_y = jax.random.randint(k_oy, (), 0, d_range[1])
    ys = (jnp.arange(h) + off_y) % d
    xs = (jnp.arange(w) + off_x) % d
    mask = ((ys[:, None] >= keep) | (xs[None, :] >= keep)).astype(
        images.dtype)
    apply = jax.random.uniform(k_apply, ()) < prob
    masked = images * mask[None, :, :, None]
    return jnp.where(apply, masked, images)
