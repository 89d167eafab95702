"""Image pyramids and edge-aware gradients (TPU-native, NHWC).

Matches the reference pyramid (`/root/reference/utils/utils_edited.py:89-112`)
which uses 'area' interpolation at exact power-of-two ratios — i.e. 2x2 mean
pooling per level — and its finite-difference gradients
(`utils_edited.py:143-147`, forward differences with a sign flip:
``g[i] = x[i] - x[i+1]``).
"""

from __future__ import annotations

import jax

Array = jax.Array


def downsample2x(img: Array) -> Array:
    """2x2 mean-pool an NHWC image (H, W must be even)."""
    b, h, w, c = img.shape
    img = img.reshape(b, h // 2, 2, w // 2, 2, c)
    return img.mean(axis=(2, 4))


def scale_pyramid(img: Array, num_scales: int) -> list[Array]:
    """List of ``num_scales`` NHWC images, each 2x smaller than the last."""
    pyramid = [img]
    for _ in range(num_scales - 1):
        pyramid.append(downsample2x(pyramid[-1]))
    return pyramid


def gradient_x(img: Array) -> Array:
    """Forward difference along W: out[..., j, :] = img[j] - img[j+1]."""
    return img[:, :, :-1, :] - img[:, :, 1:, :]


def gradient_y(img: Array) -> Array:
    """Forward difference along H: out[..., i, :, :] = img[i] - img[i+1]."""
    return img[:, :-1, :, :] - img[:, 1:, :, :]
