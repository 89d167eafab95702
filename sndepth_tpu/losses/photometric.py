"""Self-supervised photometric / smoothness losses (NHWC).

Matches `/root/reference/models/loss_functions.py` and the loss assembly in
`/root/reference/models/baseline.py:1061-1161`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sndepth_tpu.ops.pyramid import gradient_x, gradient_y
from sndepth_tpu.ops.ssim import image_similarity

Array = jax.Array


def smooth_loss(depth: Array, image: Array) -> Array:
    """Edge-aware first-order smoothness.

    depth: (B, H, W, 1); image: (B, H, W, 3). Depth gradients are
    down-weighted where the image has strong gradients
    (`loss_functions.py:8-24`).
    """
    from sndepth_tpu.kernels import smooth_loss as _fused
    if _fused.fused_ok(depth):
        # One-VMEM-pass Pallas kernel incl. the analytic depth gradient
        # (kernels/smooth_loss.py; image gets no gradient — it is data
        # at every call site, as in the reference). Parity-tested.
        return _fused.smooth_loss_fused(depth, image)

    g_depth_x = gradient_x(depth)
    g_depth_y = gradient_y(depth)
    g_img_x = gradient_x(image)
    g_img_y = gradient_y(image)

    wx = jnp.exp(-jnp.mean(jnp.abs(g_img_x), axis=3, keepdims=True))
    wy = jnp.exp(-jnp.mean(jnp.abs(g_img_y), axis=3, keepdims=True))

    return (jnp.mean(jnp.abs(g_depth_x * wx)) +
            jnp.mean(jnp.abs(g_depth_y * wy)))


def flow_smooth_loss(flow: Array, img: Array) -> Array:
    """Smoothness applied per flow channel (`loss_functions.py:26-32`).

    flow: (B, H, W, 2); img: (B, H, W, 3).
    """
    total = 0.0
    for i in range(2):
        total = total + smooth_loss(flow[..., i:i + 1], img)
    return total / 2.0


__all__ = ["image_similarity", "smooth_loss", "flow_smooth_loss"]
