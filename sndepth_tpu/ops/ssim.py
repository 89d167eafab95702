"""SSIM-based photometric dissimilarity (TPU-native, NHWC).

Matches the reference DSSIM (`/root/reference/utils/utils_edited.py:121-141`):
3x3 average pooling with stride 1 and zero padding 1, where the divisor is
always 9 (torch ``AvgPool2d`` defaults to ``count_include_pad=True``), local
mean/variance/covariance, C1 = 0.01², C2 = 0.03², and the final
``clip((1 - SSIM) / 2, 0, 1)``.

Implemented as ``lax.reduce_window`` sums — XLA fuses the five pooling passes
and all the elementwise algebra into one VPU-bound kernel.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2

# Backend dispatch: on TPU the fused Pallas DSSIM (kernels/dssim.py) does
# the forward in one VMEM pass and — the real win — the analytic adjoint
# in one pass (vs ~10 XLA reduce_windows + algebra fusions in the train
# step). Force with SNDEPTH_SSIM_BACKEND=xla|pallas.
_BACKEND = os.environ.get("SNDEPTH_SSIM_BACKEND", "auto")


def _use_pallas(x: Array) -> bool:
    if _BACKEND == "xla":
        return False
    if _BACKEND != "pallas" and \
            jax.default_backend() not in ("tpu", "axon"):
        return False
    # One (H, W) f32 plane + 5 (H+2, W+2) scratch buffers must fit VMEM
    # comfortably; tiny planes aren't worth the pallas_call overhead.
    h, w = x.shape[1], x.shape[2]
    plane_bytes = h * ((w + 127) // 128 * 128) * 4
    return 64 <= h * w and plane_bytes <= 2 * 1024 * 1024


def _avg_pool3(x: Array) -> Array:
    """3x3 stride-1 avg pool over (B, H, W, C), zero-padded, divisor 9."""
    summed = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)))
    return summed / 9.0


def dssim(x: Array, y: Array) -> Array:
    """Per-pixel structural dissimilarity in [0, 1]; NHWC in, NHWC out."""
    if _use_pallas(x):
        from sndepth_tpu.kernels.dssim import dssim_pallas
        interp = jax.default_backend() not in ("tpu", "axon")
        return dssim_pallas(x, y, interp).astype(x.dtype)
    mu_x = _avg_pool3(x)
    mu_y = _avg_pool3(y)
    sigma_x = _avg_pool3(x * x) - mu_x * mu_x
    sigma_y = _avg_pool3(y * y) - mu_y * mu_y
    sigma_xy = _avg_pool3(x * y) - mu_x * mu_y

    ssim_n = (2.0 * mu_x * mu_y + _C1) * (2.0 * sigma_xy + _C2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    ssim = ssim_n / ssim_d
    return jnp.clip((1.0 - ssim) * 0.5, 0.0, 1.0)


def image_similarity(alpha: float, x: Array, y: Array) -> Array:
    """alpha-blended DSSIM + L1 photometric error.

    Matches `/root/reference/models/loss_functions.py:4-6`.
    """
    return alpha * dssim(x, y) + (1.0 - alpha) * jnp.abs(x - y)
