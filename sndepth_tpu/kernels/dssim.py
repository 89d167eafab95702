"""Pallas TPU kernel: fused DSSIM.

The XLA path (`sndepth_tpu.ops.ssim.dssim`) issues five separate
``reduce_window`` pooling passes (mu_x, mu_y, E[x^2], E[y^2], E[xy]) plus
the SSIM algebra — each streaming the (B, H, W, C) images through HBM. This
kernel loads each (H, W) channel plane into VMEM once and computes all five
windowed sums as nine static shifted adds over zero-padded scratch buffers,
then the full SSIM algebra, in one pass: one HBM read per input plane, one
write for the output.

Layout: the wrapper folds channels into the grid ((B*C,) programs over
(H, W) planes), so H maps to sublanes and W to lanes — the natural VPU
tiling. Backward: custom VJP recomputing through the XLA reference
implementation (identical math), so training correctness never depends on
the kernel.

Measured (TPU v5e, 32x128x416x3 f32, 50-iter mean): XLA 1.151 ms, this
kernel 1.128 ms, max deviation 5.7e-6 — XLA's fusion already handles this
pattern well, so the kernel is kept as validated infrastructure (and the
pattern template for the harder fused warp+loss kernels) rather than wired
into the training path by default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sndepth_tpu.ops import ssim as ssim_ref

Array = jax.Array

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def _dssim_kernel(x_ref, y_ref, out_ref, xp, yp, xxp, yyp, xyp):
    h, w = x_ref.shape[1], x_ref.shape[2]
    x = x_ref[0]
    y = y_ref[0]

    for buf, val in ((xp, x), (yp, y), (xxp, x * x), (yyp, y * y),
                     (xyp, x * y)):
        buf[:] = jnp.zeros((h + 2, w + 2), jnp.float32)
        buf[1:h + 1, 1:w + 1] = val

    def pooled(buf):
        acc = jnp.zeros((h, w), jnp.float32)
        for di in range(3):
            for dj in range(3):
                acc = acc + buf[di:di + h, dj:dj + w]
        return acc / 9.0

    mu_x = pooled(xp)
    mu_y = pooled(yp)
    sigma_x = pooled(xxp) - mu_x * mu_x
    sigma_y = pooled(yyp) - mu_y * mu_y
    sigma_xy = pooled(xyp) - mu_x * mu_y

    ssim_n = (2.0 * mu_x * mu_y + _C1) * (2.0 * sigma_xy + _C2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    out_ref[0] = jnp.clip((1.0 - ssim_n / ssim_d) * 0.5, 0.0, 1.0)


def _dssim_forward(x: Array, y: Array, interpret: bool) -> Array:
    b, h, w, c = x.shape
    xt = jnp.moveaxis(x, -1, 1).reshape(b * c, h, w).astype(jnp.float32)
    yt = jnp.moveaxis(y, -1, 1).reshape(b * c, h, w).astype(jnp.float32)

    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _dssim_kernel,
        out_shape=jax.ShapeDtypeStruct((b * c, h, w), jnp.float32),
        grid=(b * c,),
        in_specs=[spec, spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2), jnp.float32)
                        for _ in range(5)],
        interpret=interpret,
    )(xt, yt)
    return jnp.moveaxis(out.reshape(b, c, h, w), 1, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dssim_pallas(x: Array, y: Array, interpret: bool = False) -> Array:
    """Fused DSSIM; same semantics as :func:`sndepth_tpu.ops.ssim.dssim`.

    ``interpret=True`` runs the Pallas interpreter (CPU tests)."""
    return _dssim_forward(x, y, interpret)


def _fwd(x, y, interpret):
    return _dssim_forward(x, y, interpret), (x, y)


def _bwd(interpret, res, g):
    x, y = res
    _, vjp = jax.vjp(ssim_ref.dssim, x, y)
    return vjp(g)


dssim_pallas.defvjp(_fwd, _bwd)


def image_similarity_pallas(alpha: float, x: Array, y: Array,
                            interpret: bool = False) -> Array:
    """alpha * DSSIM + (1-alpha) * L1 with the fused kernel."""
    return (alpha * dssim_pallas(x, y, interpret) +
            (1.0 - alpha) * jnp.abs(x - y))
