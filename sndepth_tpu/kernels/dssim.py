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
kernel 1.128 ms for the *forward* — XLA's fusion handles the forward
pattern fine. The win is the **backward**: in the batch-128 GeoNet train
step the DSSIM complex (5 fwd pools + ~10 adjoint pools + algebra across
4 scales x 2 views) costs ~45 ms/step of XLA reduce_window + fusion time.
`_dssim_bwd_kernel` computes the full analytic adjoint in one VMEM pass
per plane: recompute the 5 moment pools, the d(out)/d(moment)
coefficient algebra, 5 adjoint pools (avg-pool with zero-pad is
self-adjoint), and the final combine

    dX = P(A_x) + 2x*P(B_xx) + y*P(B_xy)
    dY = P(A_y) + 2y*P(B_yy) + x*P(B_xy)

with exactly the clip/maximum tie-splitting semantics of the XLA
reference's autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def _pool3(pbuf, val, h, w):
    """3x3/9 zero-padded average pool, separable: 3 vertical (sublane
    shift) adds + 3 horizontal (lane shift) adds instead of 9 2-D shifted
    adds."""
    pbuf[:] = jnp.zeros((h + 2, w + 2), jnp.float32)
    pbuf[1:h + 1, 1:w + 1] = val
    col = pbuf[0:h, :] + pbuf[1:h + 1, :] + pbuf[2:h + 2, :]
    return (col[:, 0:w] + col[:, 1:w + 1] + col[:, 2:w + 2]) / 9.0


def _dssim_kernel(x_ref, y_ref, out_ref, pbuf):
    h, w = x_ref.shape[1], x_ref.shape[2]
    x = x_ref[0]
    y = y_ref[0]

    mu_x = _pool3(pbuf, x, h, w)
    mu_y = _pool3(pbuf, y, h, w)
    sigma_x = _pool3(pbuf, x * x, h, w) - mu_x * mu_x
    sigma_y = _pool3(pbuf, y * y, h, w) - mu_y * mu_y
    sigma_xy = _pool3(pbuf, x * y, h, w) - mu_x * mu_y

    ssim_n = (2.0 * mu_x * mu_y + _C1) * (2.0 * sigma_xy + _C2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    out_ref[0] = jnp.clip((1.0 - ssim_n / ssim_d) * 0.5, 0.0, 1.0)


def _dssim_bwd_kernel(x_ref, y_ref, g_ref, dx_ref, dy_ref, pbuf):
    """Analytic DSSIM adjoint, one VMEM pass per (H, W) plane.

    Derivation (moments M = {mu_x, mu_y, Sxx, Syy, Sxy} are 3x3/9
    zero-padded average pools P; P is self-adjoint):
      t1 = 2*sigma_xy + C2   t2 = 2*mu_x*mu_y + C1
      t3 = sigma_x + sigma_y + C2   t4 = mu_x^2 + mu_y^2 + C1
      n = t2*t1, d = t4*t3, out = clip(0.5*(1 - n/d), 0, 1)
      a_n = -0.5*G*u/d,  a_d = 0.5*G*u*n/d^2   (u = clip-gradient mask,
        0.5 exactly at the 0/1 boundaries, matching jnp.clip autodiff)
      A_x = 2*mu_y*(t1 - t2)*a_n + 2*mu_x*(t3 - t4)*a_d   (dn/dmu_x etc.)
      B_xx = a_d*t4,  B_xy = 2*a_n*t2
      dX = P(A_x) + 2x*P(B_xx) + y*P(B_xy)   (dY symmetric)
    """
    h, w = x_ref.shape[1], x_ref.shape[2]
    x = x_ref[0]
    y = y_ref[0]
    g = g_ref[0]

    mu_x = _pool3(pbuf, x, h, w)
    mu_y = _pool3(pbuf, y, h, w)
    sigma_x = _pool3(pbuf, x * x, h, w) - mu_x * mu_x
    sigma_y = _pool3(pbuf, y * y, h, w) - mu_y * mu_y
    sigma_xy = _pool3(pbuf, x * y, h, w) - mu_x * mu_y

    t1 = 2.0 * sigma_xy + _C2
    t2 = 2.0 * mu_x * mu_y + _C1
    t3 = sigma_x + sigma_y + _C2
    t4 = mu_x * mu_x + mu_y * mu_y + _C1
    n = t2 * t1
    d = t4 * t3
    s = 0.5 * (1.0 - n / d)
    lo = (0.5 * ((s > 0.0).astype(jnp.float32)
                 + (s >= 0.0).astype(jnp.float32)))
    hi = (0.5 * ((s < 1.0).astype(jnp.float32)
                 + (s <= 1.0).astype(jnp.float32)))
    gp = g * lo * hi
    inv_d = 1.0 / d
    a_n = -0.5 * gp * inv_d
    a_d = 0.5 * gp * n * inv_d * inv_d

    c1 = 2.0 * a_n * (t1 - t2)
    c2 = 2.0 * a_d * (t3 - t4)
    pa_x = _pool3(pbuf, mu_y * c1 + mu_x * c2, h, w)
    pa_y = _pool3(pbuf, mu_x * c1 + mu_y * c2, h, w)
    pb_xx = _pool3(pbuf, a_d * t4, h, w)
    pb_xy = _pool3(pbuf, 2.0 * a_n * t2, h, w)

    dx_ref[0] = pa_x + 2.0 * x * pb_xx + y * pb_xy
    dy_ref[0] = pa_y + 2.0 * y * pb_xx + x * pb_xy


def _dssim_backward(x: Array, y: Array, g: Array, interpret: bool):
    b, h, w, c = x.shape
    xt = jnp.moveaxis(x, -1, 1).reshape(b * c, h, w).astype(jnp.float32)
    yt = jnp.moveaxis(y, -1, 1).reshape(b * c, h, w).astype(jnp.float32)
    gt = jnp.moveaxis(g, -1, 1).reshape(b * c, h, w).astype(jnp.float32)
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    dx, dy = pl.pallas_call(
        _dssim_bwd_kernel,
        out_shape=(jax.ShapeDtypeStruct((b * c, h, w), jnp.float32),
                   jax.ShapeDtypeStruct((b * c, h, w), jnp.float32)),
        grid=(b * c,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec),
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2), jnp.float32)],
        interpret=interpret,
    )(xt, yt, gt)
    dx = jnp.moveaxis(dx.reshape(b, c, h, w), 1, -1).astype(x.dtype)
    dy = jnp.moveaxis(dy.reshape(b, c, h, w), 1, -1).astype(y.dtype)
    return dx, dy


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
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2), jnp.float32)],
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
    return _dssim_backward(x, y, g, interpret)


dssim_pallas.defvjp(_fwd, _bwd)


def image_similarity_pallas(alpha: float, x: Array, y: Array,
                            interpret: bool = False) -> Array:
    """alpha * DSSIM + (1-alpha) * L1 with the fused kernel."""
    return (alpha * dssim_pallas(x, y, interpret) +
            (1.0 - alpha) * jnp.abs(x - y))
