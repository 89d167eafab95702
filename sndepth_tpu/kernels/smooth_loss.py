"""Pallas TPU kernel: fused edge-aware smoothness loss (+ depth gradient).

GeoNet's disparity-smoothness term (`/root/reference/models/
loss_functions.py:8-24`, assembled at `baseline.py:1125-1135`):

    gdx = depth[:, :, :-1] - depth[:, :, 1:]
    gdy = depth[:, :-1] - depth[:, 1:]
    wx  = exp(-mean_c |img_x gradient|)
    wy  = exp(-mean_c |img_y gradient|)
    loss = mean|gdx * wx| + mean|gdy * wy|

Split across XLA ops this spends several full-plane HBM passes per scale
(gradients, exp weights, abs, two means, and their transposes in the
backward). One VMEM pass per (batch-of-planes) computes both masked
partial sums AND the analytic depth gradient (the image is data — no
cotangent flows to it in the reference either):

    d loss_x / d depth[i, j]   += sign(gdx[i, j]) * wx[i, j]
    d loss_x / d depth[i, j+1] -= sign(gdx[i, j]) * wx[i, j]

(y symmetric). The custom VJP scales the two saved gradient planes by
the incoming scalar cotangents — zero backward kernel launches.

Returns the two SUMS (x- and y-direction); callers divide by the
reference's mean denominators ``B*h*(w-1)`` / ``B*(h-1)*w``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sndepth_tpu.kernels.warp import _LANE, _SUB, _round_up

Array = jax.Array

_BACKEND = os.environ.get("SNDEPTH_SMOOTH_BACKEND", "auto")


def _fold(err, h, wp):
    return err.reshape(h // _SUB, _SUB, wp // _LANE, _LANE).sum(axis=(0, 2))


def _kernel(d_ref, img_ref, sx_ref, sy_ref, dd_x_ref, dd_y_ref, *,
            h, w, nch, need_grad):
    """One grid step = one depth plane + its image planes."""
    hp, wp = d_ref.shape[1], d_ref.shape[2]
    d = d_ref[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    mx = ((col < w - 1) & (row < h)).astype(jnp.float32)
    my = ((col < w) & (row < h - 1)).astype(jnp.float32)

    def shift_x(a):
        # a[:, j+1] with a zero tail — matches the [:, 1:] slice extent.
        return jnp.concatenate(
            [a[:, 1:], jnp.zeros((hp, 1), jnp.float32)], axis=1)

    def shift_y(a):
        return jnp.concatenate(
            [a[1:, :], jnp.zeros((1, wp), jnp.float32)], axis=0)

    gax = jnp.zeros((hp, wp), jnp.float32)
    gay = jnp.zeros((hp, wp), jnp.float32)
    for ch in range(nch):
        im = img_ref[0, ch]
        gax = gax + jnp.abs(im - shift_x(im))
        gay = gay + jnp.abs(im - shift_y(im))
    wx = jnp.exp(-gax / nch) * mx
    wy = jnp.exp(-gay / nch) * my

    gdx = d - shift_x(d)
    gdy = d - shift_y(d)
    sx_ref[0] = _fold(jnp.abs(gdx) * wx, hp, wp)
    sy_ref[0] = _fold(jnp.abs(gdy) * wy, hp, wp)

    if need_grad:
        px = jnp.sign(gdx) * wx          # d sum_x / d gdx (masked)
        py = jnp.sign(gdy) * wy
        # gdx[i, j] = d[i, j] - d[i, j+1]: scatter +p at j, -p at j+1
        # (the j+1 term is a right-shift of p: receives from j-1).
        def unshift_x(a):
            return jnp.concatenate(
                [jnp.zeros((hp, 1), jnp.float32), a[:, :-1]], axis=1)

        def unshift_y(a):
            return jnp.concatenate(
                [jnp.zeros((1, wp), jnp.float32), a[:-1, :]], axis=0)

        dd_x_ref[0] = px - unshift_x(px)
        dd_y_ref[0] = py - unshift_y(py)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _run(depth, image, need_grad):
    b, h, w, _ = depth.shape
    nch = image.shape[-1]
    hp = _round_up(h, _SUB)
    wp = _round_up(w, _LANE)
    dp = jnp.pad(depth[..., 0].astype(jnp.float32),
                 ((0, 0), (0, hp - h), (0, wp - w)))
    imp = jnp.transpose(image, (0, 3, 1, 2)).astype(jnp.float32)
    imp = jnp.pad(imp, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))

    pspec = pl.BlockSpec((1, hp, wp), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    part = pl.BlockSpec((1, _SUB, _LANE), lambda bi: (bi, 0, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, nch=nch,
                          need_grad=need_grad),
        grid=(b,),
        in_specs=[pspec,
                  pl.BlockSpec((1, nch, hp, wp), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(part, part, pspec, pspec),
        out_shape=(jax.ShapeDtypeStruct((b, _SUB, _LANE), jnp.float32),
                   jax.ShapeDtypeStruct((b, _SUB, _LANE), jnp.float32),
                   jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
                   jax.ShapeDtypeStruct((b, hp, wp), jnp.float32)),
        interpret=_interpret(),
    )(dp, imp)
    sx, sy, ddx, ddy = outs
    sums = (jnp.sum(sx), jnp.sum(sy))
    if not need_grad:
        return sums, None
    grads = (ddx[:, :h, :w, None].astype(depth.dtype),
             ddy[:, :h, :w, None].astype(depth.dtype))
    return sums, grads


@jax.custom_vjp
def smooth_loss_sums(depth: Array, image: Array) -> tuple[Array, Array]:
    """(sum|gdx*wx|, sum|gdy*wy|); gradients flow to ``depth`` only."""
    return _run(depth, image, need_grad=False)[0]


def _fwd(depth, image):
    sums, grads = _run(depth, image, need_grad=True)
    return sums, (grads, image)


def _bwd(res, g):
    (ddx, ddy), image = res
    gx, gy = g
    return (gx * ddx + gy * ddy, jnp.zeros_like(image))


smooth_loss_sums.defvjp(_fwd, _bwd)


def fused_ok(depth: Array) -> bool:
    if _BACKEND == "split":
        return False
    if _BACKEND != "fused" and \
            jax.default_backend() not in ("tpu", "axon"):
        return False
    h, w = depth.shape[1], depth.shape[2]
    plane = _round_up(h, _SUB) * _round_up(w, _LANE) * 4
    return plane * 8 <= 24 * 1024 * 1024


def smooth_loss_fused(depth: Array, image: Array) -> Array:
    """Drop-in for :func:`sndepth_tpu.losses.photometric.smooth_loss`."""
    b, h, w, _ = depth.shape
    sx, sy = smooth_loss_sums(depth, image)
    return (sx / (b * h * (w - 1)) + sy / (b * (h - 1) * w))
