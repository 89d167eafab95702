"""Differentiable image warping (TPU-native, NHWC).

Re-design of the reference's hand-rolled gather sampler
(`/root/reference/utils/utils_edited.py:386-486`). The sampling *semantics*
are reproduced exactly — including the out-of-bounds behavior that falls out
of its clamped-index weight construction:

  x0 = floor(x); x1 = x0 + 1; both clamped to [0, W-1]
  wt_x0 = x1_clamped - x;  wt_x1 = x - x0_clamped

For in-bounds coordinates the four weights sum to 1 (standard bilinear); for
coordinates more than one pixel outside the border both clamped indices
coincide and the weights sum to 0, so the output is exactly 0 ("points
falling outside the source image boundary have value 0").

Implementation is a single advanced-indexing gather per tap — XLA lowers this
to a fused dynamic-gather; no flat-index bookkeeping needed.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

Array = jax.Array

# Backend dispatch: the Pallas VMEM-resident gather kernel
# (`kernels/warp.py`) is ~7x faster than XLA's row gather on TPU (measured
# 37.6 ms vs 272 ms fwd, 39.4 ms vs 271 ms fwd+bwd, for 128x128x416x3 on
# v5e) and matches both samplers to float epsilon. "auto" uses it on TPU
# backends; tests force either via env.
_BACKEND = os.environ.get("SNDEPTH_WARP_BACKEND", "auto")


def _use_pallas(imgs: Array, coords: Array) -> bool:
    if _BACKEND == "xla":
        return False
    if _BACKEND != "pallas" and \
            jax.default_backend() not in ("tpu", "axon"):
        return False
    # Shape gate: the kernel runs one grid step per batch image with the
    # full source plane VMEM-resident. Tiny per-image pixel counts (e.g.
    # the RAFT3D 49-tap correlation windows) or oversized planes fall back
    # to the XLA gather. Channel gate: the kernel's per-grid-step output
    # blocks are (nch, 64, 128) f32 x up-to-3 (tangents) x double-buffer;
    # many-channel FEATURE-map warps (DCNv2 at 256 ch = 48MB blew the
    # 16MB scoped-VMEM stack at UniAD reference scale) stay on XLA. 32
    # channels (deformable-attention head_dim — load-bearing: without
    # the kernel the reference-scale BEV encoder runs at XLA's ~72M
    # gather-rows/s, ~46 s/frame) is ~6MB of out blocks and fine.
    npix = coords.shape[1] * coords.shape[2]
    if coords.shape[2] < 32:
        # The kernel tiles the TARGET plane in 128-lane rows: a narrow
        # coord layout (e.g. the decoder's natural (nq, P) with P<=8
        # lanes) pads 16x+ per tile and loses badly to the XLA gather
        # (r5: UniAD detections 17.9 -> 503 ms when the 8 MB plane gate
        # admitted it). Callers with bulk point sets lane-pack their
        # coords to 128-wide rows instead (models/deformable.py).
        return False
    plane_bytes = (imgs.shape[1] * ((imgs.shape[2] + 127) // 128 * 128)
                   * imgs.shape[3] * 4)
    # 8 MB admits the UniAD refscale TSA value plane (200x200x32 =
    # 6.55 MB; A/B'd r5: 1166 -> 1000 ms/encoder-layer) while still
    # excluding feature-map warps whose out-block stack would blow the
    # scoped-VMEM budget (the channel gate below bounds those anyway).
    plane_cap = int(float(os.environ.get("SNDEPTH_WARP_PLANE_MB", "8"))
                    * 1024 * 1024)
    return (npix >= 512 and plane_bytes <= plane_cap
            and imgs.shape[3] <= 32)


def bilinear_sampler(imgs: Array, coords: Array) -> Array:
    """Bilinearly sample ``imgs`` at pixel coordinates ``coords``.

    imgs: (B, Hs, Ws, C); coords: (B, Ht, Wt, 2) with channels (x, y) in
    source-pixel units. Returns (B, Ht, Wt, C).
    """
    if _use_pallas(imgs, coords):
        from sndepth_tpu.kernels.warp import bilinear_sampler as _pk
        return _pk(imgs, coords, "edge_zero")
    b, hs, ws, _ = imgs.shape
    coords_x = coords[..., 0]
    coords_y = coords[..., 1]

    x0 = jnp.floor(coords_x)
    y0 = jnp.floor(coords_y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    x_max = jnp.asarray(ws - 1, imgs.dtype)
    y_max = jnp.asarray(hs - 1, imgs.dtype)
    x0s = jnp.clip(x0, 0.0, x_max)
    x1s = jnp.clip(x1, 0.0, x_max)
    y0s = jnp.clip(y0, 0.0, y_max)
    y1s = jnp.clip(y1, 0.0, y_max)

    wt_x0 = x1s - coords_x
    wt_x1 = coords_x - x0s
    wt_y0 = y1s - coords_y
    wt_y1 = coords_y - y0s

    x0i = x0s.astype(jnp.int32)
    x1i = x1s.astype(jnp.int32)
    y0i = y0s.astype(jnp.int32)
    y1i = y1s.astype(jnp.int32)

    bidx = jnp.arange(b, dtype=jnp.int32)[:, None, None]
    im00 = imgs[bidx, y0i, x0i]
    im01 = imgs[bidx, y1i, x0i]
    im10 = imgs[bidx, y0i, x1i]
    im11 = imgs[bidx, y1i, x1i]

    w00 = (wt_x0 * wt_y0)[..., None]
    w01 = (wt_x0 * wt_y1)[..., None]
    w10 = (wt_x1 * wt_y0)[..., None]
    w11 = (wt_x1 * wt_y1)[..., None]

    return w00 * im00 + w01 * im01 + w10 * im10 + w11 * im11


def bilinear_sampler_zero_pad(imgs: Array, coords: Array) -> Array:
    """Standard zero-padded bilinear sampling (exact at integer borders).

    Unlike :func:`bilinear_sampler` (which reproduces the GeoNet
    reference's border quirk of zeroing the exact last row/column), this
    uses fractional-part weights and per-tap in-bounds masks: sampling at
    integer coordinate (W-1) returns the border pixel with weight 1. Used
    by the RAFT3D correlation lookup and depth sampler, where the CUDA
    `corr_index_forward` / `grid_sample` semantics are the reference.
    """
    if _use_pallas(imgs, coords):
        from sndepth_tpu.kernels.warp import bilinear_sampler as _pk
        return _pk(imgs, coords, "zero_pad")
    b, hs, ws, _ = imgs.shape
    cx = coords[..., 0]
    cy = coords[..., 1]
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = cx - x0
    fy = cy - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None, None]

    out = 0.0
    for dy, wy in ((0, 1.0 - fy), (1, fy)):
        for dx, wx in ((0, 1.0 - fx), (1, fx)):
            xi = x0i + dx
            yi = y0i + dy
            valid = ((xi >= 0) & (xi <= ws - 1) &
                     (yi >= 0) & (yi <= hs - 1))
            tap = imgs[bidx, jnp.clip(yi, 0, hs - 1),
                       jnp.clip(xi, 0, ws - 1)]
            w = (wx * wy * valid.astype(imgs.dtype))[..., None]
            out = out + w * tap
    return out


def flow_warp(src_img: Array, flow: Array) -> Array:
    """Warp ``src_img`` by per-pixel 2D ``flow`` (both NHWC).

    src_img: (B, H, W, C); flow: (B, H, W, 2). Matches
    `utils_edited.py:386-399`: target grid + flow sampled from the source.
    """
    b, h, w, _ = src_img.shape
    xs = jnp.arange(w, dtype=flow.dtype)
    ys = jnp.arange(h, dtype=flow.dtype)
    grid = jnp.stack(
        [jnp.broadcast_to(xs[None, :], (h, w)),
         jnp.broadcast_to(ys[:, None], (h, w))], axis=-1)
    coords = grid[None] + flow
    return bilinear_sampler(src_img, coords)
