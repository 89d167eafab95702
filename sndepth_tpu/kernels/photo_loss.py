"""Pallas TPU kernel: fused inverse-warp + photometric loss (+ gradient).

The GeoNet stage-1 rigid-warp loss
(`/root/reference/models/baseline.py:867-986,1061-1135`) is, per scale and
direction:

    warped = bilinear_sampler(src, coords)          # hand-rolled sampler
    err    = alpha * DSSIM(tgt, warped) + (1-alpha) * |tgt - warped|
    loss  += w * mean(err)

Split across ops, every step materializes the warped image, two tangent
planes, the DSSIM map, the |.| map, their adjoints and the tangent
contraction — ~10 HBM round-trips of full-resolution f32 planes per scale
and direction (XProf r2: ~25-35 ms/step of reduce_sum/mul/neg/div/copy
glue around the warp and dssim kernels at batch 128).

This kernel computes the WHOLE thing — warp, DSSIM, L1, masked partial
sums, and (because the downstream cotangent of a summed loss is a
*scalar*) the complete coordinate gradient — in one VMEM pass per batch
image. The custom VJP just scales the saved gradient plane by the
incoming scalar cotangent: backward costs zero kernel launches.

Semantics (all f32, matching the split ops exactly):
* warp: :func:`sndepth_tpu.kernels.warp._warp_tile` (edge_zero or
  zero_pad mode, same tap/weight math as `ops/warp.py`).
* DSSIM: 3x3/9 zero-padded average pools, C1=1e-4, C2=9e-4,
  clip((1-SSIM)/2, 0, 1) — `ops/ssim.py` / reference
  `utils_edited.py:121-141`; adjoint uses the same clip tie-splitting as
  XLA autodiff (0.5 exactly at the 0/1 boundaries).
* Gradients flow to ``coords`` ONLY. ``tgt``/``src`` receive zeros: at
  the stage-1 call sites both are input images (leaves), so their
  cotangents are dead. Do NOT use this op where the images are computed
  tensors that need gradients (stage-2 full-flow losses keep the split
  ops for exactly that reason).

Returns the SUM over in-image pixels and channels; callers divide by the
element count to get the reference's mean.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sndepth_tpu.kernels.warp import (_BK, _LANE, _NMETA, _SUB,
                                      _assemble_tile, _round_up,
                                      _warp_tile, plane_gather_blend,
                                      tile_meta)

Array = jax.Array

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2

# Force with SNDEPTH_PHOTO_BACKEND=fused|split (auto: fused on TPU when
# the plane fits VMEM).
_BACKEND = os.environ.get("SNDEPTH_PHOTO_BACKEND", "auto")

# Portrait dispatch for lane-ragged widths: "auto" (default), "1"
# (force), "0" (off). See _pair_run.
_PORTRAIT = os.environ.get("SNDEPTH_PHOTO_PORTRAIT", "auto")

# The default scoped-VMEM budget is 16MB; the pair kernel's resident set
# (inputs+outputs double-buffered + 16 scratch planes) legitimately needs
# more at batch-128 scale 0 (23.8MB measured). v5e VMEM is 128MB — raise
# the per-kernel cap to match the 48MB dispatch gate in :func:`pair_ok`.
_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _pool3(pbuf, val, h, w):
    """3x3/9 zero-padded average pool via one (h+2, w+2) scratch buffer,
    separable (3 sublane-shift adds + 3 lane-shift adds).

    ``pbuf``'s one-element border must be zero on entry (the caller zeroes
    the whole buffer ONCE per kernel invocation; this writes only the
    interior, which saves the ~40% of the pool cost the per-call full
    zeroing used to burn)."""
    pbuf[1:h + 1, 1:w + 1] = val
    col = pbuf[0:h, :] + pbuf[1:h + 1, :] + pbuf[2:h + 2, :]
    return (col[:, 0:w] + col[:, 1:w + 1] + col[:, 2:w + 2]) / 9.0


# Plane-form warp inside the pair kernel: per-tile ROW-TABLE assembly +
# whole-plane lane gathers/blends, replacing the per-tile gather loop on
# single-lane-chunk (wtp == 128, i.e. portrait scale-0) planes. r4 probes:
# per-tile lane takes carry ~5x per-op overhead vs whole-plane ones and
# were ~29 of the kernel's 50 ms — but the first whole-plane form BENCHED
# -1.3% (2344.5 vs 2376.1, one-process A/B): the always-K=5 stage B +
# double tap_setup eat the win. Default OFF pending the adaptive-K
# iteration; "auto"/"1" enables on single-chunk planes.
_PLANE = os.environ.get("SNDEPTH_PHOTO_PLANE", "0")

# Pool backend for the pair/fused kernels: "row" (vertical by sublane
# shifts + horizontal 3-tap by a banded matmul on the otherwise-idle
# MXU — lane shifts are the pricey half on TPU; DEFAULT, A/B'd
# 2353->2407 f/s on the portrait scale-0 kernel), "shift" (VPU
# separable shifts), "mxu" (both dims as banded matmuls; measured
# slower than row). All exact: the banded matrices are 0/1 tridiagonals,
# so the matmul IS the 3-tap sum in f32.
_POOL = os.environ.get("SNDEPTH_PHOTO_POOL", "row")

# Matmul-pool input dtype: "bf16" feeds the banded pool matmuls bf16
# operands (MXU-native rate; accumulation stays f32 via
# preferred_element_type, so only the operand rounding is lost — images
# live in [0, 1], ~2^-9 relative). Relaxed numerics: parity is judged at
# metric level; A/B loss drift before defaulting (r4 VERDICT lever b).
_POOL_DT = (jnp.bfloat16
            if os.environ.get("SNDEPTH_PHOTO_POOL_DTYPE", "f32") == "bf16"
            else jnp.float32)


def _tridiag(n: int, shift: int = 0):
    """(n + 2*shift, n) 0/1 band: out[i, j] = 1 iff |i - shift - j| <= 1."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n + 2 * shift, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n + 2 * shift, n), 1)
    return (jnp.abs(i - shift - j) <= 1).astype(jnp.float32)


def _make_pool(pbuf, htp, wtp):
    """Returns pool(val) -> 3x3/9 zero-padded average over (htp, wtp)."""
    if _POOL == "shift":
        return lambda v: _pool3(pbuf, v, htp, wtp)
    th = _tridiag(wtp)                       # (wtp, wtp), symmetric
    if _POOL == "row":
        # _POOL_DT applies here only: the single-matmul row pool loses
        # just the operand rounding (f32 accumulate); the two-matmul mxu
        # pool would round the intermediate too, which measurably flips
        # clip boundaries in the DSSIM adjoint (tests).
        thp = _tridiag(wtp, shift=1).astype(_POOL_DT)   # (wtp + 2, wtp)

        def pool(v):
            pbuf[1:htp + 1, 1:wtp + 1] = v
            col = (pbuf[0:htp, :] + pbuf[1:htp + 1, :]
                   + pbuf[2:htp + 2, :])     # (htp, wtp + 2)
            return jax.lax.dot(col.astype(_POOL_DT), thp,
                               preferred_element_type=jnp.float32) / 9.0
        return pool

    tv = _tridiag(htp)                       # (htp, htp)

    def pool(v):
        t = jax.lax.dot(v, th, preferred_element_type=jnp.float32)
        return jax.lax.dot(tv, t, preferred_element_type=jnp.float32) / 9.0
    return pool


def _photo_channel(pool, x, y, mu_x, sigma_x, mask, htp, wtp, alpha,
                   need_grad):
    """DSSIM+L1 error map and (if ``need_grad``) its adjoint w.r.t. the
    warped plane ``y`` for one channel. ``x`` is the comparison plane with
    precomputed pools ``mu_x`` / ``sigma_x``; ``y`` must already be masked.
    ``pool`` is a 3x3/9 zero-padded average (see :func:`_make_pool`).
    Returns (err, dw) with ``dw`` None unless ``need_grad``."""
    mu_y = pool(y)
    sigma_y = pool(y * y) - mu_y * mu_y
    sigma_xy = pool(x * y) - mu_x * mu_y

    t1 = 2.0 * sigma_xy + _C2
    t2 = 2.0 * mu_x * mu_y + _C1
    t3 = sigma_x + sigma_y + _C2
    t4 = mu_x * mu_x + mu_y * mu_y + _C1
    n = t2 * t1
    d = t4 * t3
    s = 0.5 * (1.0 - n / d)
    dssim_map = jnp.clip(s, 0.0, 1.0)
    diff = x - y
    err = (alpha * dssim_map + (1.0 - alpha) * jnp.abs(diff)) * mask
    if not need_grad:
        return err, None

    # DSSIM adjoint w.r.t. y with per-pixel cotangent = mask (pad-column
    # outputs don't exist in the reference loss, so no cotangent may flow
    # back from them into edge pixels).
    lo = (0.5 * ((s > 0.0).astype(jnp.float32)
                 + (s >= 0.0).astype(jnp.float32)))
    hi = (0.5 * ((s < 1.0).astype(jnp.float32)
                 + (s <= 1.0).astype(jnp.float32)))
    gp = mask * lo * hi
    inv_d = 1.0 / d
    a_n = -0.5 * gp * inv_d
    a_d = 0.5 * gp * n * inv_d * inv_d
    c1 = 2.0 * a_n * (t1 - t2)
    c2 = 2.0 * a_d * (t3 - t4)
    pa_y = pool(mu_x * c1 + mu_y * c2)
    pb_xx = pool(a_d * t4)
    pb_xy = pool(2.0 * a_n * t2)
    d_ssim = pa_y + 2.0 * y * pb_xx + x * pb_xy
    d_l1 = -jnp.sign(diff) * mask
    dw = alpha * d_ssim + (1.0 - alpha) * d_l1
    return err, dw


def _kernel(x_ref, y_ref, src_ref, tgt_ref, meta_ref, loss_ref, dx_ref,
            dy_ref, wbuf, txbuf, tybuf, pbuf, *, h, w, ht, wt, nch, mode,
            alpha, need_grad):
    """One grid step = one batch image: warp all tiles into VMEM scratch,
    then the full loss + analytic coordinate gradient on the planes."""
    htp, wtp = x_ref.shape[1], x_ref.shape[2]
    ncol = wtp // _LANE
    ntile = (htp // _SUB) * ncol

    def tile_body(i, _):
        ro = pl.multiple_of((i // ncol) * _SUB, _SUB)
        co = pl.multiple_of((i % ncol) * _LANE, _LANE)
        x = x_ref[0, pl.ds(ro, _SUB), pl.ds(co, _LANE)]
        y = y_ref[0, pl.ds(ro, _SUB), pl.ds(co, _LANE)]
        meta = tuple(meta_ref[0, i, k] for k in range(_NMETA))

        def store(accs, txs, tys):
            for ch in range(nch):
                wbuf[ch, pl.ds(ro, _SUB), pl.ds(co, _LANE)] = accs[ch]
                if need_grad:
                    txbuf[ch, pl.ds(ro, _SUB), pl.ds(co, _LANE)] = txs[ch]
                    tybuf[ch, pl.ds(ro, _SUB), pl.ds(co, _LANE)] = tys[ch]

        _warp_tile(x, y, src_ref, h, w, nch, mode,
                   save_tangents=need_grad, store=store, meta=meta)
        return 0

    jax.lax.fori_loop(0, ntile, tile_body, 0)

    pbuf[:] = jnp.zeros((htp + 2, wtp + 2), jnp.float32)
    pool = _make_pool(pbuf, htp, wtp)

    # In-image mask (pyramid heights are 8-aligned so only columns pad).
    mask = (jax.lax.broadcasted_iota(jnp.int32, (htp, wtp), 1)
            < wt).astype(jnp.float32)
    if ht < htp:
        mask = mask * (jax.lax.broadcasted_iota(jnp.int32, (htp, wtp), 0)
                       < ht).astype(jnp.float32)

    loss_part = jnp.zeros((_SUB, _LANE), jnp.float32)
    if need_grad:
        dx_acc = jnp.zeros((htp, wtp), jnp.float32)
        dy_acc = jnp.zeros((htp, wtp), jnp.float32)

    for ch in range(nch):
        x = tgt_ref[0, ch]                       # zero-padded
        y = wbuf[ch] * mask                      # zero the pad region

        mu_x = pool(x)
        sigma_x = pool(x * x) - mu_x * mu_x
        err, dw = _photo_channel(pool, x, y, mu_x, sigma_x, mask, htp,
                                 wtp, alpha, need_grad)
        loss_part = loss_part + err.reshape(
            htp // _SUB, _SUB, wtp // _LANE, _LANE).sum(axis=(0, 2))
        if need_grad:
            dx_acc = dx_acc + dw * txbuf[ch] * mask
            dy_acc = dy_acc + dw * tybuf[ch] * mask

    loss_ref[0] = loss_part
    if need_grad:
        dx_ref[0] = dx_acc
        dy_ref[0] = dy_acc


def _prep(tgt: Array, src: Array, coords: Array):
    b, h, w, nch = src.shape
    _, ht, wt, _ = tgt.shape
    wp = _round_up(w, _LANE)
    hp = _round_up(h, _SUB)
    wtp = _round_up(wt, _LANE)
    htp = _round_up(ht, _SUB)

    src_p = jnp.transpose(src, (0, 3, 1, 2)).astype(jnp.float32)
    src_p = jnp.pad(src_p, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
    tgt_p = jnp.transpose(tgt, (0, 3, 1, 2)).astype(jnp.float32)
    tgt_p = jnp.pad(tgt_p, ((0, 0), (0, 0), (0, htp - ht), (0, wtp - wt)))
    cf = jnp.pad(coords.astype(jnp.float32),
                 ((0, 0), (0, htp - ht), (0, wtp - wt), (0, 0)),
                 mode="edge")
    return src_p, tgt_p, cf[..., 0], cf[..., 1], (b, h, w, nch, ht, wt,
                                                  htp, wtp)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _run(tgt, src, coords, alpha, mode, need_grad):
    src_p, tgt_p, xs, ys, (b, h, w, nch, ht, wt, htp, wtp) = _prep(
        tgt, src, coords)
    hp, wp = src_p.shape[2], src_p.shape[3]
    grid = (b,)
    ntile = (htp // _SUB) * (wtp // _LANE)
    meta = tile_meta(xs, ys, h, w, mode, hp, wp)
    cspec = pl.BlockSpec((1, htp, wtp), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, ht=ht, wt=wt, nch=nch,
                          mode=mode, alpha=float(alpha),
                          need_grad=need_grad),
        grid=grid,
        in_specs=[cspec, cspec,
                  pl.BlockSpec((1, nch, hp, wp), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, nch, htp, wtp),
                               lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, ntile, _NMETA),
                               lambda bi: (bi, 0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec((1, _SUB, _LANE), lambda bi: (bi, 0, 0),
                                memory_space=pltpu.VMEM),
                   cspec, cspec),
        out_shape=(jax.ShapeDtypeStruct((b, _SUB, _LANE), jnp.float32),
                   jax.ShapeDtypeStruct((b, htp, wtp), jnp.float32),
                   jax.ShapeDtypeStruct((b, htp, wtp), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((nch, htp, wtp), jnp.float32),
                        pltpu.VMEM((nch, htp, wtp), jnp.float32),
                        pltpu.VMEM((nch, htp, wtp), jnp.float32),
                        pltpu.VMEM((htp + 2, wtp + 2), jnp.float32)],
        compiler_params=_VMEM_PARAMS,
        interpret=_interpret(),
    )(xs, ys, src_p, tgt_p, meta)
    loss_part, dxp, dyp = outs
    loss = jnp.sum(loss_part)
    if not need_grad:
        return loss, None
    d_coords = jnp.stack([dxp[:, :ht, :wt], dyp[:, :ht, :wt]],
                         axis=-1).astype(coords.dtype)
    return loss, d_coords


def _pair_kernel(xf_ref, yf_ref, xb_ref, yb_ref, src_ref, tgt_ref,
                 *rest, h, w, nch, ns, mode, alpha, need_grad,
                 weighted=False, plane=False):
    """One grid step = one BATCH image: both loss directions over all
    ``ns`` source views in a single VMEM pass.

    vs. 2*ns independent :func:`_kernel` steps this (a) loads the target
    planes once instead of 2*ns times (fwd comparison plane + bwd warp
    source), (b) computes the target's mu/sigma pools once instead of
    ``ns`` times, (c) needs no XLA-side (B*ns) tiling of the target
    (`flat_tgt_tiled` materialized + transposed two full image stacks per
    scale), and (d) amortizes per-grid-step fixed work (mask iota, pbuf
    border zeroing) over 2*ns comparisons.

    ``weighted`` adds a (1, 2*ns, htp, wtp) per-pixel cotangent-weight
    ref (stage-2's stop-gradient consistency masks with the mean
    normalizations folded in): every err/adjoint term is linear in the
    mask, so the weight simply rides the cotangent mask — the warped
    plane itself stays masked by the pure in-image mask.
    """
    if plane:
        *rest, tbuf, fbbuf = rest
    if weighted:
        (wgt_ref, meta_ref, loss_ref, dxf_ref, dyf_ref, dxb_ref,
         dyb_ref, wbuf, txbuf, tybuf, pbuf, mxbuf, sxbuf) = rest
    else:
        (meta_ref, loss_ref, dxf_ref, dyf_ref, dxb_ref, dyb_ref,
         wbuf, txbuf, tybuf, pbuf, mxbuf, sxbuf) = rest
        wgt_ref = None
    htp, wtp = xf_ref.shape[2], xf_ref.shape[3]
    ht, wt = h, w                       # pair form requires same-size maps
    ncol = wtp // _LANE
    ntile = (htp // _SUB) * ncol

    pbuf[:] = jnp.zeros((htp + 2, wtp + 2), jnp.float32)
    pool = _make_pool(pbuf, htp, wtp)
    mask = (jax.lax.broadcasted_iota(jnp.int32, (htp, wtp), 1)
            < wt).astype(jnp.float32)
    if ht < htp:
        mask = mask * (jax.lax.broadcasted_iota(jnp.int32, (htp, wtp), 0)
                       < ht).astype(jnp.float32)

    # Target pools, shared by all ns forward comparisons.
    for ch in range(nch):
        x = tgt_ref[0, ch]
        mxbuf[ch] = pool(x)
        mu = mxbuf[ch]
        sxbuf[ch] = pool(x * x) - mu * mu

    loss_part = jnp.zeros((_SUB, _LANE), jnp.float32)

    for d in range(2):                  # 0 = fwd (warp src), 1 = bwd
        x_ref = xf_ref if d == 0 else xb_ref
        y_ref = yf_ref if d == 0 else yb_ref
        for si in range(ns):
            mi = d * ns + si

            if plane:
                # Plane-form warp: stage A assembles row tables per tile
                # (sublane gathers, ~free); stage B lane-gathers + blends
                # whole-plane (5x cheaper per op than in the tile loop).
                def tile_bodyA(i, _, si=si, mi=mi, x_ref=x_ref,
                               y_ref=y_ref, dd=d):
                    ro = pl.multiple_of(i * _SUB, _SUB)
                    x = x_ref[0, si, pl.ds(ro, _SUB), :]
                    y = y_ref[0, si, pl.ds(ro, _SUB), :]
                    meta = tuple(meta_ref[0, mi, i, k]
                                 for k in range(_NMETA))

                    def store_slow(accs, txs, tys):
                        for ch in range(nch):
                            wbuf[ch, pl.ds(ro, _SUB), :] = accs[ch]
                            if need_grad:
                                txbuf[ch, pl.ds(ro, _SUB), :] = txs[ch]
                                tybuf[ch, pl.ds(ro, _SUB), :] = tys[ch]
                        fbbuf[pl.ds(ro, _SUB), :] = jnp.ones(
                            (_SUB, wtp), jnp.float32)

                    if dd == 0:
                        _assemble_tile(x, y, src_ref, h, w, nch, mode,
                                       need_grad, meta, (0, si), ro,
                                       tbuf, store_slow)
                    else:
                        _assemble_tile(x, y, tgt_ref, h, w, nch, mode,
                                       need_grad, meta, (0,), ro,
                                       tbuf, store_slow)
                    return 0

                fbbuf[:] = jnp.zeros((htp, wtp), jnp.float32)
                jax.lax.fori_loop(0, ntile, tile_bodyA, 0)
                accs, txs, tys = plane_gather_blend(
                    tbuf, x_ref[0, si], y_ref[0, si], h, w, nch, mode,
                    need_grad)
                fbm = fbbuf[:] > 0.5
                for ch in range(nch):
                    wbuf[ch] = jnp.where(fbm, wbuf[ch], accs[ch])
                    if need_grad:
                        txbuf[ch] = jnp.where(fbm, txbuf[ch], txs[ch])
                        tybuf[ch] = jnp.where(fbm, tybuf[ch], tys[ch])
            else:
                def tile_body(i, _, si=si, mi=mi, x_ref=x_ref,
                              y_ref=y_ref, dd=d):
                    ro = pl.multiple_of((i // ncol) * _SUB, _SUB)
                    co = pl.multiple_of((i % ncol) * _LANE, _LANE)
                    x = x_ref[0, si, pl.ds(ro, _SUB), pl.ds(co, _LANE)]
                    y = y_ref[0, si, pl.ds(ro, _SUB), pl.ds(co, _LANE)]
                    meta = tuple(meta_ref[0, mi, i, k]
                                 for k in range(_NMETA))

                    def store(accs, txs, tys):
                        for ch in range(nch):
                            wbuf[ch, pl.ds(ro, _SUB),
                                 pl.ds(co, _LANE)] = accs[ch]
                            if need_grad:
                                txbuf[ch, pl.ds(ro, _SUB),
                                      pl.ds(co, _LANE)] = txs[ch]
                                tybuf[ch, pl.ds(ro, _SUB),
                                      pl.ds(co, _LANE)] = tys[ch]

                    if dd == 0:
                        _warp_tile(x, y, src_ref, h, w, nch, mode,
                                   save_tangents=need_grad, store=store,
                                   meta=meta, img_at=(0, si))
                    else:
                        _warp_tile(x, y, tgt_ref, h, w, nch, mode,
                                   save_tangents=need_grad, store=store,
                                   meta=meta, img_at=(0,))
                    return 0

                jax.lax.fori_loop(0, ntile, tile_body, 0)

            if need_grad:
                dx_acc = jnp.zeros((htp, wtp), jnp.float32)
                dy_acc = jnp.zeros((htp, wtp), jnp.float32)
            cot_mask = mask if wgt_ref is None else mask * wgt_ref[0, mi]
            for ch in range(nch):
                if d == 0:
                    x = tgt_ref[0, ch]
                    mu_x = mxbuf[ch]
                    sigma_x = sxbuf[ch]
                else:
                    x = src_ref[0, si, ch]
                    mu_x = pool(x)
                    sigma_x = pool(x * x) - mu_x * mu_x
                y = wbuf[ch] * mask
                err, dw = _photo_channel(pool, x, y, mu_x, sigma_x,
                                         cot_mask, htp, wtp, alpha,
                                         need_grad)
                loss_part = loss_part + err.reshape(
                    htp // _SUB, _SUB, wtp // _LANE, _LANE).sum(axis=(0, 2))
                if need_grad:
                    dx_acc = dx_acc + dw * txbuf[ch] * mask
                    dy_acc = dy_acc + dw * tybuf[ch] * mask
            if need_grad:
                if d == 0:
                    dxf_ref[0, si] = dx_acc
                    dyf_ref[0, si] = dy_acc
                else:
                    dxb_ref[0, si] = dx_acc
                    dyb_ref[0, si] = dy_acc

    loss_ref[0] = loss_part


def _pair_prep(img: Array, htp: int, wtp: int) -> Array:
    """NHWC image (leading dims arbitrary) -> zero-padded channel planes."""
    planes = jnp.moveaxis(img, -1, -3).astype(jnp.float32)
    h, w = img.shape[-3], img.shape[-2]
    pad = [(0, 0)] * (planes.ndim - 2) + [(0, htp - h), (0, wtp - w)]
    return jnp.pad(planes, pad)


def _pair_run(tgt, srcs, coords_f, coords_b, alpha, mode, need_grad,
              weights=None, _allow_portrait=True):
    b, ns, ht, wt, nch = srcs.shape

    # Portrait orientation: the kernel is symmetric under (transpose
    # planes, swap the coord channels, swap h/w) — the loss is the same
    # scalar and the grad planes come back transposed with dx/dy swapped.
    # When the image WIDTH is lane-ragged but the HEIGHT is an exact lane
    # multiple (KITTI scale 0: 128x416 -> padded 128x512 landscape, but
    # 416x128 portrait pads NOTHING), transposing removes the 23% padded-
    # lane waste from every plane op AND collapses the x-tap window to a
    # single lane chunk (src height 128 = one chunk), so every warp tile
    # preloads 1 chunk instead of 2-3.
    portrait = _allow_portrait and (
        _PORTRAIT == "1" or
        (_PORTRAIT == "auto" and wt % _LANE != 0
         and ht % _LANE == 0 and wt % _SUB == 0))
    if portrait:
        swap = lambda img: jnp.swapaxes(img, -3, -2)
        loss, d_cf, d_cb = _pair_run(
            swap(tgt), swap(srcs),
            jnp.swapaxes(coords_f[..., ::-1], -3, -2),
            jnp.swapaxes(coords_b[..., ::-1], -3, -2),
            alpha, mode, need_grad,
            None if weights is None else jnp.swapaxes(weights, -2, -1),
            _allow_portrait=False)
        if not need_grad:
            return loss, None, None
        return (loss, jnp.swapaxes(d_cf, -3, -2)[..., ::-1],
                jnp.swapaxes(d_cb, -3, -2)[..., ::-1])

    h, w = ht, wt
    htp = _round_up(ht, _SUB)
    wtp = _round_up(wt, _LANE)
    ntile = (htp // _SUB) * (wtp // _LANE)

    tgt_p = _pair_prep(tgt, htp, wtp)               # (B, C, htp, wtp)
    src_p = _pair_prep(srcs, htp, wtp)              # (B, ns, C, htp, wtp)
    cpad = ((0, 0), (0, 0), (0, htp - ht), (0, wtp - wt), (0, 0))
    cf = jnp.pad(coords_f.astype(jnp.float32), cpad, mode="edge")
    cb = jnp.pad(coords_b.astype(jnp.float32), cpad, mode="edge")
    xs_f, ys_f = cf[..., 0], cf[..., 1]             # (B, ns, htp, wtp)
    xs_b, ys_b = cb[..., 0], cb[..., 1]

    xs_all = jnp.concatenate([xs_f, xs_b], axis=1).reshape(
        b * 2 * ns, htp, wtp)
    ys_all = jnp.concatenate([ys_f, ys_b], axis=1).reshape(
        b * 2 * ns, htp, wtp)
    meta = tile_meta(xs_all, ys_all, h, w, mode, htp, wtp).reshape(
        b, 2 * ns, ntile, _NMETA)

    cspec = pl.BlockSpec((1, ns, htp, wtp), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    gspec = cspec
    inputs = [xs_f, ys_f, xs_b, ys_b, src_p, tgt_p]
    in_specs = [cspec, cspec, cspec, cspec,
                pl.BlockSpec((1, ns, nch, htp, wtp),
                             lambda bi: (bi, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nch, htp, wtp),
                             lambda bi: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    if weights is not None:
        # (B, 2*ns, ht, wt) per-pixel cotangent weights, zero-padded.
        wpad = jnp.pad(weights.astype(jnp.float32),
                       ((0, 0), (0, 0), (0, htp - ht), (0, wtp - wt)))
        inputs.append(wpad)
        in_specs.append(pl.BlockSpec((1, 2 * ns, htp, wtp),
                                     lambda bi: (bi, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
    inputs.append(meta)
    in_specs.append(pl.BlockSpec((1, 2 * ns, ntile, _NMETA),
                                 lambda bi: (bi, 0, 0, 0),
                                 memory_space=pltpu.SMEM))
    plane = (wtp == _LANE) and _PLANE != "0"
    scratch = [pltpu.VMEM((nch, htp, wtp), jnp.float32),
               pltpu.VMEM((nch, htp, wtp), jnp.float32),
               pltpu.VMEM((nch, htp, wtp), jnp.float32),
               pltpu.VMEM((htp + 2, wtp + 2), jnp.float32),
               pltpu.VMEM((nch, htp, wtp), jnp.float32),
               pltpu.VMEM((nch, htp, wtp), jnp.float32)]
    if plane:
        scratch += [pltpu.VMEM((_BK, nch, htp, wtp), jnp.float32),
                    pltpu.VMEM((htp, wtp), jnp.float32)]
    outs = pl.pallas_call(
        functools.partial(_pair_kernel, h=h, w=w, nch=nch, ns=ns,
                          mode=mode, alpha=float(alpha),
                          need_grad=need_grad,
                          weighted=weights is not None, plane=plane),
        grid=(b,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((1, _SUB, _LANE), lambda bi: (bi, 0, 0),
                                memory_space=pltpu.VMEM),
                   gspec, gspec, gspec, gspec),
        out_shape=(jax.ShapeDtypeStruct((b, _SUB, _LANE), jnp.float32),)
        + (jax.ShapeDtypeStruct((b, ns, htp, wtp), jnp.float32),) * 4,
        scratch_shapes=scratch,
        compiler_params=_VMEM_PARAMS,
        interpret=_interpret(),
    )(*inputs)
    loss_part, dxf, dyf, dxb, dyb = outs
    loss = jnp.sum(loss_part)
    if not need_grad:
        return loss, None, None
    d_cf = jnp.stack([dxf[..., :ht, :wt], dyf[..., :ht, :wt]],
                     axis=-1).astype(coords_f.dtype)
    d_cb = jnp.stack([dxb[..., :ht, :wt], dyb[..., :ht, :wt]],
                     axis=-1).astype(coords_b.dtype)
    return loss, d_cf, d_cb


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def warp_photo_pair_loss(tgt: Array, srcs: Array, coords_f: Array,
                         coords_b: Array, alpha: float,
                         mode: str = "edge_zero") -> Array:
    """Both rigid-warp loss directions over all source views in ONE
    fused kernel:

        sum_s [ err(tgt,        warp(srcs[s], coords_f[s]))
              + err(srcs[s],    warp(tgt,     coords_b[s])) ]

    where err = alpha*DSSIM + (1-alpha)*L1 summed over in-image pixels.
    ``tgt`` (B,H,W,C), ``srcs`` (B,ns,H,W,C), coords (B,ns,H,W,2).
    Exactly equals ``warp_photo_loss(tile(tgt), flat(srcs), cf) +
    warp_photo_loss(flat(srcs), tile(tgt), cb)`` with less memory traffic
    (see :func:`_pair_kernel`). Gradients flow to the coords only."""
    return _pair_run(tgt, srcs, coords_f, coords_b, alpha, mode,
                     need_grad=False)[0]


def _pair_fwd(tgt, srcs, coords_f, coords_b, alpha, mode):
    loss, d_cf, d_cb = _pair_run(tgt, srcs, coords_f, coords_b, alpha,
                                 mode, need_grad=True)
    return loss, (d_cf, d_cb, tgt, srcs)


def _pair_bwd(alpha, mode, res, g):
    d_cf, d_cb, tgt, srcs = res
    return (jnp.zeros_like(tgt), jnp.zeros_like(srcs),
            g * d_cf, g * d_cb)


warp_photo_pair_loss.defvjp(_pair_fwd, _pair_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def warp_photo_pair_loss_weighted(tgt: Array, srcs: Array,
                                  coords_f: Array, coords_b: Array,
                                  wf: Array, wb: Array, alpha: float,
                                  mode: str = "edge_zero") -> Array:
    """Per-pixel-weighted :func:`warp_photo_pair_loss`:

        sum_s,p [ wf[s,p] * err(tgt,     warp(srcs[s], cf[s]))[p]
                + wb[s,p] * err(srcs[s], warp(tgt,     cb[s]))[p] ]

    with err summed over channels at each pixel. ``wf``/``wb`` are
    (B, ns, H, W) weight planes — stage-2 GeoNet's stop-gradient
    consistency masks with the mean normalizations folded in
    (`/root/reference/models/baseline.py:1061-1135`). Gradients flow to
    the coords only; the weights are treated as constants (they are
    stop-gradient masks at every call site)."""
    weights = jnp.concatenate([wf, wb], axis=1)
    return _pair_run(tgt, srcs, coords_f, coords_b, alpha, mode,
                     need_grad=False, weights=weights)[0]


def _pair_w_fwd(tgt, srcs, coords_f, coords_b, wf, wb, alpha, mode):
    weights = jnp.concatenate([wf, wb], axis=1)
    loss, d_cf, d_cb = _pair_run(tgt, srcs, coords_f, coords_b, alpha,
                                 mode, need_grad=True, weights=weights)
    return loss, (d_cf, d_cb, tgt, srcs, wf, wb)


def _pair_w_bwd(alpha, mode, res, g):
    d_cf, d_cb, tgt, srcs, wf, wb = res
    return (jnp.zeros_like(tgt), jnp.zeros_like(srcs),
            g * d_cf, g * d_cb, jnp.zeros_like(wf), jnp.zeros_like(wb))


warp_photo_pair_loss_weighted.defvjp(_pair_w_fwd, _pair_w_bwd)


def pair_ok(tgt: Array, ns: int) -> bool:
    """Dispatch gate for the pair kernel (one batch image, both
    directions, all sources resident in VMEM per grid step).
    SNDEPTH_PHOTO_BACKEND: ``pair`` forces it (interpreter on CPU),
    ``fused``/``split`` select the per-call kernel / the split ops."""
    if _BACKEND in ("split", "fused"):
        return False
    if _BACKEND != "pair" and \
            jax.default_backend() not in ("tpu", "axon"):
        return False
    ht, wt, nch = tgt.shape[1], tgt.shape[2], tgt.shape[3]
    if ht % _SUB:
        return False            # pool row-padding not handled (unused)
    wtp = _round_up(wt, _LANE)
    plane = _round_up(ht, _SUB) * wtp * 4
    # coords 4ns + srcs ns*nch + tgt nch + grads 4ns + scratch 5nch
    # (+ _BK*nch row tables + fb mask, allocated only when the plane
    # form is actually enabled), x2 for grid double-buffering of the
    # per-image input blocks.
    resident = plane * (2 * (8 * ns + (ns + 1) * nch) + 5 * nch + 4)
    if wtp == _LANE and _PLANE != "0":
        resident += plane * (_BK * nch + 1)
    return resident <= 48 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def warp_photo_loss(tgt: Array, src: Array, coords: Array,
                    alpha: float, mode: str = "edge_zero") -> Array:
    """sum(alpha*DSSIM(tgt, warp(src, coords)) + (1-alpha)*|tgt - warp|).

    Fused Pallas forward + analytic coordinate gradient. Gradients flow
    to ``coords`` only (tgt/src are treated as data — see module doc)."""
    return _run(tgt, src, coords, alpha, mode, need_grad=False)[0]


def _fwd(tgt, src, coords, alpha, mode):
    loss, d_coords = _run(tgt, src, coords, alpha, mode, need_grad=True)
    return loss, (d_coords, tgt, src)


def _bwd(alpha, mode, res, g):
    d_coords, tgt, src = res
    return (jnp.zeros_like(tgt), jnp.zeros_like(src),
            g * d_coords)


warp_photo_loss.defvjp(_fwd, _bwd)


def fused_ok(tgt: Array) -> bool:
    """Dispatch gate: fused kernel on TPU for plane sizes that fit the
    VMEM budget (SNDEPTH_PHOTO_BACKEND=fused forces it through the
    interpreter on CPU for tests; =split disables)."""
    if _BACKEND == "split":
        return False
    if _BACKEND != "fused" and \
            jax.default_backend() not in ("tpu", "axon"):
        return False
    ht, wt, nch = tgt.shape[1], tgt.shape[2], tgt.shape[3]
    if ht % _SUB:
        return False            # pool row-padding not handled (unused)
    plane = ht * _round_up(wt, _LANE) * 4
    # ~17 resident planes (coords+src+tgt+3 scratch sets+grads) + pbuf.
    if plane * (4 * nch + 5) > 24 * 1024 * 1024:
        return False
    return True
