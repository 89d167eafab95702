"""Pallas TPU bilinear-warp gather kernel.

THE hot op of the whole framework. The GeoNet self-supervised step spends
~83% of its device time (measured from an XProf device trace, see
`utils/xplane.py`) in XLA's row-gather lowering of the bilinear sampler:
each tap is a `f32[N,3]` gather sustaining ~72M rows/s — HBM-latency bound,
one tiny row per index.

Measured on v5e (honest chained protocol, 128x128x416x3, smooth +-4 px
coords): forward 37.6 ms vs 272 ms XLA (7.2x); forward+coord-grad 39.4 ms
vs 271 ms (6.9x — the tangent-saving VJP below makes the backward pass
nearly free). End-to-end GeoNet train step: 2.18 s -> 339 ms/step,
176 -> 1133 frames/sec/chip at batch 128.

This kernel instead keeps the whole source image (as f32 channel planes,
width padded to a lane multiple) resident in VMEM and walks each output
tile's *dynamic* source-row span. Mosaic's ``dynamic_gather`` only gathers
within one vreg (empirically: ``take_along_axis`` compiles for (8,128)
tables on axis 0/1 and nothing larger), so the gather is decomposed as:

    for k in [min(y0) .. max(y1)]:            # dynamic row span
      wk = wy0*(y0==k) + wy1*(y1==k)          # y-tap weight for this row
      for c in [min(x0)//128 .. max(x1)//128]:  # dynamic lane-chunk span
        chunk = plane[k, 128c:128c+128] broadcast to (8,128)
        g0 = take_along_axis(chunk, x0 & 127)   # in-vreg lane gather
        g1 = take_along_axis(chunk, x1 & 127)
        acc += wk * (wx0*g0*[x0 in chunk] + wx1*g1*[x1 in chunk])

Rigid-flow warps are smooth, so the spans are a few rows x a few chunks and
the kernel does ~100x less memory work than the general XLA gather; in the
worst case (arbitrary coords) it degrades to H x W/128 masked vreg ops,
still far cheaper than per-row HBM gathers.

Semantics (two static modes):
* ``mode="edge_zero"`` — the GeoNet reference sampler
  (`/root/reference/utils/utils_edited.py:402-486`): taps at
  clip(floor(x)) / clip(floor(x)+1), weights formed from *clamped* corner
  coordinates so anything outside the image — including exactly the last
  row/column — contributes 0. Matches `ops.warp.bilinear_sampler`.
* ``mode="zero_pad"`` — standard zero-padded sampling (fractional weights +
  per-tap validity masks), matching `ops.warp.bilinear_sampler_zero_pad`
  (the reference's CUDA `corr_index_forward` / `grid_sample` semantics).

Custom VJP: under differentiation the forward kernel also emits tangent
planes from the *same* gathers (Tx = d out/dx = sum_k wk*(g1-g0),
Ty = d out/dy = sum_k sy*(wx0*g0+wx1*g1) — the exact derivative of the XLA
formulation, including its zero gradient through floor/clip), so the
coords-VJP is a pure elementwise contraction ``dx = sum_c g*Tx`` with no
second gather pass. Gradients w.r.t. ``imgs`` use an XLA scatter-add
fallback — in the self-supervised losses the warped arrays are input
images, so that branch is dead code XLA eliminates.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANE = 128
_SUB = 8
_TPS = 8              # (8,128) tiles processed per grid step (amortizes
                      # per-step pipeline overhead; each tile still gets
                      # its own dynamic span so locality is preserved)
_TILE = _LANE * _SUB  # output pixels per tile

# x1 lane gathers via a static roll of the row table: x1i = x0i + 1
# everywhere except the clip-collapsed borders (select) — and the
# mod-128 lane index makes the +1 wrap EXACTLY the chunk-crossing case,
# so take_along(roll(table, -1), r0) == take_along(table, r1) on every
# non-collapsed lane. Halves the dynamic lane gathers per row table.
# "1" on, "0" off; A/B on real TPU before flipping the default.
_X1ROLL = os.environ.get("SNDEPTH_WARP_X1ROLL", "0") == "1"

# Lane-gather packing: the fully-varying take_along_axis lane gathers
# dominate the warp tile (photo_bench r4: stubbing the warp removed 41 of
# the pair kernel's 46.6 ms while stubbing the DSSIM pools removed ~0).
# "pack" fetches CONSECUTIVE ROW TABLES as (bf16,bf16) pairs packed into
# one int32 lane, so one gather serves both row taps — halving the lane
# takes at the cost of bf16-rounding the gathered image values (weights
# and all downstream math stay f32; max value error 2^-8 relative).
# "exact" (default) keeps full-f32 gathers. A/B via bench.py.
_GATHER = os.environ.get("SNDEPTH_WARP_GATHER", "exact")

_MASK_HI = -65536                      # 0xFFFF0000 as int32


def _pack2(a, b):
    """Two f32 planes -> one int32 plane: bf16(a) in the high half,
    bf16(b) in the low half (round-to-nearest-even in integer math —
    Mosaic-safe, no 16-bit dtypes involved)."""
    ia = jax.lax.bitcast_convert_type(a, jnp.int32)
    ib = jax.lax.bitcast_convert_type(b, jnp.int32)

    def rne(u):
        lsb = jax.lax.shift_right_logical(u, 16) & 1
        return (u + 0x7FFF + lsb) & _MASK_HI

    return rne(ia) | jax.lax.shift_right_logical(rne(ib), 16)


def _unpack2(p):
    """Inverse of :func:`_pack2` -> (a_bf16_as_f32, b_bf16_as_f32)."""
    a = jax.lax.bitcast_convert_type(p & _MASK_HI, jnp.float32)
    b = jax.lax.bitcast_convert_type(p << 16, jnp.float32)
    return a, b


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tap_setup(x, y, h, w, mode):
    """Shared tap/index/weight computation (f32 in, f32 weights, i32 idx).

    Returns (x0i, x1i, y0i, y1i, wx0, wx1, wy0, wy1, dmask) where the
    indices are always valid gather indices in-range, the weights already
    include any out-of-bounds masking the mode requires, and ``dmask`` =
    (dvx0, dvx1, dvy0, dvy1) are the weight-derivative magnitudes
    (|d wx0/dx| etc.): all-ones for edge_zero (clip has zero gradient, so
    autodiff sees d(x1s - x)/dx = -1 everywhere); the validity masks for
    zero_pad (the masks are constants w.r.t. coords, so invalid taps
    contribute zero derivative).
    """
    xf = jnp.floor(x)
    yf = jnp.floor(y)
    if mode == "edge_zero":
        # Weights from *clamped* corners: out-of-range (incl. the exact
        # last row/col) weights to zero, as in utils_edited.py:444-447.
        x0 = jnp.clip(xf, 0.0, w - 1.0)
        x1 = jnp.clip(xf + 1.0, 0.0, w - 1.0)
        y0 = jnp.clip(yf, 0.0, h - 1.0)
        y1 = jnp.clip(yf + 1.0, 0.0, h - 1.0)
        wx0 = x1 - x
        wx1 = x - x0
        wy0 = y1 - y
        wy1 = y - y0
        one = jnp.ones_like(x)
        return (x0.astype(jnp.int32), x1.astype(jnp.int32),
                y0.astype(jnp.int32), y1.astype(jnp.int32),
                wx0, wx1, wy0, wy1, (one, one, one, one))
    elif mode == "zero_pad":
        fx = x - xf
        fy = y - yf
        x0u = xf.astype(jnp.int32)
        y0u = yf.astype(jnp.int32)
        x1u = x0u + 1
        y1u = y0u + 1
        vx0 = ((x0u >= 0) & (x0u <= w - 1)).astype(x.dtype)
        vx1 = ((x1u >= 0) & (x1u <= w - 1)).astype(x.dtype)
        vy0 = ((y0u >= 0) & (y0u <= h - 1)).astype(x.dtype)
        vy1 = ((y1u >= 0) & (y1u <= h - 1)).astype(x.dtype)
        return (jnp.clip(x0u, 0, w - 1), jnp.clip(x1u, 0, w - 1),
                jnp.clip(y0u, 0, h - 1), jnp.clip(y1u, 0, h - 1),
                (1.0 - fx) * vx0, fx * vx1, (1.0 - fy) * vy0, fy * vy1,
                (vx0, vx1, vy0, vy1))
    raise ValueError(f"unknown mode {mode!r}")


_CWIN = 2             # fast-path lane-chunk window
_BK = 5               # band-K path: rows {ybar..ybar+_BK-1}, i.e. per-
                      # sublane y-spread <= _BK-2 (real rigid flows have
                      # |fy| ~ 2 px of smooth variation within a 128-lane
                      # row segment, so ~25% of in-training tiles exceed
                      # the 3-row bands' spread<=1 and fell to the ~10x
                      # slow path — measured as the dominant cost of the
                      # scale-0 pair photo kernel, 28.4 ms/step)
_NMETA = 8            # per-tile scalar-metadata fields (see tile_meta)
# tile_meta reduction form: "mono" (default) reduces the raw f32 coords
# with reduce_window and derives the int fields through the monotone tap
# maps; "block" is the original strided reduce over derived index planes
# (kept as the test oracle).
_META_FORM = os.environ.get("SNDEPTH_META_FORM", "mono")


def tile_meta(xs: Array, ys: Array, h: int, w: int, mode: str,
              hp: int, wp: int) -> Array:
    """Per-(8,128)-tile scalar metadata, computed in XLA.

    Inside the kernel, every tile decision (path select, window bases,
    slow-path loop bounds) needs full-tile min/max reductions read into
    scalar registers. Each vector->scalar read stalls the scalar unit on
    the vector pipeline, and the subsequent dynamic loads stall the vector
    unit on the scalar result — measured as the dominant cost of the tile
    loop (64 tiles/image serialize ~6 reductions each). Precomputing the
    same quantities here (one fused elementwise+reduce pass over the coord
    planes) and handing them to the kernel through SMEM breaks the
    dependency chain: the scalar core streams ahead on ready SMEM values.

    Returns int32 (B, n_tiles, _NMETA) with fields
    [path(0=band2|1=band3|2=bandK|3=slow|4=band2-fast), gb, cbase2, cbase3,
     ymin, ymax, cmin, cmax] — exactly the values `_warp_tile` would
    compute. Path 4 is the specialization of band2 for per-sublane
    y-spread 0 tiles whose live rows fit a 2-group (16-row) window: ~90%
    of tiles under bench-like rigid flows, processed with 2 assembled
    rows, a 2-group select and no m0b blend (~25% fewer vector ops); its
    ``gb`` field holds the 16-row window base.
    """
    b, htp, wtp = xs.shape
    nr, nc = htp // _SUB, wtp // _LANE

    if _META_FORM == "block":
        # Original form, kept as the oracle for the parity test: reduce
        # the derived int tap-index planes with combined strided reduces.
        x0i, x1i, y0i, y1i, *_ = _tap_setup(
            xs.astype(jnp.float32), ys.astype(jnp.float32), h, w, mode)

        def t(a):
            return a.reshape(b, nr, _SUB, nc, _LANE)

        y0t, y1t, x0t, x1t = t(y0i), t(y1i), t(x0i), t(x1i)
        ymin = y0t.min(axis=(2, 4))
        ymax = y1t.max(axis=(2, 4))
        cmin = x0t.min(axis=(2, 4)) // _LANE
        cmax = x1t.max(axis=(2, 4)) // _LANE
        ybar = y0t.min(axis=4, keepdims=True)
        spread = (y0t - ybar).max(axis=(2, 4))
        spread0 = spread <= 0
        spread_ok = spread <= 1
        spreadk_ok = spread <= _BK - 2
    else:
        # Monotone form (default): floor/clip/// are monotone, and
        # _tap_setup's indices are the same for both modes, so every field
        # derives from per-tile (and per-row-chunk, for the sublane
        # spread) min/max of the RAW f32 coords — 6 reductions over 2
        # planes instead of 5 strided reduces over 4 derived int planes.
        # Expressed as reshape + axis-reduce, NOT lax.reduce_window: the
        # (1,8,128)-window form made XLA relayout the coord planes to
        # batch-minor (9 ms copies) and lower each window reduce at
        # ~2 GB/s (8.6 ms) — 190 of the stage-2 flow step's 258 ms. The
        # free reshape keeps the natural layout and reduces on-lane.
        xf = xs.astype(jnp.float32)
        yf = ys.astype(jnp.float32)

        def t(a):
            return a.reshape(b, nr, _SUB, nc, _LANE)

        xt, yt = t(xf), t(yf)
        xmin = xt.min(axis=(2, 4))
        xmax = xt.max(axis=(2, 4))
        ymin_f = yt.min(axis=(2, 4))
        ymax_f = yt.max(axis=(2, 4))
        y_rc_min = yt.min(axis=4)
        y_rc_max = yt.max(axis=4)

        def cf(v, hi):
            return jnp.clip(jnp.floor(v), 0.0, hi).astype(jnp.int32)

        cmin = cf(xmin, w - 1.0) // _LANE
        cmax = (jnp.clip(jnp.floor(xmax) + 1.0, 0.0, w - 1.0)
                .astype(jnp.int32) // _LANE)
        ymin = cf(ymin_f, h - 1.0)
        ymax = jnp.clip(jnp.floor(ymax_f) + 1.0, 0.0,
                        h - 1.0).astype(jnp.int32)
        spread = (cf(y_rc_max, h - 1.0) - cf(y_rc_min, h - 1.0)
                  ).reshape(b, nr, _SUB, nc).max(2)
        spread0 = spread <= 0
        spread_ok = spread <= 1
        spreadk_ok = spread <= _BK - 2

    nchunk = wp // _LANE
    cwin = min(_CWIN, nchunk)
    cwin3 = min(3, nchunk)
    ngrp = min(_TGRP, (hp // _SUB))
    win = ngrp * _SUB

    gb = jnp.clip((ymin // _SUB) * _SUB, 0, hp - win)
    row_ok = (ymax - gb) < win
    cbase2 = jnp.clip(cmin, 0, nchunk - cwin)
    band2_ok = spread_ok & row_ok & ((cmax - cbase2) < cwin)
    cbase3 = jnp.clip(cmin, 0, nchunk - cwin3)
    chunk3_ok = (cmax - cbase3) < cwin3
    band3_ok = (spread_ok & row_ok & jnp.logical_not(band2_ok)
                & chunk3_ok)
    bandk_ok = (spreadk_ok & jnp.logical_not(spread_ok) & row_ok
                & chunk3_ok)
    path = jnp.where(band2_ok, 0,
                     jnp.where(band3_ok, 1, jnp.where(bandk_ok, 2, 3)))
    # band2-fast: spread-0 tiles whose live rows fit a 2-group window.
    win2 = min(2, hp // _SUB) * _SUB
    gb2 = jnp.clip((ymin // _SUB) * _SUB, 0, hp - win2)
    fast2 = band2_ok & spread0 & ((ymax - gb2) < win2)
    path = jnp.where(fast2, 4, path)
    gb = jnp.where(fast2, gb2, gb)
    meta = jnp.stack([path, gb, cbase2, cbase3, ymin, ymax, cmin, cmax],
                     axis=-1)
    return meta.reshape(b, nr * nc, _NMETA).astype(jnp.int32)


def _row_chunk_loop(img_ref, nch, x0i, x1i, y0i, y1i, per_row_chunk, init,
                    bounds=None, img_at=(0,)):
    """Drive the dynamic row-span x chunk-span loop (slow/general path).

    ``per_row_chunk(carry, wk_args, gathered)`` gets, per (row, chunk):
    the chunk-membership-masked per-channel taps g0/g1 lists and the
    (y0==k, y1==k) masks, and folds them into the carry. ``bounds``
    optionally supplies precomputed (ymin, ymax, cmin, cmax) scalars
    (see :func:`tile_meta`). ``img_at`` is the leading index prefix
    selecting the (nch, hp, wp) plane stack inside ``img_ref``.
    """
    if bounds is None:
        ymin = jnp.min(y0i)
        ymax = jnp.max(y1i)
        cmin = jnp.min(x0i) // _LANE
        cmax = jnp.max(x1i) // _LANE
    else:
        ymin, ymax, cmin, cmax = bounds
    r0 = x0i % _LANE
    r1 = x1i % _LANE
    q0 = x0i // _LANE
    q1 = x1i // _LANE

    def row_body(k, carry):
        m_y0 = (y0i == k)
        m_y1 = (y1i == k)
        # Mosaic only allows aligned dynamic vector loads and only gathers
        # within one vreg: load the aligned 8-row group containing row k,
        # then broadcast row k%8 across sublanes with a constant-index
        # sublane gather.
        kg = pl.multiple_of((k // _SUB) * _SUB, _SUB)
        kj = jnp.full((_SUB, _LANE), k % _SUB, jnp.int32)

        def chunk_body(c, carry):
            base = pl.multiple_of(c * _LANE, _LANE)
            in0 = (q0 == c).astype(jnp.float32)
            in1 = (q1 == c).astype(jnp.float32)
            g0s, g1s = [], []
            for ch in range(nch):
                block = img_ref[(*img_at, ch, pl.ds(kg, _SUB),
                                 pl.ds(base, _LANE))]
                tab = jnp.take_along_axis(block, kj, axis=0)
                g0s.append(jnp.take_along_axis(tab, r0, axis=1) * in0)
                g1s.append(jnp.take_along_axis(tab, r1, axis=1) * in1)
            return per_row_chunk(carry, m_y0, m_y1, g0s, g1s)

        return jax.lax.fori_loop(cmin, cmax + 1, chunk_body, carry)

    return jax.lax.fori_loop(ymin, ymax + 1, row_body, init)


_TGRP = 3             # aligned 8-row groups backing the direct-path window
                      # (24 rows: a tile spans 8 output rows, group
                      # alignment eats up to 7, leaving ~±8 rows of source
                      # spread before the slow path kicks in)


def _warp_tile(x, y, img_ref, h, w, nch, mode, save_tangents, store,
               meta=None, img_at=(0,)):
    """Compute one (8, 128) output tile of the bilinear warp.

    ``x``/``y`` are the tile's f32 source coordinates, ``img_ref`` a
    VMEM-resident (*img_at, nch, hp, wp) source-plane ref. Calls
    ``store(accs, txs, tys)`` exactly once on whichever runtime path the
    tile selects (txs/tys are zero-filled unless ``save_tangents``).

    The target is a true 2D gather out[s,l] = img[y0[s,l], x0[s,l]] that
    does NOT decompose into a sublane gather followed by a lane gather
    (the lane gather would read the row assembled for a *different*
    pixel). Paths, selected per tile at runtime:

    * ROWBAND (dominant): per output sublane s let ybar[s] = min_l y0[s,l].
      When the per-sublane row spread is <= 1 (every smooth warp,
      including sub-pixel jitter whose floor() straddles integer rows —
      the case that made the earlier t-window sweep 2.6x slower), all
      four taps live on rows {ybar, ybar+1, ybar+2}. Assemble those three
      rows as *lane-uniform* tables (sublane gather with a per-sublane
      index + aligned-group select — exact because the index is constant
      along lanes), lane-gather each at the tap columns, and blend per
      pixel with the delta = y - ybar masks. Runs in a 2- or 3-chunk
      column window: an identity-ish tile's ~130-column tap span covers
      THREE aligned chunks whenever it straddles a chunk boundary
      downward — the typical case under symmetric jitter (previously fell
      to the slow path: 42-77 ms -> ~20 ms per 256x128x416 warp).
    * SLOW fallback: dynamic row/chunk span loop (arbitrary coords).
    """
    hp, wp = img_ref.shape[-2], img_ref.shape[-1]
    cwin = min(_CWIN, wp // _LANE)
    ngrp = min(_TGRP, hp // _SUB)
    win = ngrp * _SUB

    (x0i, x1i, y0i, y1i, wx0, wx1, wy0, wy1,
     (dvx0, dvx1, dvy0, dvy1)) = _tap_setup(x, y, h, w, mode)
    r0 = x0i % _LANE
    r1 = x1i % _LANE
    q0 = x0i // _LANE
    q1 = x1i // _LANE

    nchunk = wp // _LANE
    cwin3 = min(3, nchunk)
    ybar = jnp.min(y0i, axis=1, keepdims=True)      # per-sublane base row
    d0 = y0i - jnp.broadcast_to(ybar, y0i.shape)    # 0/1 under spread_ok
    d1 = y1i - jnp.broadcast_to(ybar, y0i.shape)    # 0/1/2 (clip at h-1)

    if meta is None:
        cminv = jnp.min(q0)
        cmaxv = jnp.max(q1)
        # Window base: align min source row down to an 8-row group. y0i is
        # clipped to [0, h-1] in _tap_setup, so y0rel >= 0 always holds.
        gb = jnp.clip((jnp.min(y0i) // _SUB) * _SUB, 0, hp - win)
        spread = jnp.max(d0)
        spread_ok = spread <= 1
        row_ok = jnp.max(y1i) - gb < win
        cbase2 = jnp.clip(cminv, 0, nchunk - cwin)
        band2_ok = spread_ok & row_ok & (cmaxv - cbase2 < cwin)
        cbase3 = jnp.clip(cminv, 0, nchunk - cwin3)
        chunk3_ok = cmaxv - cbase3 < cwin3
        band3_ok = (spread_ok & row_ok & jnp.logical_not(band2_ok)
                    & chunk3_ok)
        bandk_ok = ((spread <= _BK - 2) & jnp.logical_not(spread_ok)
                    & row_ok & chunk3_ok)
        run_slow = jnp.logical_not(band2_ok | band3_ok | bandk_ok)
        slow_bounds = None
    else:
        # Scalars precomputed in XLA (tile_meta) and read from SMEM: no
        # vector->scalar reductions on the critical path.
        path, gb, cbase2, cbase3, ymin_m, ymax_m, cminv, cmaxv = meta
        band2_ok = path == 0
        band3_ok = path == 1
        bandk_ok = path == 2
        run_slow = path == 3
        slow_bounds = (ymin_m, ymax_m, cminv, cmaxv)

    def _preload(cbase, ncw, ng=None):
        blocks = {}
        chunk_w = []
        for ci in range(ncw):
            c = cbase + ci
            base = pl.multiple_of(c * _LANE, _LANE)
            in0 = (q0 == c).astype(jnp.float32)
            in1 = (q1 == c).astype(jnp.float32)
            chunk_w.append((wx0 * in0, wx1 * in1,
                            dvx0 * in0, dvx1 * in1))
            for g in range(ngrp if ng is None else ng):
                row0 = pl.multiple_of(gb + g * _SUB, _SUB)
                for ch in range(nch):
                    blocks[ci, g, ch] = img_ref[
                        (*img_at, ch, pl.ds(row0, _SUB),
                         pl.ds(base, _LANE))]
        return blocks, chunk_w

    zero = jnp.zeros((_SUB, _LANE), jnp.float32)
    collapse = x1i == x0i                 # clip-collapsed border taps

    def _g1(table, g0):
        """Lane-gather ``table`` at r1 — via the x1 roll trick when on."""
        if not _X1ROLL:
            return jnp.take_along_axis(table, r1, axis=1)
        rolled = jnp.roll(table, -1, axis=1)
        return jnp.where(collapse, g0,
                         jnp.take_along_axis(rolled, r0, axis=1))

    def _taps(tables):
        """[(T[r0], T[r1])] per row table. ``pack`` gather mode fetches
        pairs of tables through one packed-bf16 int32 gather per tap
        (module doc at :data:`_GATHER`), halving the lane takes."""
        if _GATHER != "pack":
            out = []
            for T in tables:
                t0 = jnp.take_along_axis(T, r0, axis=1)
                out.append((t0, _g1(T, t0)))
            return out
        out = [None] * len(tables)
        for i in range(0, len(tables) - 1, 2):
            P = _pack2(tables[i], tables[i + 1])
            a0, b0 = _unpack2(jnp.take_along_axis(P, r0, axis=1))
            a1, b1 = _unpack2(jnp.take_along_axis(P, r1, axis=1))
            out[i] = (a0, a1)
            out[i + 1] = (b0, b1)
        if len(tables) % 2:
            T = tables[-1]
            out[-1] = (jnp.take_along_axis(T, r0, axis=1),
                       jnp.take_along_axis(T, r1, axis=1))
        return out

    def _band_path(cbase, ncw):
        blocks, chunk_w = _preload(cbase, ncw)
        # Lane-uniform sublane-gather indices for rows ybar+k (k=0,1,2).
        # Row ybar+2 can sit one past the window for sublanes none of
        # whose pixels select it (d1 == 2 implies that row is in-window
        # via row_ok); the masked select discards the garbage lanes.
        rels = [jnp.broadcast_to(ybar + k - gb, y0i.shape)
                for k in range(3)]
        subs = [rel % _SUB for rel in rels]
        gsels = [rel // _SUB for rel in rels]
        m0b = (d0 == 1).astype(jnp.float32)     # y0 tap on row ybar+1
        m1b = (d1 == 1).astype(jnp.float32)
        m1c = (d1 == 2).astype(jnp.float32)
        accs = [zero] * nch
        txs = [zero] * nch
        tys = [zero] * nch
        for ci in range(ncw):
            wx0c, wx1c, dv0c, dv1c = chunk_w[ci]
            for ch in range(nch):
                rows = []
                for k in range(3):
                    u = jnp.take_along_axis(blocks[ci, 0, ch], subs[k],
                                            axis=0)
                    for g in range(1, ngrp):
                        u = jnp.where(
                            gsels[k] == g,
                            jnp.take_along_axis(blocks[ci, g, ch],
                                                subs[k], axis=0), u)
                    rows.append(u)
                (a0, a1), (b0, b1), (c0, c1) = _taps(rows)
                g00 = a0 + m0b * (b0 - a0)
                g01 = a1 + m0b * (b1 - a1)
                g10 = a0 + m1b * (b0 - a0) + m1c * (c0 - a0)
                g11 = a1 + m1b * (b1 - a1) + m1c * (c1 - a1)
                row0 = wx0c * g00 + wx1c * g01
                row1 = wx0c * g10 + wx1c * g11
                accs[ch] = accs[ch] + wy0 * row0 + wy1 * row1
                if save_tangents:
                    txs[ch] = (txs[ch]
                               + wy0 * (dv1c * g01 - dv0c * g00)
                               + wy1 * (dv1c * g11 - dv0c * g10))
                    tys[ch] = tys[ch] + dvy1 * row1 - dvy0 * row0
        store(accs, txs, tys)

    def _band_fast_path(cbase, ncw):
        """band2 specialized for per-sublane y-spread 0 + 2-group window
        (~90% of tiles under bench-like rigid flows; see tile_meta path 4).
        With spread 0, d0 == 0 on every lane (no m0b blend: the y0 tap IS
        row ybar) and d1 in {0, 1} (1 except where the h-1 clip collapsed
        the pair), so only rows {ybar, ybar+1} are assembled, from a
        16-row window whose live rows the path gate guarantees in-bounds
        (garbage lanes of the ybar+1 table are discarded by the d1 mask).
        """
        ngrp2 = min(2, hp // _SUB)
        blocks, chunk_w = _preload(cbase, ncw, ngrp2)
        rels = [jnp.broadcast_to(ybar + k - gb, y0i.shape)
                for k in range(2)]
        subs = [rel % _SUB for rel in rels]
        gsels = [rel // _SUB for rel in rels]
        m1b = (d1 == 1).astype(jnp.float32)
        accs = [zero] * nch
        txs = [zero] * nch
        tys = [zero] * nch
        for ci in range(ncw):
            wx0c, wx1c, dv0c, dv1c = chunk_w[ci]
            for ch in range(nch):
                rows = []
                for k in range(2):
                    u = jnp.take_along_axis(blocks[ci, 0, ch], subs[k],
                                            axis=0)
                    for g in range(1, ngrp2):
                        u = jnp.where(
                            gsels[k] == g,
                            jnp.take_along_axis(blocks[ci, g, ch],
                                                subs[k], axis=0), u)
                    rows.append(u)
                (a0, a1), (b0, b1) = _taps(rows)
                g10 = a0 + m1b * (b0 - a0)
                g11 = a1 + m1b * (b1 - a1)
                row0 = wx0c * a0 + wx1c * a1
                row1 = wx0c * g10 + wx1c * g11
                accs[ch] = accs[ch] + wy0 * row0 + wy1 * row1
                if save_tangents:
                    txs[ch] = (txs[ch]
                               + wy0 * (dv1c * a1 - dv0c * a0)
                               + wy1 * (dv1c * g11 - dv0c * g10))
                    tys[ch] = tys[ch] + dvy1 * row1 - dvy0 * row0
        store(accs, txs, tys)

    def _bandk_path(cbase, ncw):
        """Generalized row-band path: rows {ybar..ybar+_BK-1}, covering
        per-sublane y-spread <= _BK-2 (the 3-row bands handle spread<=1
        only; in-training rigid flows put ~25% of tiles at spread 2-3,
        which otherwise fall to the ~10x slow path). Exact one-hot row
        masks reproduce the reference blend tree:
        acc = sum_k [wy0*(d0==k) + wy1*(d1==k)] * (wx0*Tk[r0]+wx1*Tk[r1]).
        """
        blocks, chunk_w = _preload(cbase, ncw)
        rels = [jnp.broadcast_to(ybar + k - gb, y0i.shape)
                for k in range(_BK)]
        subs = [rel % _SUB for rel in rels]
        gsels = [rel // _SUB for rel in rels]
        # Per-row combined y-weights, computed once per tile and shared
        # across chunks and channels (d0 <= _BK-2 and d1 <= _BK-1 under
        # the bandk gate, so the masks are exactly one-hot over k).
        wk = [wy0 * (d0 == k).astype(jnp.float32)
              + wy1 * (d1 == k).astype(jnp.float32) for k in range(_BK)]
        if save_tangents:
            sk = [dvy1 * (d1 == k).astype(jnp.float32)
                  - dvy0 * (d0 == k).astype(jnp.float32)
                  for k in range(_BK)]
        accs = [zero] * nch
        txs = [zero] * nch
        tys = [zero] * nch
        for ci in range(ncw):
            wx0c, wx1c, dv0c, dv1c = chunk_w[ci]
            for ch in range(nch):
                us = []
                for k in range(_BK):
                    u = jnp.take_along_axis(blocks[ci, 0, ch], subs[k],
                                            axis=0)
                    for g in range(1, ngrp):
                        u = jnp.where(
                            gsels[k] == g,
                            jnp.take_along_axis(blocks[ci, g, ch],
                                                subs[k], axis=0), u)
                    us.append(u)
                for k, (t0g, t1g) in enumerate(_taps(us)):
                    a_k = wx0c * t0g + wx1c * t1g
                    accs[ch] = accs[ch] + wk[k] * a_k
                    if save_tangents:
                        txs[ch] = txs[ch] + wk[k] * (dv1c * t1g
                                                     - dv0c * t0g)
                        tys[ch] = tys[ch] + sk[k] * a_k
        store(accs, txs, tys)

    if meta is not None:
        @pl.when(path == 4)
        def _band2_fast():
            _band_fast_path(cbase2, cwin)

    @pl.when(band2_ok)
    def _band2():
        _band_path(cbase2, cwin)

    if cwin3 > cwin:
        @pl.when(band3_ok)
        def _band3():
            _band_path(cbase3, cwin3)

    @pl.when(bandk_ok)
    def _bandk():
        _bandk_path(cbase3, cwin3)

    @pl.when(run_slow)
    def _slow_path():
        def fold(carry, m_y0, m_y1, g0s, g1s):
            accs, txs, tys = carry
            wk = wy0 * m_y0 + wy1 * m_y1
            accs = tuple(acc + wk * (wx0 * g0 + wx1 * g1)
                         for acc, g0, g1 in zip(accs, g0s, g1s))
            if save_tangents:
                sy = (m_y1.astype(jnp.float32) * dvy1
                      - m_y0.astype(jnp.float32) * dvy0)
                txs = tuple(tx + wk * (dvx1 * g1 - dvx0 * g0)
                            for tx, g0, g1 in zip(txs, g0s, g1s))
                tys = tuple(ty + sy * (wx0 * g0 + wx1 * g1)
                            for ty, g0, g1 in zip(tys, g0s, g1s))
            return accs, txs, tys

        zeros = tuple(jnp.zeros((_SUB, _LANE), jnp.float32)
                      for _ in range(nch))
        accs, txs, tys = _row_chunk_loop(
            img_ref, nch, x0i, x1i, y0i, y1i, fold,
            (zeros, zeros, zeros), bounds=slow_bounds, img_at=img_at)
        store(list(accs), list(txs), list(tys))


def _assemble_tile(x, y, img_ref, h, w, nch, mode, save_tangents, meta,
                   img_at, ro, tref, store_slow):
    """Stage A of the plane-form warp (single-lane-chunk planes only):
    assemble this (8, 128) tile's per-sublane row tables
    ``T_k[s, c] = img[ybar[s] + k, c]`` into ``tref`` (a
    (_BK, nch, htp, _LANE) scratch), with the k-range chosen by the
    tile's meta path (2 / 3 / _BK rows). Slow-path tiles instead compute
    the warp directly and hand (accs, txs, tys) to ``store_slow`` (which
    also flags the rows as fallback for the whole-plane stage B).

    Rationale (r4 probes): per-tile LANE gathers carry ~5x per-op
    overhead vs whole-plane ones (0.91 vs 0.18 ms for identical volume),
    while per-tile SUBLANE gathers are ~free — so assembly stays here and
    the lane gathers + blends move to the whole-plane stage
    (`photo_loss._pair_kernel` plane path).
    """
    (x0i, x1i, y0i, y1i, wx0, wx1, wy0, wy1,
     (dvx0, dvx1, dvy0, dvy1)) = _tap_setup(x, y, h, w, mode)
    ybar = jnp.min(y0i, axis=1, keepdims=True)
    path, gb, cbase2, cbase3, ymin_m, ymax_m, cminv, cmaxv = meta

    def asm(K, ng):
        blocks = {}
        for g in range(ng):
            row0 = pl.multiple_of(gb + g * _SUB, _SUB)
            for ch in range(nch):
                blocks[g, ch] = img_ref[
                    (*img_at, ch, pl.ds(row0, _SUB), pl.ds(0, _LANE))]
        for k in range(K):
            rel = jnp.broadcast_to(ybar + k - gb, y0i.shape)
            sub = rel % _SUB
            gsel = rel // _SUB
            for ch in range(nch):
                u = jnp.take_along_axis(blocks[0, ch], sub, axis=0)
                for g in range(1, ng):
                    u = jnp.where(gsel == g,
                                  jnp.take_along_axis(blocks[g, ch], sub,
                                                      axis=0), u)
                tref[k, ch, pl.ds(ro, _SUB), :] = u

    hp = img_ref.shape[-2]
    ngrp2 = min(2, hp // _SUB)
    ngrp3 = min(_TGRP, hp // _SUB)

    @pl.when(path == 4)
    def _fast():
        asm(2, ngrp2)

    @pl.when((path == 0) | (path == 1))
    def _band():
        asm(3, ngrp3)

    @pl.when(path == 2)
    def _bandk():
        asm(_BK, ngrp3)

    @pl.when(path == 3)
    def _slow():
        def fold(carry, m_y0, m_y1, g0s, g1s):
            accs, txs, tys = carry
            wk = wy0 * m_y0 + wy1 * m_y1
            accs = tuple(acc + wk * (wx0 * g0 + wx1 * g1)
                         for acc, g0, g1 in zip(accs, g0s, g1s))
            if save_tangents:
                sy = (m_y1.astype(jnp.float32) * dvy1
                      - m_y0.astype(jnp.float32) * dvy0)
                txs = tuple(tx + wk * (dvx1 * g1 - dvx0 * g0)
                            for tx, g0, g1 in zip(txs, g0s, g1s))
                tys = tuple(ty + sy * (wx0 * g0 + wx1 * g1)
                            for ty, g0, g1 in zip(tys, g0s, g1s))
            return accs, txs, tys

        zeros = tuple(jnp.zeros((_SUB, _LANE), jnp.float32)
                      for _ in range(nch))
        accs, txs, tys = _row_chunk_loop(
            img_ref, nch, x0i, x1i, y0i, y1i, fold,
            (zeros, zeros, zeros),
            bounds=(ymin_m, ymax_m, cminv, cmaxv), img_at=img_at)
        store_slow(list(accs), list(txs), list(tys))


def plane_gather_blend(tref, x, y, h, w, nch, mode, need_grad):
    """Stage B of the plane-form warp: whole-plane lane gathers of the
    stage-A row tables + the bilinear/tangent blends, with one-hot row
    masks exactly reproducing the band paths (`_bandk_path` algebra).
    Rows flagged in ``fb`` keep whatever the slow path stored (the caller
    merges). Returns (accs, txs, tys) whole-plane per channel."""
    (x0i, x1i, y0i, y1i, wx0, wx1, wy0, wy1,
     (dvx0, dvx1, dvy0, dvy1)) = _tap_setup(x, y, h, w, mode)
    ybar = jnp.min(y0i, axis=1, keepdims=True)
    d0 = y0i - jnp.broadcast_to(ybar, y0i.shape)
    d1 = y1i - jnp.broadcast_to(ybar, y0i.shape)
    shape = x.shape
    accs, txs, tys = [], [], []
    for ch in range(nch):
        acc = jnp.zeros(shape, jnp.float32)
        tx = jnp.zeros(shape, jnp.float32)
        ty = jnp.zeros(shape, jnp.float32)
        for k in range(_BK):
            t0 = jnp.take_along_axis(tref[k, ch], x0i, axis=1)
            t1 = jnp.take_along_axis(tref[k, ch], x1i, axis=1)
            m0 = d0 == k
            m1 = d1 == k
            either = m0 | m1
            # where-guards: unassembled k-tables hold garbage on rows a
            # shorter path covered — selects (not multiplies) discard it.
            wk = jnp.where(m0, wy0, 0.0) + jnp.where(m1, wy1, 0.0)
            a_k = wx0 * t0 + wx1 * t1
            acc = acc + jnp.where(either, wk * a_k, 0.0)
            if need_grad:
                tx = tx + jnp.where(either,
                                    wk * (dvx1 * t1 - dvx0 * t0), 0.0)
                sk = (jnp.where(m1, dvy1, 0.0)
                      - jnp.where(m0, dvy0, 0.0))
                ty = ty + jnp.where(either, sk * a_k, 0.0)
        accs.append(acc)
        txs.append(tx)
        tys.append(ty)
    return accs, txs, tys


def _fwd_kernel(x_ref, y_ref, img_ref, meta_ref, out_ref, *refs, h, w,
                nch, mode, save_tangents):
    """Forward warp over _TPS stacked tiles; with ``save_tangents`` also
    emits the coordinate tangent planes from the *same* gathers (the
    gathers dominate, the extra fmas are ~free):
      Tx_ch = d out_ch/dx = wy0*(dvx1*I[y0,x1] - dvx0*I[y0,x0]) + wy1*(..)
      Ty_ch = d out_ch/dy = dvy1*(x-blend at y1) - dvy0*(x-blend at y0)
    which makes the VJP a pure-XLA elementwise contraction with the output
    cotangent — no second gather pass. See :func:`_warp_tile`.
    """
    tx_ref, ty_ref = refs if save_tangents else (None, None)

    # Dynamic loop over the _TPS stacked tiles: one Mosaic tile body
    # instead of _TPS unrolled copies (the tile body is ~hundreds of
    # vector ops, so the scalar loop overhead is noise while compile
    # time and code size drop ~8x).
    def tile_body(t, _):
        ro = pl.multiple_of(t * _SUB, _SUB)
        sl = pl.ds(ro, _SUB)
        x = x_ref[0, sl].astype(jnp.float32)
        y = y_ref[0, sl].astype(jnp.float32)
        meta = tuple(meta_ref[0, 0, t, k] for k in range(_NMETA))

        def store(accs, txs, tys):
            for ch in range(nch):
                out_ref[0, ch, sl] = accs[ch]
                if save_tangents:
                    tx_ref[0, ch, sl] = txs[ch]
                    ty_ref[0, ch, sl] = tys[ch]

        _warp_tile(x, y, img_ref, h, w, nch, mode, save_tangents, store,
                   meta=meta)
        return 0

    jax.lax.fori_loop(0, _TPS, tile_body, 0)


def _prep(imgs: Array, coords: Array):
    """(B,H,W,C) imgs + (B,Ht,Wt,2) coords -> kernel operands + meta.

    Coords stay in natural (B, Ht, Wt) plane layout: the kernel's 2D grid
    (batch, 8-row band, lane chunk) tiles them directly via BlockSpec
    index maps, so tiles see the same spatially-local 8x128 blocks the old
    explicit `_block` relayout produced — without materializing the
    blocked copies of coords and all output planes in XLA."""
    b, h, w, nch = imgs.shape
    _, ht, wt, _ = coords.shape
    wp = _round_up(w, _LANE)
    hp = _round_up(h, _SUB)   # aligned 8-row group loads in the kernel
    wtp = _round_up(wt, _LANE)
    htp = _round_up(ht, _SUB * _TPS)   # whole vertical bands per grid step

    planes = jnp.transpose(imgs, (0, 3, 1, 2)).astype(jnp.float32)
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))

    # Edge-pad (not zero-pad) so padding lanes don't widen a tile's
    # dynamic row/chunk span toward the origin.
    cf = jnp.pad(coords.astype(jnp.float32),
                 ((0, 0), (0, htp - ht), (0, wtp - wt), (0, 0)),
                 mode="edge")
    return planes, cf[..., 0], cf[..., 1], (b, h, w, nch, ht, wt, htp, wtp)


def _coord_spec():
    return pl.BlockSpec((1, _SUB * _TPS, _LANE),
                        lambda bi, hb, wb: (bi, hb, wb),
                        memory_space=pltpu.VMEM)


def _img_spec(nch, h, wp):
    return pl.BlockSpec((1, nch, h, wp), lambda bi, hb, wb: (bi, 0, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bilinear_sampler(imgs: Array, coords: Array,
                     mode: str = "edge_zero") -> Array:
    """Pallas drop-in for :func:`sndepth_tpu.ops.warp.bilinear_sampler`
    (``mode="edge_zero"``) / ``bilinear_sampler_zero_pad``
    (``mode="zero_pad"``). imgs (B,H,W,C), coords (B,Ht,Wt,2) -> f32
    (B,Ht,Wt,C)."""
    return _forward(imgs, coords, mode)[0]


def _interpret() -> bool:
    # Tests run the kernel on CPU through the Pallas interpreter.
    return jax.default_backend() not in ("tpu", "axon")


def _to_nhwc(planes_out, b, nch, ht, wt, htp, wtp):
    """Kernel output (B, nch, Htp, Wtp) -> (B, Ht, Wt, nch)."""
    a = planes_out[:, :, :ht, :wt]
    return jnp.transpose(a, (0, 2, 3, 1))


def _forward(imgs, coords, mode, save_tangents=False):
    planes, xs, ys, (b, h, w, nch, ht, wt, htp, wtp) = _prep(imgs, coords)
    hp, wp = planes.shape[2], planes.shape[3]
    grid = (b, htp // (_SUB * _TPS), wtp // _LANE)
    ncol = wtp // _LANE
    # Meta is laid out (b, ncol, rows, NMETA) so the SMEM block's last two
    # dims are (_TPS, _NMETA) = (8, 8): Mosaic requires the last two block
    # dims to be (8,128)-divisible or equal to the array dims — a
    # (1, _TPS, 1, _NMETA) block over (b, rows, ncol, NMETA) fails to
    # lower whenever ncol > 1 (the dim-(-2) block of 1 is neither).
    meta = tile_meta(xs, ys, h, w, mode, hp, wp).reshape(
        b, htp // _SUB, ncol, _NMETA).transpose(0, 2, 1, 3)
    meta_spec = pl.BlockSpec((1, 1, _TPS, _NMETA),
                             lambda bi, hb, wb: (bi, wb, hb, 0),
                             memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, nch, _SUB * _TPS, _LANE),
                            lambda bi, hb, wb: (bi, 0, hb, wb),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, nch, htp, wtp), jnp.float32)
    n_out = 3 if save_tangents else 1
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=w, nch=nch, mode=mode,
                          save_tangents=save_tangents),
        grid=grid,
        in_specs=[_coord_spec(), _coord_spec(), _img_spec(nch, hp, wp),
                  meta_spec],
        out_specs=(out_spec,) * n_out,
        out_shape=(out_shape,) * n_out,
        interpret=_interpret(),
    )(xs, ys, planes, meta)
    return tuple(_to_nhwc(o, b, nch, ht, wt, htp, wtp) for o in outs)


def _forward_fwd(imgs, coords, mode):
    # The tangent planes come from the same gathers as the output (the
    # gathers dominate; the extra fmas/stores are cheap), which makes the
    # coords-VJP a pure elementwise contraction -- no second gather pass.
    out, tx, ty = _forward(imgs, coords, mode, save_tangents=True)
    return out, (imgs, coords, tx, ty)


def _forward_bwd(mode, res, g):
    imgs, coords, tx, ty = res
    gf = g.astype(jnp.float32)
    dx = jnp.sum(gf * tx, axis=-1)
    dy = jnp.sum(gf * ty, axis=-1)
    d_coords = jnp.stack([dx, dy], axis=-1).astype(coords.dtype)
    d_imgs = _scatter_d_imgs(imgs, coords, g, mode)
    return d_imgs, d_coords


def _scatter_d_imgs(imgs, coords, g, mode):
    """Image gradient of the warp: bilinear *splat* of the cotangent.

    Dead-code-eliminated when the warped array is an input image rather
    than a differentiated tensor. When live (warp-of-flow in the GeoNet
    stage-2 losses, warped features in training), XLA's scatter-add
    serializes at ~16M rows/s and dominated the stage-2 step — the Pallas
    splat kernel below replaces it where the shape gate allows."""
    b, h, w, nch = imgs.shape
    if _splat_ok(h, w, nch, coords):
        return _splat(coords, g, h, w, mode).astype(imgs.dtype)
    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)
    x0i, x1i, y0i, y1i, wx0, wx1, wy0, wy1, _ = _tap_setup(
        x, y, h, w, mode)
    gf = g.astype(jnp.float32)
    out = jnp.zeros((b, h, w, nch), jnp.float32)
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None, None]
    for yi, wyv in ((y0i, wy0), (y1i, wy1)):
        for xi, wxv in ((x0i, wx0), (x1i, wx1)):
            out = out.at[bidx, yi, xi].add((wyv * wxv)[..., None] * gf)
    return out.astype(imgs.dtype)


# The splat replaces the XLA scatter-add when the shape fits; forceable
# for tests/debug via SNDEPTH_WARP_SPLAT=xla|pallas.
_SPLAT = os.environ.get("SNDEPTH_WARP_SPLAT", "auto")

_SNMETA = 16          # per-tile scalar-metadata fields for the splat
                      # (see splat_meta; padded to 16 for the SMEM block)


def _splat_ok(h, w, nch, coords) -> bool:
    if _SPLAT == "xla":
        return False
    plane_bytes = _round_up(h, _SUB) * _round_up(w, _LANE) * nch * 4
    if plane_bytes > 6 * 1024 * 1024:
        return False
    if _SPLAT == "pallas":
        return True
    return coords.shape[1] * coords.shape[2] >= 512


def _splat_eff_taps(x, y, h, w, mode, col_id, row_id, hp, wp):
    """Tap indices/weights with *dead* taps remapped to identity position.

    A tap contributes nothing when its weight is zero (``zero_pad``
    validity masks) or when clipping collapsed the x0/x1 (y0/y1) pair onto
    the same pixel (``edge_zero``: the pair's weights sum to x1-x0 = 0, so
    it cancels regardless of where the pair lands — as long as both taps
    land on the SAME pixel). Dead taps are therefore free to be placed
    anywhere — but their *clipped* indices collapse onto image borders,
    which wrecks the splat kernel's per-tile span statistics: a border
    tile whose flow points outside the image gets s = 0 - lane spanning
    the whole tile (slow path), and the half-padded last lane chunk of a
    416-wide image gets a ~98-wide s span (a "fast" tile doing 50x the
    loop iterations — measured 64 ms for a (64,128,416,3) splat that
    should cost ~5 ms). Remapping dead taps to the pixel's own (col, row)
    keeps every span identity-tight.

    ``col_id``/``row_id`` are the pixel's global output-plane position,
    pre-clipped here to the padded plane so placements stay in-bounds.
    """
    x0i, x1i, y0i, y1i, wx0, wx1, wy0, wy1, dm = _tap_setup(
        x, y, h, w, mode)
    cid = jnp.minimum(col_id, wp - 1)
    rid = jnp.minimum(row_id, hp - 1)
    if mode == "edge_zero":
        dx = x0i == x1i
        dy = y0i == y1i
        x0i = jnp.where(dx, cid, x0i)
        x1i = jnp.where(dx, cid, x1i)
        y0i = jnp.where(dy, rid, y0i)
        y1i = jnp.where(dy, rid, y1i)
    else:
        vx0, vx1, vy0, vy1 = dm
        x0i = jnp.where(vx0 == 0, cid, x0i)
        x1i = jnp.where(vx1 == 0, cid, x1i)
        y0i = jnp.where(vy0 == 0, rid, y0i)
        y1i = jnp.where(vy1 == 0, rid, y1i)
    return x0i, x1i, y0i, y1i, wx0, wx1, wy0, wy1


def splat_meta(xs: Array, ys: Array, h: int, w: int, mode: str,
               hp: int, wp: int) -> Array:
    """Per-(8,128)-tile scalar metadata for the splat kernel, in XLA.

    Same rationale as :func:`tile_meta`: every in-kernel vector->scalar
    reduction stalls the scalar unit on the vector pipeline and the
    data-dependent loop bounds stall the vector unit back on the scalar
    result — measured (round 2) at ~50 us/tile, 75x the fast path's
    vector-op cost, which made the stage-2 flow step splat-bound
    (212 ms for one (64,128,416,2) splat). Precomputing the ~10 scalars
    per tile here and reading them from SMEM removes every reduction
    from the kernel.

    Returns int32 (B, n_tiles, _SNMETA) with fields
    [path(0=fast|1=slow), ybase, cbase, smin, smax, tmin, tmax,
     ymin, ymax, cmin, cmax, narrow, 0...]:

    * s = tap_column - lane: the dynamic lane-roll shifts; the fast loop
      runs s in [smin, smax].
    * ty = tap_row - ybase - sublane: the dynamic sublane-roll shifts
      relative to the 24-row accumulator window at ``ybase``.
    * cbase: base of the 3-aligned-chunk column window. THREE chunks, not
      two — an identity-ish tile's ~130-column tap span straddles three
      aligned chunks whenever it crosses a boundary downward (the same
      lesson as the forward kernel's band3 path); with a 2-chunk window
      most real tiles fell to the slow path.
    * ymin/ymax/cmin/cmax: slow-path loop bounds; ``narrow`` selects the
      bounded [smin, smax] shift loop there (full 128-residue sweep
      otherwise).
    """
    b, htp, wtp = xs.shape
    nr, nc = htp // _SUB, wtp // _LANE
    nchunk = wp // _LANE
    kwin = min(_round_up(24, _SUB), hp)
    cwin3 = min(3, nchunk)

    col_id = jnp.arange(wtp, dtype=jnp.int32)[None, None, :]
    row_id = jnp.arange(htp, dtype=jnp.int32)[None, :, None]
    x0i, x1i, y0i, y1i, *_ = _splat_eff_taps(
        xs.astype(jnp.float32), ys.astype(jnp.float32), h, w, mode,
        col_id, row_id, hp, wp)
    lane = col_id % _LANE
    subl = row_id % _SUB

    def t(a):
        return a.reshape(b, nr, _SUB, nc, _LANE)

    red = (2, 4)
    # Min/max over BOTH taps of each pair: the dead-tap remap can break
    # the y0<=y1 / x0<=x1 ordering (an invalid y0 remapped to the pixel's
    # own row may exceed a valid y1), so single-tap bounds would exclude
    # live taps from the kernel's loop ranges.
    smin = jnp.minimum(t(x0i - lane).min(red), t(x1i - lane).min(red))
    smax = jnp.maximum(t(x0i - lane).max(red), t(x1i - lane).max(red))
    ymin = jnp.minimum(t(y0i).min(red), t(y1i).min(red))
    ymax = jnp.maximum(t(y0i).max(red), t(y1i).max(red))
    cmin = jnp.minimum(t(x0i).min(red), t(x1i).min(red)) // _LANE
    cmax = jnp.maximum(t(x0i).max(red), t(x1i).max(red)) // _LANE
    ybase = jnp.clip((ymin // _SUB) * _SUB, 0, hp - kwin)
    tmin = jnp.minimum(t(y0i - subl).min(red),
                       t(y1i - subl).min(red)) - ybase
    tmax = jnp.maximum(t(y0i - subl).max(red),
                       t(y1i - subl).max(red)) - ybase
    cbase = jnp.clip(cmin, 0, nchunk - cwin3)
    narrow = (smax - smin) < _LANE
    fast = ((ymax - ybase < kwin) & (cmax - cbase < cwin3) & narrow)
    path = jnp.where(fast, 0, 1)
    zero = jnp.zeros_like(path)
    meta = jnp.stack(
        [path, ybase, cbase, smin, smax, tmin, tmax, ymin, ymax, cmin,
         cmax, narrow.astype(jnp.int32)] + [zero] * (_SNMETA - 12),
        axis=-1)
    return meta.reshape(b, nr * nc, _SNMETA).astype(jnp.int32)


def _splat_kernel(x_ref, y_ref, v_ref, meta_ref, out_ref, *, h, w, nch,
                  mode):
    """Transpose of the warp: scatter the 4 bilinear taps of each tile
    pixel into the VMEM-resident (nch, Hp, Wp) output plane.

    The in-vreg "scatter" is a masked dynamic lane-rotate: a tile pixel at
    lane l targeting source column x sits at lane shift s = x - l, and
    smooth warps only produce a handful of distinct shifts per tile, so
    the fast path loops s over the tile's [smin, smax] range, masks the
    pixels whose tap has that shift, ``pltpu.roll``\\ s the weighted values
    into lane position, rolls sublanes by the relative row shift ty, and
    accumulates per-(group, chunk) window registers over a 24-row x
    3-chunk window. Pathological tiles take a bounded fallback looping
    shift residues per (row, chunk). All tile scalars (path select,
    window bases, loop bounds) are precomputed in XLA (:func:`splat_meta`)
    and read from SMEM — no vector->scalar reductions in the kernel.
    The output block stays resident across the whole grid row of one
    batch image (constant index_map), so cross-tile collisions just
    accumulate sequentially.
    """
    # Block shape is (1, nch, hp, wp). Round-2 note: this line once read
    # shape[1], shape[2] = (nch, hp), which made kwin/cwin degenerate and
    # silently disabled the fast path forever (every tile ran the slow
    # path — the 212 ms/splat that dominated the stage-2 flow step).
    hp, wp = out_ref.shape[2], out_ref.shape[3]
    nchunk = wp // _LANE
    # 24-row window: a tile spans 8 output rows, alignment eats up to 7,
    # leaving +-4 rows of y-jitter headroom (16 left only +-0.5).
    kwin = min(_round_up(24, _SUB), hp)
    cwin = min(3, nchunk)

    @pl.when((pl.program_id(1) == 0) & (pl.program_id(2) == 0))
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)

    subl = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)
    # program_id hoisted out of tile_body: interpret mode can't lower it
    # inside a fori_loop body.
    col_base = pl.program_id(2) * _LANE
    row_base = pl.program_id(1) * _TPS

    def collapse(acc, r):
        """Sum an (8,128) partial over sublanes into sublane r."""
        total = jnp.sum(acc, axis=0, keepdims=True)
        return jnp.broadcast_to(total, (_SUB, _LANE)) * (
            subl == r).astype(jnp.float32)

    def tile_body(t, _ignored):
        sl = pl.ds(pl.multiple_of(t * _SUB, _SUB), _SUB)
        x = x_ref[0, sl].astype(jnp.float32)
        y = y_ref[0, sl].astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
        col_id = col_base + lane
        row_id = (row_base + t) * _SUB + subl
        (x0i, x1i, y0i, y1i, wx0, wx1, wy0, wy1) = _splat_eff_taps(
            x, y, h, w, mode, col_id, row_id, hp, wp)
        vs = [v_ref[0, ch, sl].astype(jnp.float32) for ch in range(nch)]

        (path, ybase, cbase, smin, smax, tmin, tmax, ymin, ymax, cminv,
         cmaxv) = tuple(meta_ref[0, 0, t, k] for k in range(11))
        narrow = meta_ref[0, 0, t, 11]
        fast = path == 0

        q0 = x0i // _LANE
        q1 = x1i // _LANE
        s0 = x0i - lane
        s1 = x1i - lane
        # ty = (target row - ybase) - source sublane: after rolling
        # sublanes by ty mod 8 the pixel is at its target sublane within
        # the kwin-row window and its target group is (sr + ty) // 8.
        t0 = (y0i - ybase) - subl
        t1 = (y1i - ybase) - subl

        @pl.when(fast)
        def _fast_path():
            zero = jnp.zeros((_SUB, _LANE), jnp.float32)
            ngroup = kwin // _SUB
            pr = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)

            def s_fold(s, acc):
                rot = (s % _LANE).astype(jnp.int32)
                mx0 = (s0 == s).astype(jnp.float32)
                mx1 = (s1 == s).astype(jnp.float32)
                xs_ci = []
                for ci in range(cwin):
                    c = cbase + ci
                    xs_ci.append(wx0 * (q0 == c).astype(jnp.float32) * mx0
                                 + wx1 * (q1 == c).astype(jnp.float32)
                                 * mx1)

                def ty_fold(ty, acc):
                    yt = (wy0 * (t0 == ty).astype(jnp.float32)
                          + wy1 * (t1 == ty).astype(jnp.float32))
                    srot = jnp.full((_SUB, _LANE), (ty % _SUB),
                                    jnp.int32)
                    # post-roll sublane p held source sublane (p - ty)%8,
                    # whose target group is ((p - ty)%8 + ty) // 8
                    gidx = ((pr - ty) % _SUB + ty) // _SUB
                    acc = list(acc)
                    for ci in range(cwin):
                        mm = xs_ci[ci] * yt
                        for ch in range(nch):
                            u = pltpu.roll(vs[ch] * mm, rot, 1)
                            u = jnp.take_along_axis(
                                u, (pr - srot) % _SUB, axis=0)
                            for g in range(ngroup):
                                gm = (gidx == g).astype(jnp.float32)
                                idx = (ch * ngroup + g) * cwin + ci
                                acc[idx] = acc[idx] + u * gm
                    return tuple(acc)

                return jax.lax.fori_loop(tmin, tmax + 1, ty_fold, acc)

            init = tuple([zero] * (nch * ngroup * cwin))
            accs = jax.lax.fori_loop(smin, smax + 1, s_fold, init)
            for ch in range(nch):
                for g in range(ngroup):
                    for ci in range(cwin):
                        acc = accs[(ch * ngroup + g) * cwin + ci]
                        row0 = pl.multiple_of(ybase + g * _SUB, _SUB)
                        col0 = pl.multiple_of((cbase + ci) * _LANE, _LANE)
                        blk = out_ref[0, ch, pl.ds(row0, _SUB),
                                      pl.ds(col0, _LANE)]
                        out_ref[0, ch, pl.ds(row0, _SUB),
                                pl.ds(col0, _LANE)] = blk + acc

        @pl.when(jnp.logical_not(fast))
        def _slow_path():
            # Loop the tile's actual shift range when it is narrower than
            # a full rotation (residue masks match exactly once there);
            # fall back to all 128 residues otherwise.
            s_lo = jnp.where(narrow == 1, smin, 0)
            s_hi = jnp.where(narrow == 1, smax + 1, _LANE)

            def row_body(k, _):
                roww = (wy0 * (y0i == k).astype(jnp.float32)
                        + wy1 * (y1i == k).astype(jnp.float32))
                kg = pl.multiple_of((k // _SUB) * _SUB, _SUB)
                kr = k % _SUB

                def chunk_body(c, _):
                    base = pl.multiple_of(c * _LANE, _LANE)
                    w0 = wx0 * (q0 == c).astype(jnp.float32) * roww
                    w1 = wx1 * (q1 == c).astype(jnp.float32) * roww

                    def fold(s, cc):
                        rot = (s % _LANE).astype(jnp.int32)
                        mm = (w0 * ((s0 - s) % _LANE == 0
                                    ).astype(jnp.float32)
                              + w1 * ((s1 - s) % _LANE == 0
                                      ).astype(jnp.float32))
                        return [a + pltpu.roll(v * mm, rot, 1)
                                for a, v in zip(cc, vs)]

                    got = jax.lax.fori_loop(
                        s_lo, s_hi, fold,
                        [jnp.zeros((_SUB, _LANE), jnp.float32)] * nch)
                    for ch in range(nch):
                        blk = out_ref[0, ch, pl.ds(kg, _SUB),
                                      pl.ds(base, _LANE)]
                        out_ref[0, ch, pl.ds(kg, _SUB),
                                pl.ds(base, _LANE)] = (
                            blk + collapse(got[ch], kr))
                    return 0

                return jax.lax.fori_loop(cminv, cmaxv + 1, chunk_body, 0)

            jax.lax.fori_loop(ymin, ymax + 1, row_body, 0)

        return 0

    jax.lax.fori_loop(0, _TPS, tile_body, 0)


def _splat(coords, g, h, w, mode):
    """(B,Ht,Wt,2) coords + (B,Ht,Wt,C) cotangent -> (B,h,w,C) splat."""
    b, ht, wt, nch = g.shape
    hp = _round_up(h, _SUB)
    wp = _round_up(w, _LANE)
    htp = _round_up(ht, _SUB * _TPS)
    wtp = _round_up(wt, _LANE)
    # Identity-pad the coords (unlike the forward's edge-pad, _prep):
    # padded pixels carry their own (col, row) position, so their
    # zero-cotangent taps keep the tile span stats identity-tight. Edge
    # padding put the last real column's x (e.g. 415) on up to 96 lanes
    # of a half-padded chunk, spreading s = x0 - lane over ~98 values —
    # a "fast" tile doing 50x the shift-loop iterations.
    colf = jnp.arange(wtp, dtype=jnp.float32)
    rowf = jnp.arange(htp, dtype=jnp.float32)
    valid = (rowf[:, None] < ht) & (colf[None, :] < wt)
    cf = jnp.pad(coords.astype(jnp.float32),
                 ((0, 0), (0, htp - ht), (0, wtp - wt), (0, 0)))
    xs = jnp.where(valid[None], cf[..., 0],
                   jnp.broadcast_to(colf[None, None, :], (b, htp, wtp)))
    ys = jnp.where(valid[None], cf[..., 1],
                   jnp.broadcast_to(rowf[None, :, None], (b, htp, wtp)))

    gf = jnp.transpose(g.astype(jnp.float32), (0, 3, 1, 2))
    gf = jnp.pad(gf, ((0, 0), (0, 0), (0, htp - ht), (0, wtp - wt)))

    grid = (b, htp // (_SUB * _TPS), wtp // _LANE)
    ncol = wtp // _LANE
    # Meta laid out (b, ncol, rows, _SNMETA) so the SMEM block's last two
    # dims are (_TPS, _SNMETA) = (8, 16) — same Mosaic lowering constraint
    # as the forward kernel's meta (see _forward).
    meta = splat_meta(xs, ys, h, w, mode, hp, wp).reshape(
        b, htp // _SUB, ncol, _SNMETA).transpose(0, 2, 1, 3)
    meta_spec = pl.BlockSpec((1, 1, _TPS, _SNMETA),
                             lambda bi, hb, wb: (bi, wb, hb, 0),
                             memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_splat_kernel, h=h, w=w, nch=nch, mode=mode),
        grid=grid,
        in_specs=[_coord_spec(), _coord_spec(),
                  pl.BlockSpec((1, nch, _SUB * _TPS, _LANE),
                               lambda bi, hb, wb: (bi, 0, hb, wb),
                               memory_space=pltpu.VMEM),
                  meta_spec],
        out_specs=pl.BlockSpec((1, nch, hp, wp),
                               lambda bi, hb, wb: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nch, hp, wp), jnp.float32),
        interpret=_interpret(),
    )(xs, ys, gf, meta)
    out = out[:, :, :h, :w]
    return jnp.transpose(out, (0, 2, 3, 1))


bilinear_sampler.defvjp(_forward_fwd, _forward_bwd)


def flow_warp(src_img: Array, flow: Array) -> Array:
    """Pallas-backed equivalent of :func:`sndepth_tpu.ops.warp.flow_warp`."""
    b, h, w, _ = src_img.shape
    xs = jnp.arange(w, dtype=flow.dtype)
    ys = jnp.arange(h, dtype=flow.dtype)
    grid = jnp.stack(
        [jnp.broadcast_to(xs[None, :], (h, w)),
         jnp.broadcast_to(ys[:, None], (h, w))], axis=-1)
    return bilinear_sampler(src_img, grid[None] + flow, "edge_zero")
