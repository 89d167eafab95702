"""Pallas TPU kernel: fused dense-SE3 Gauss-Newton system build.

The TPU-native replacement for the reference's ``se3_build_inplace`` CUDA
kernel (`/root/reference/models/raft3d/se3_field.py:9-50`, used by
`step_inplace` `:146-167`): per pixel i, accumulate over every pixel j
(embedding attention x confidence weighted, radius-masked) the 6x6
normal equations H_i and rhs g_i of the reprojection residuals of T_i
applied to X_j.

Why a kernel: the XLA formulation (`models/raft3d.py:gauss_newton_step`)
materializes the (B, 3, Ni, 6, cj) Jacobian per j-chunk (~540 MB at
full-res KITTI) and contracts it with batched (6, 3cj)x(3cj, 6) Grams —
0.2% MXU utilization. The r4 full-res trace puts that inner loop at
812 of the 886 ms frame. Here each grid step owns an 8-pixel i-group,
streams j in 128-wide lane chunks, builds J on the fly in registers and
accumulates the 21 unique H entries + 6 g entries as (8, 128) running
sums — no J tensor ever exists, everything is VPU fma on full tiles.

Layouts (built by :func:`gn_build_hg`):
  idata: (B, NBi, 8, 128) f32 — per-i columns [rot(9), trans(3),
         emb(32), sq(1), gy(1), gx(1)], zero-padded to 128 lanes;
  jdata: (B, 44, NJ) f32 — per-j rows [X(3), emb(32), sq(1), gy(1),
         gx(1), tgt(3), wgt(3)], NJ = n padded to 128 (pad js carry
         wgt=0, gy=gx=1e6, X=(0,0,1) so they contribute exactly zero);
  intr:  (B, 4) f32 in SMEM (fx, fy, cx, cy);
  out:   (B, NBi, 8, 128) f32 — lanes [H(21 upper-tri row-major), g(6)].

Gradients: the kernel is forward-only; :func:`gn_build_hg` wraps it in a
custom VJP whose backward re-derives through the XLA accumulate path
(only ever exercised at training scale, where the XLA path is the
default anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_EMB = 32          # attention embedding width (ae/8), reference radius-32
_NJROWS = 44       # per-j data rows
_PAIRS = [(c, d) for c in range(6) for d in range(c, 6)]   # 21 upper-tri


def _kernel(idata_ref, jdata_ref, intr_ref, out_ref, *, nj, radius):
    it = idata_ref[0, 0]                                   # (8, 128)

    def col(c):
        return jnp.broadcast_to(it[:, c:c + 1], (8, 128))

    R = [col(k) for k in range(9)]                         # row-major 3x3
    t0, t1, t2 = col(9), col(10), col(11)
    xi = [col(12 + c) for c in range(_EMB)]
    sqi = col(12 + _EMB)
    gyi = col(13 + _EMB)
    gxi = col(14 + _EMB)
    fx = intr_ref[0, 0]
    fy = intr_ref[0, 1]
    cx = intr_ref[0, 2]
    cy = intr_ref[0, 3]
    rad = jnp.float32(radius)

    zeros = jnp.zeros((8, 128), jnp.float32)
    acc = [zeros] * (len(_PAIRS) + 6)

    def body(jc, acc):
        jd = jdata_ref[0, :, pl.ds(jc * 128, 128)]         # (44, 128)

        def row(r):
            return jnp.broadcast_to(jd[r:r + 1, :], (8, 128))

        Xx, Xy, Xz = row(0), row(1), row(2)
        dist = -sqi - row(3 + _EMB)
        for c in range(_EMB):
            dist = dist + (2.0 * xi[c]) * row(3 + c)
        gyj = row(4 + _EMB)
        gxj = row(5 + _EMB)
        tu, tv, tz = row(6 + _EMB), row(7 + _EMB), row(8 + _EMB)
        w = [row(9 + _EMB), row(10 + _EMB), row(11 + _EMB)]

        within = ((jnp.abs(gyi - gyj) <= rad)
                  & (jnp.abs(gxi - gxj) <= rad))
        attn = jnp.where(within, jax.nn.sigmoid(dist), 0.0)

        Px = R[0] * Xx + R[1] * Xy + R[2] * Xz + t0
        Py = R[3] * Xx + R[4] * Xy + R[5] * Xz + t1
        Pz = R[6] * Xx + R[7] * Xy + R[8] * Xz + t2
        dinv = 1.0 / Pz
        d2 = dinv * dinv

        r_m = [tu - (fx * Px * dinv + cx),
               tv - (fy * Py * dinv + cy),
               tz - dinv]
        # J rows (None = exact zero, skipped in the Gram):
        J = [
            [fx * dinv, None, -fx * Px * d2, -fx * Px * Py * d2,
             fx * (1.0 + Px * Px * d2), -fx * Py * dinv],
            [None, fy * dinv, -fy * Py * d2,
             -fy * (1.0 + Py * Py * d2), fy * Px * Py * d2,
             fy * Px * dinv],
            [None, None, -d2, -Py * d2, Px * d2, None],
        ]

        acc = list(acc)
        for m in range(3):
            aw = attn * w[m]
            Jm = J[m]
            JW = [None if Jm[c] is None else aw * Jm[c] for c in range(6)]
            for pi, (c, d) in enumerate(_PAIRS):
                if JW[c] is not None and Jm[d] is not None:
                    acc[pi] = acc[pi] + JW[c] * Jm[d]
            for c in range(6):
                if JW[c] is not None:
                    acc[21 + c] = acc[21 + c] + JW[c] * r_m[m]
        return tuple(acc)

    acc = jax.lax.fori_loop(0, nj // 128, body, tuple(acc))

    sums = [jnp.sum(a, axis=1, keepdims=True) for a in acc]   # (8,1) x27
    pad = jnp.zeros((8, 128 - len(acc)), jnp.float32)
    out_ref[0, 0] = jnp.concatenate(sums + [pad], axis=1)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _gn_pallas(idata: Array, jdata: Array, intr: Array, radius: int
               ) -> Array:
    b, nbi = idata.shape[0], idata.shape[1]
    nj = jdata.shape[2]
    return pl.pallas_call(
        functools.partial(_kernel, nj=nj, radius=radius),
        grid=(b, nbi),
        in_specs=[
            pl.BlockSpec((1, 1, 8, 128), lambda bi, ig: (bi, ig, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _NJROWS, nj), lambda bi, ig: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda bi, ig: (bi, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, 128),
                               lambda bi, ig: (bi, ig, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nbi, 8, 128), jnp.float32),
        interpret=_interpret(),
    )(idata, jdata, intr)


def gn_build_hg(rot: Array, trans: Array, x: Array, sq: Array, gy: Array,
                gx: Array, X: Array, tgt: Array, wgt: Array,
                intrinsics4: Array, radius: int) -> tuple[Array, Array]:
    """Fused (H, g) build. Shapes as in ``gauss_newton_step``'s flats:
    rot (B,n,3,3) f32, trans (B,n,3), x (B,n,32) = ae/8, sq (B,n),
    gy/gx (n,) int grid coords, X/tgt/wgt (B,n,3),
    intrinsics4 (B,4) = (fx, fy, cx, cy).
    Returns H (B,n,6,6) symmetric, g (B,n,6)."""
    b, n = sq.shape
    ni = -(-n // 8) * 8
    nj = -(-n // 128) * 128

    def padi(a):
        return jnp.pad(a.reshape(b, n, -1),
                       ((0, 0), (0, ni - n), (0, 0)))

    gy_f = jnp.broadcast_to(gy.astype(jnp.float32)[None], (b, n))
    gx_f = jnp.broadcast_to(gx.astype(jnp.float32)[None], (b, n))
    icols = jnp.concatenate(
        [padi(rot.reshape(b, n, 9)), padi(trans), padi(x),
         padi(sq[..., None]),
         # padded i rows: off-grid so 'within' masks them (their H/g
         # outputs are sliced away anyway, but keep them finite)
         jnp.pad(gy_f[..., None], ((0, 0), (0, ni - n), (0, 0)),
                 constant_values=-(10.0 ** 6)),
         jnp.pad(gx_f[..., None], ((0, 0), (0, ni - n), (0, 0)),
                 constant_values=-(10.0 ** 6))], axis=-1)
    icols = jnp.pad(icols, ((0, 0), (0, 0), (0, 128 - icols.shape[-1])))
    idata = icols.reshape(b, ni // 8, 8, 128)

    def padj(a, fill=0.0):
        return jnp.pad(a.reshape(b, n, -1),
                       ((0, 0), (0, nj - n), (0, 0)),
                       constant_values=fill)

    Xp = jnp.concatenate(
        [padj(X[..., :1]), padj(X[..., 1:2]),
         padj(X[..., 2:3], fill=1.0)], axis=-1)     # pad z=1: finite J
    jcols = jnp.concatenate(
        [Xp, padj(x), padj(sq[..., None]),
         padj(gy_f[..., None], fill=10.0 ** 6),
         padj(gx_f[..., None], fill=10.0 ** 6),
         padj(tgt), padj(wgt)], axis=-1)            # (B, nj, 44)
    jdata = jcols.transpose(0, 2, 1)                # (B, 44, nj)

    out = _gn_pallas(idata, jdata, intrinsics4.astype(jnp.float32),
                     radius)
    out = out.reshape(b, ni, 128)[:, :n]
    tri = out[..., :21]                              # (B, n, 21)
    g = out[..., 21:27]
    rows, cols_ = zip(*_PAIRS)
    H = jnp.zeros((b, n, 6, 6), jnp.float32)
    H = H.at[:, :, rows, cols_].set(tri)
    H = H.at[:, :, cols_, rows].set(tri)             # mirror (diag twice OK)
    return H, g
