"""Grid-structured embedding smoothing via on-device conjugate gradient.

Replaces the reference's ``GridFactor`` + CPU CHOLMOD sparse Cholesky
(`/root/reference/models/raft3d/blocks/grid.py:12-214`, called every
bilaplacian iteration from `raft3d_bilaplacian.py:41-68`) — a
device->host->device round trip inside the hot loop — with a matrix-free
conjugate-gradient solve of the same normal equations:

    (Wu + Dx^T Wx Dx + Dy^T Wy Dy) x = Wu * ae

where Dx/Dy are forward-difference operators on the grid (the factor
graph's 'h'/'v' factors) and Wu == 1 (the 'u' factor). The operator is SPD,
so CG with a fixed iteration count is exact control flow for XLA, stays in
VMEM/HBM, and autodiff through the unrolled iterations gives consistent
gradients.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _dx(x: Array) -> Array:
    """Forward difference along W: (B, H, W-1, C)."""
    return x[:, :, 1:] - x[:, :, :-1]


def _dxT(r: Array) -> Array:
    """Adjoint of _dx: scatter back to (B, H, W, C)."""
    left = jnp.pad(r, ((0, 0), (0, 0), (1, 0), (0, 0)))
    right = jnp.pad(r, ((0, 0), (0, 0), (0, 1), (0, 0)))
    return left - right


def _dy(x: Array) -> Array:
    return x[:, 1:] - x[:, :-1]


def _dyT(r: Array) -> Array:
    top = jnp.pad(r, ((0, 0), (1, 0), (0, 0), (0, 0)))
    bottom = jnp.pad(r, ((0, 0), (0, 1), (0, 0), (0, 0)))
    return top - bottom


def grid_solve(ae: Array, wx: Array, wy: Array, iters: int = 16) -> Array:
    """Solve the screened grid-Laplacian system for each channel.

    ae: (B, H, W, C) unary targets; wx/wy: (B, H, W, 1) edge weights (the
    weight of the factor between (i, j) and its right/down neighbor; the
    last column/row of wx/wy is unused). Returns the smoothed field.
    """
    wx_e = wx[:, :, :-1]     # weights on horizontal edges
    wy_e = wy[:, :-1]

    def A(x):
        return (x + _dxT(wx_e * _dx(x)) + _dyT(wy_e * _dy(x)))

    b = ae
    x = ae                    # warm start at the unary target

    def body(_, carry):
        x, r, p, rs = carry
        ap = A(p)
        alpha = rs / (jnp.sum(p * ap, axis=(1, 2, 3), keepdims=True) + 1e-12)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.sum(r * r, axis=(1, 2, 3), keepdims=True)
        beta = rs_new / (rs + 1e-12)
        p = r + beta * p
        return x, r, p, rs_new

    r0 = b - A(x)
    rs0 = jnp.sum(r0 * r0, axis=(1, 2, 3), keepdims=True)
    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r0, r0, rs0))
    return x


class GridSmoother(nn.Module):
    """`raft3d_bilaplacian.py:41-68` equivalent: smooth the embedding field
    with per-edge weights predicted by the update block."""
    cg_iters: int = 16

    @nn.compact
    def __call__(self, ae: Array, wxwy: Array) -> Array:
        """ae: (B, H, W, C); wxwy: (B, H, W, 2) softplus edge weights."""
        wx = wxwy[..., 0:1]
        wy = wxwy[..., 1:2]
        return grid_solve(ae, wx, wy, self.cg_iters)
