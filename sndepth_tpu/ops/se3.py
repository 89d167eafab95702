"""Dense SE(3) fields in pure JAX (lietorch replacement).

The reference leans on the CUDA/C++ lietorch library for SE3 tensors with
tangent-space backprop (`/root/reference/models/raft3d/raft3d.py:5-6`,
`se3_field.py:3`). Here an SE(3) field is just an array of shape
``(..., 7)`` laid out ``[tx ty tz qx qy qz qw]`` (lietorch's data layout),
and every group op is closed-form jnp math — elementwise, fully batched,
differentiable by JAX autodiff (the exp/log coefficient functions switch to
Taylor series near theta=0 with NaN-safe ``where`` guards, so gradients are
exact there too). No kernels needed: XLA fuses the whole thing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-8


def identity(shape=(), dtype=jnp.float32) -> Array:
    """SE3 identity field of the given leading shape -> (*shape, 7)."""
    data = jnp.zeros(tuple(shape) + (7,), dtype)
    return data.at[..., 6].set(1.0)


# --- quaternion helpers (x, y, z, w) ---

def quat_mul(q1: Array, q2: Array) -> Array:
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ], axis=-1)


def quat_rotate(q: Array, p: Array) -> Array:
    """Rotate points p (..., 3) by unit quaternions q (..., 4)."""
    qv = q[..., :3]
    qw = q[..., 3:]
    t = 2.0 * jnp.cross(qv, p)
    return p + qw * t + jnp.cross(qv, t)


def quat_conj(q: Array) -> Array:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], q.dtype)


def _skew(v: Array) -> Array:
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)


def _safe_div(num, den):
    return num / jnp.where(jnp.abs(den) < _EPS, 1.0, den)


# --- group ops ---

def exp(tangent: Array) -> Array:
    """SE3 exponential map. tangent: (..., 6) = [tau(3), phi(3)] -> (..., 7).

    Matches lietorch's convention (translation components first).
    """
    tau, phi = tangent[..., :3], tangent[..., 3:]
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < 1e-8
    # Double-where: sqrt has a NaN gradient at 0, and `where` propagates
    # NaN grads from the unselected branch — so guard the operand too.
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))

    # Unit quaternion from phi.
    half = 0.5 * theta
    sinc_half = jnp.where(small, 0.5 - theta_sq / 48.0,
                          jnp.sin(half) / theta)
    qv = phi * sinc_half
    qw = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    q = jnp.concatenate([qv, qw], axis=-1)

    # V matrix: I + B [phi]x + C [phi]x^2.
    b = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta_sq))
    c = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                  (theta - jnp.sin(theta)) /
                  jnp.where(small, 1.0, theta_sq * theta))
    px = jnp.cross(phi, tau)
    pxx = jnp.cross(phi, px)
    t = tau + b * px + c * pxx
    return jnp.concatenate([t, q], axis=-1)


def log(g: Array) -> Array:
    """SE3 logarithm. g: (..., 7) -> tangent (..., 6) = [tau, phi]."""
    t, q = g[..., :3], g[..., 3:]
    qv, qw = q[..., :3], q[..., 3:]
    n_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = n_sq < 1e-12
    n = jnp.sqrt(jnp.where(small, 1.0, n_sq))
    theta_exact = 2.0 * jnp.arctan2(n, jnp.abs(qw))
    sign = jnp.where(qw < 0, -1.0, 1.0)
    # theta/n Taylor around n=0 (qw ~ +-1): 2/|qw| * (1 - n^2/(3 qw^2)).
    abs_qw = jnp.maximum(jnp.abs(qw), 1e-12)
    scale = jnp.where(small,
                      sign * 2.0 / abs_qw * (1.0 - n_sq / (3 * abs_qw ** 2)),
                      sign * theta_exact / n)
    phi = qv * scale

    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < 1e-8
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    # V^{-1} = I - 0.5 [phi]x + D [phi]x^2
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    denom = jnp.where(small, 1.0, 2.0 * (1.0 - cos_t))
    d = jnp.where(
        small, 1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - theta * sin_t / denom) / jnp.where(small, 1.0, theta_sq))
    px = jnp.cross(phi, t)
    pxx = jnp.cross(phi, px)
    tau = t - 0.5 * px + d * pxx
    return jnp.concatenate([tau, phi], axis=-1)


def mul(g1: Array, g2: Array) -> Array:
    """Group composition g1 * g2."""
    t1, q1 = g1[..., :3], g1[..., 3:]
    t2, q2 = g2[..., :3], g2[..., 3:]
    t = t1 + quat_rotate(q1, t2)
    q = quat_mul(q1, q2)
    return jnp.concatenate([t, q], axis=-1)


def inv(g: Array) -> Array:
    t, q = g[..., :3], g[..., 3:]
    qi = quat_conj(q)
    return jnp.concatenate([-quat_rotate(qi, t), qi], axis=-1)


def act(g: Array, p: Array) -> Array:
    """Apply transforms to points: g (..., 7) x p (..., 3) -> (..., 3)."""
    return quat_rotate(g[..., 3:], p) + g[..., :3]


def matrix(g: Array) -> Array:
    """(..., 7) -> homogeneous (..., 4, 4)."""
    t, q = g[..., :3], g[..., 3:]
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    r = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)
    top = jnp.concatenate([r, t[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def normalize(g: Array) -> Array:
    """Re-normalize the quaternion part (drift control in long scans)."""
    t, q = g[..., :3], g[..., 3:]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    return jnp.concatenate([t, q], axis=-1)
