"""On-device Canny edge detection (JAX) + edge-guided propagation.

The reference round-trips GPU->CPU->GPU through OpenCV Canny *inside the
model forward* (`/root/reference/utils/utils_edited.py:488-523`, called from
`models/baseline.py:550`) — a host/graph boundary the TPU build eliminates.
This implements Canny (Sobel -> gradient-direction NMS -> double threshold
100/220 -> hysteresis via a fixed number of dilation passes) as pure XLA
ops, so edge maps either run fused in-graph or are precomputed by the input
pipeline with the same function.

Output convention matches the reference: ``1 - edge`` — pixels near an edge
are ~0, elsewhere ~1.

Also here: :func:`propagate`, the 4-direction edge-weighted shift-blend used
by the refinement stage (`utils_edited.py:526-563`), without the reference's
hardcoded batch-size-4 zero tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

# BT.601 luma weights, matching cv2.cvtColor BGR2GRAY.
_BGR_LUMA = jnp.array([0.114, 0.587, 0.299], jnp.float32)


def bgr_to_gray(img_bgr: Array) -> Array:
    """(B, H, W, 3) BGR -> (B, H, W) luma."""
    return jnp.tensordot(img_bgr.astype(jnp.float32), _BGR_LUMA, axes=[[-1], [0]])


def _sobel(gray: Array) -> tuple[Array, Array]:
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = jnp.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], jnp.float32)

    def conv(k):
        return lax.conv_general_dilated(
            gray[..., None], k[..., None, None], (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]

    return conv(kx), conv(ky)


def _shift(x: Array, dy: int, dx: int) -> Array:
    """Shift with zero padding (NHW)."""
    return jnp.roll(x, (dy, dx), axis=(1, 2)) * _shift_mask(
        x.shape, dy, dx, x.dtype)


def _shift_mask(shape, dy, dx, dtype):
    _, h, w = shape
    mask = jnp.ones(shape, dtype)
    if dy > 0:
        mask = mask.at[:, :dy, :].set(0)
    elif dy < 0:
        mask = mask.at[:, dy:, :].set(0)
    if dx > 0:
        mask = mask.at[:, :, :dx].set(0)
    elif dx < 0:
        mask = mask.at[:, :, dx:].set(0)
    return mask


def canny_edges(img_bgr: Array, low: float = 100.0, high: float = 220.0,
                hysteresis_iters: int = 8) -> Array:
    """Canny edge map over a batch of BGR images.

    img_bgr: (B, H, W, 3), any range (per-image min-max normalized to
    [0, 255] like the reference, `utils_edited.py:519`). Returns
    (B, H, W, 1) with 0 at edges and 1 elsewhere.

    Divergence from cv2: hysteresis runs a fixed number of masked-dilation
    passes instead of an unbounded flood fill — static control flow for XLA.
    """
    gray = bgr_to_gray(img_bgr)
    gmin = gray.min(axis=(1, 2), keepdims=True)
    gmax = gray.max(axis=(1, 2), keepdims=True)
    gray = (gray - gmin) / (gmax - gmin + 1e-12) * 255.0

    gx, gy = _sobel(gray)
    mag = jnp.abs(gx) + jnp.abs(gy)   # cv2 default L1 norm

    # Quantize direction into 4 bins and suppress non-maxima.
    angle = jnp.arctan2(gy, gx)
    deg = jnp.degrees(angle) % 180.0
    bins = jnp.where(
        (deg < 22.5) | (deg >= 157.5), 0,
        jnp.where(deg < 67.5, 1, jnp.where(deg < 112.5, 2, 3)))
    neighbor_pairs = (((0, 1), (0, -1)),    # horizontal gradient
                      ((1, 1), (-1, -1)),   # 45 deg
                      ((1, 0), (-1, 0)),    # vertical
                      ((1, -1), (-1, 1)))   # 135 deg
    is_max = jnp.zeros_like(mag, bool)
    for b, ((dy1, dx1), (dy2, dx2)) in enumerate(neighbor_pairs):
        ge = (mag >= _shift(mag, dy1, dx1)) & (mag >= _shift(mag, dy2, dx2))
        is_max = jnp.where(bins == b, ge, is_max)
    nms = jnp.where(is_max, mag, 0.0)

    strong = nms >= high
    weak = nms >= low

    def dilate(x):
        return lax.reduce_window(
            x.astype(jnp.float32), 0.0, lax.max, (1, 3, 3), (1, 1, 1),
            [(0, 0), (1, 1), (1, 1)]) > 0

    def body(_, s):
        return dilate(s) & weak

    edges = lax.fori_loop(0, hysteresis_iters, body, strong)
    return (1.0 - edges.astype(jnp.float32))[..., None]


def edge_model_inputs(img_bgr: Array) -> Array:
    """[canny, bgr * 1/127.5ish] 4-channel edge-stage input
    (`utils_edited.py:566-580`: edge map concat with inputs * 0.00784)."""
    e = canny_edges(img_bgr)
    return jnp.concatenate([e, img_bgr.astype(jnp.float32) * 0.00784],
                           axis=-1)


def propagate(data: Array, dlr: Array, drl: Array, dud: Array, ddu: Array
              ) -> Array:
    """Edge-weighted 4-direction shift blend (`utils_edited.py:526-563`).

    data: (B, H, W, C); each d*: (B, H, W, 1) blend weight toward the
    shifted copy. Order: left->right, right->left, up->down, down->up.
    """
    def blend(x, shifted, w):
        return shifted * w + x * (1.0 - w)

    zero_col = jnp.zeros_like(data[:, :, :1, :])
    right = jnp.concatenate([zero_col, data[:, :, :-1, :]], axis=2)
    out = blend(data, right, dlr)

    left = jnp.concatenate([out[:, :, 1:, :], zero_col], axis=2)
    out = blend(out, left, drl)

    zero_row = jnp.zeros_like(out[:, :1, :, :])
    down = jnp.concatenate([zero_row, out[:, :-1, :, :]], axis=1)
    out = blend(out, down, dud)

    up = jnp.concatenate([out[:, 1:, :, :], zero_row], axis=1)
    out = blend(out, up, ddu)
    return out
