"""DispNetS: multi-scale disparity encoder-decoder (TPU-native, NHWC).

Same topology and output parameterization as the reference
(`/root/reference/models/DispNetS.py:42-136`): a 7-level stride-2 conv
encoder (each level = stride-2 conv + stride-1 conv, ReLU), a 7-level
transposed-conv decoder with encoder skip connections, and sigmoid disparity
heads at the finest 4 scales parameterized as ``alpha * sigmoid + beta``
(alpha=10, beta=0.01).

TPU-first design notes:
* NHWC layout and optional bfloat16 compute (params stay f32); disparity
  heads are computed in f32 so the ``1/disp`` depths feeding the warp loss
  stay well-conditioned.
* All shapes are static; the whole net is one XLA program. With 128x416
  inputs every spatial dim stays even, so the reference's ``crop_like``
  padding fix-ups are exact no-ops and are handled by slicing only when
  shapes actually mismatch.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

_xavier = nn.initializers.xavier_uniform()


def _space_to_depth(x: Array) -> Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel = (dy*2 + dx)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _depth_to_space(x: Array) -> Array:
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, 2 * h, 2 * w, c)


def _s2d_tap_map(kernel: int) -> tuple[int, int, "np.ndarray", "np.ndarray"]:
    """Static (u, v) gather indices turning a KxK stride-1 conv into an
    equivalent KSxKS conv in 2x2 space-to-depth space.

    Output phase (a, b) and s2d tap (py, px, p, q) select original tap
    ``u = 2*(py - pad) + p + P - a`` (P = (K-1)//2); out-of-range taps point
    at a zero pad slot (index K). Returns (KS, pad, u_idx, v_idx) with
    u_idx/v_idx of shape (KS, 2, 2) indexed [py, p, a] / [px, q, b].
    """
    import numpy as np
    P = (kernel - 1) // 2
    # Enumerate sy = a - P + u to find the s2d tap extent.
    pys = [((a - P + u) - (a - P + u) % 2) // 2
           for a in range(2) for u in range(kernel)]
    pad = -min(pys)
    ks = max(pys) + pad + 1
    u_idx = np.full((ks, 2, 2), kernel, np.int32)   # sentinel -> zero slot
    for a in range(2):
        for u in range(kernel):
            sy = a - P + u
            p = sy % 2
            py = (sy - p) // 2 + pad
            u_idx[py, p, a] = u
    return ks, pad, u_idx, u_idx.copy()


def _s2d_f(x: Array, f: int) -> Array:
    """(B, H, W, C) -> (B, H/f, W/f, f*f*C); channel = (dy*f + dx)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // f, w // f, f * f * c)


def _d2s_f(x: Array, f: int) -> Array:
    """Inverse of :func:`_s2d_f`."""
    b, h, w, cf = x.shape
    c = cf // (f * f)
    x = x.reshape(b, h, w, f, f, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, f * h, f * w, c)


def _occupancy(c: int) -> float:
    import math
    return c / (math.ceil(c / 128) * 128)


def _fold_factor(kernel: int, c_out: int, h: int, w: int) -> int:
    """Best space-to-depth factor f for a KxK conv with c_out output
    channels: maximize lane occupancy of f*f*c_out divided by the tap-FLOP
    overhead (K+f-1)^2/K^2. f=1 is the direct form."""
    best_f, best_score = 1, _occupancy(c_out)
    for f in (2, 4, 8):
        if h % f or w % f:
            continue
        score = (_occupancy(c_out * f * f) /
                 ((kernel + f - 1) ** 2 / kernel ** 2))
        if score > best_score * 1.05:   # require a real margin over direct
            best_f, best_score = f, score
    return best_f


def _fold_conv(x: Array, w: Array, dtype: Any, f: int = 2) -> Array:
    """Stride-1 KxK 'same' zero-pad conv with fxf space-to-depth-packed
    output.

    Folds the space-to-depth of the *output* into the conv itself:
    ``out[i, j, (a, b, co)] = y[f*i+a, f*j+b, co]`` is a stride-f conv
    over the original x whose (a, b) output-channel block is w zero-padded
    by (a, f-1-a)/(b, f-1-b) — no input layout copy. Returns (B, H/f,
    W/f, f*f*Cout); ``_d2s_f(., f)`` of it equals the direct conv output.
    """
    if f == 1:
        P = (w.shape[0] - 1) // 2
        return jax.lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype), (1, 1), ((P, P), (P, P)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    P = (w.shape[0] - 1) // 2
    wd = w.astype(dtype)
    kf = jnp.concatenate(
        [jnp.pad(wd, ((a, f - 1 - a), (b, f - 1 - b), (0, 0), (0, 0)))
         for a in range(f) for b in range(f)], axis=-1)
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kf, (f, f),
        ((P, P + f - 1), (P, P + f - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _s2d_conv(x: Array, w: Array, bias: Array, dtype: Any,
              f_fwd: int = 2, f_dgrad: int = 2) -> Array:
    """'same' KxK conv == nn.Conv(Cout, (K, K), padding=P), evaluated with
    space-to-depth-packed output and custom lane-packed gradients. The
    static factors pick the forward / data-grad packing independently."""
    y = _fold_conv(x, w, dtype, f_fwd)
    y = _d2s_f(y, f_fwd) if f_fwd > 1 else y
    return y + bias.astype(dtype)


def _s2d_conv_fwd(x, w, bias, dtype, f_fwd, f_dgrad):
    return _s2d_conv(x, w, bias, dtype, f_fwd, f_dgrad), (x, w, bias)


def _s2d_conv_bwd(dtype, f_fwd, f_dgrad, res, dy):
    x, w, bias = res
    # dx: the data-grad is itself a 'same' KxK conv (dy against the
    # spatially-flipped, in/out-transposed kernel) — evaluate it in the
    # same packed-output form so its MXU lanes are f^2*Cin instead of Cin.
    # The direct conv-transpose XLA autodiff emits for the folded forward
    # is among the most lane-starved ops in the train step (e.g. level 0's
    # (9,9,32,128) -> 64x208x32 at 25% lane occupancy, ~848 GFLOP).
    wt = jnp.flip(w, (0, 1)).swapaxes(2, 3)
    dxp = _fold_conv(dy, wt, dtype, f_dgrad)
    dx = (_d2s_f(dxp, f_dgrad) if f_dgrad > 1 else dxp).astype(x.dtype)
    # dw: pull back through the folded conv w.r.t. w only — XLA emits its
    # standard weight-grad correlation with f^2*Cout output lanes (never
    # lane-starved); the unused forward primal inside vjp is linear in w
    # and gets dead-code-eliminated under jit.
    dy_p = _s2d_f(dy, f_fwd) if f_fwd > 1 else dy
    dw = jax.vjp(lambda wv: _fold_conv(x, wv, dtype, f_fwd), w)[1](dy_p)[0]
    db = jnp.sum(dy, axis=(0, 1, 2), dtype=jnp.float32).astype(bias.dtype)
    return dx, dw, db


_s2d_conv.defvjp(_s2d_conv_fwd, _s2d_conv_bwd)


def _stride2_dgrad_map(kernel: int) -> tuple[int, int, "np.ndarray"]:
    """Static tap map for the data-grad of a stride-2 'same' KxK conv,
    evaluated as a stride-1 conv over dy with space-to-depth-packed output.

    dx[2i'+a, ., ci] = sum_u dy[i'+d, ., co] * w[u, ., ci, co] with
    d = (a + P - u)/2 over the taps where (a + P - u) is even. Returns
    (T, pad_lo, u_idx) with u_idx of shape (T, 2) indexed [t, a] giving the
    original tap u (or K for the zero slot); conv tap t reads dy[i' + t -
    pad_lo].
    """
    import numpy as np
    P = (kernel - 1) // 2
    ds = [(a + P - u) // 2 for a in range(2) for u in range(kernel)
          if (a + P - u) % 2 == 0]
    pad_lo = -min(ds)
    T = max(ds) + pad_lo + 1
    u_idx = np.full((T, 2), kernel, np.int32)
    for a in range(2):
        for u in range(kernel):
            if (a + P - u) % 2 == 0:
                u_idx[(a + P - u) // 2 + pad_lo, a] = u
    return T, pad_lo, u_idx


def _down_conv_impl(x: Array, w: Array, bias: Array, dtype: Any) -> Array:
    P = (w.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (2, 2), ((P, P), (P, P)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _down_conv(x: Array, w: Array, bias: Array, dtype: Any) -> Array:
    """'same' stride-2 KxK conv == nn.Conv(Cout, (K, K), strides=(2, 2),
    padding=P) with a lane-packed data-grad in the backward."""
    return _down_conv_impl(x, w, bias, dtype)


def _down_conv_fwd(x, w, bias, dtype):
    return _down_conv(x, w, bias, dtype), (x, w, bias)


def _down_conv_bwd(dtype, res, dy):
    x, w, bias = res
    k = w.shape[0]
    c_in = w.shape[2]
    # dx: the data-grad of a stride-2 conv is XLA's lhs-dilated transpose
    # producing Cin channels at input resolution (25% lanes for the
    # 32-channel early levels). Evaluated instead as a T x T stride-1 conv
    # over dy with the parity-split kernel and 4*Cin packed output:
    # e.g. level 1's (5,5,32,64) dgrad goes 25 taps @ 32 lanes ->
    # 9 taps @ 128 lanes (1.44x FLOPs, 4x lanes).
    T, pad_lo, u_idx = _stride2_dgrad_map(k)
    wp = jnp.pad(w.astype(dtype), ((0, 1), (0, 1), (0, 0), (0, 0)))
    # (T, 2, T, 2, Cin, Cout) -> (T, T, Cout, 2, 2, Cin) -> packed kernel
    kt = wp[u_idx[:, :, None, None], u_idx[None, None, :, :]]
    kt = jnp.transpose(kt, (0, 2, 5, 1, 3, 4)).reshape(
        T, T, w.shape[3], 4 * c_in)
    pad_hi = T - 1 - pad_lo
    dx_p = jax.lax.conv_general_dilated(
        dy, kt, (1, 1), ((pad_lo, pad_hi), (pad_lo, pad_hi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dx = _depth_to_space(dx_p).astype(x.dtype)
    # dw: XLA's own weight-grad for the direct conv (identical to
    # autodiff; the primal inside vjp is linear in w and DCE'd under jit).
    P = (k - 1) // 2
    dw = jax.vjp(
        lambda wv: jax.lax.conv_general_dilated(
            x.astype(dtype), wv.astype(dtype), (2, 2), ((P, P), (P, P)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")), w)[1](dy)[0]
    db = jnp.sum(dy, axis=(0, 1, 2), dtype=jnp.float32).astype(bias.dtype)
    return dx, dw, db


_down_conv.defvjp(_down_conv_fwd, _down_conv_bwd)


class _PackedDGradDownConv(nn.Module):
    """nn.Conv(features, (K, K), strides=2, padding=P) with the packed
    data-grad backward; identical param tree ('kernel' + 'bias')."""
    features: int
    kernel: int
    dtype: Any

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c_in = x.shape[-1]
        w = self.param("kernel", _xavier,
                       (self.kernel, self.kernel, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if x.shape[1] % 2 or x.shape[2] % 2:
            # Odd input dims: packed dx would need odd-d2s; use autodiff.
            return _down_conv_impl(x, w, bias, self.dtype)
        return _down_conv(x, w, bias, self.dtype)


class _S2DConv(nn.Module):
    """Stride-1 KxK conv evaluated in 2x2 space-to-depth space.

    Mathematically identical to ``nn.Conv(features, (K, K), padding=P)``
    with the *same* param tree (kernel (K, K, Cin, Cout) + bias), but the
    MXU sees a KSxKS conv with 4*Cin -> 4*Cout channels at half resolution:
    for the lane-starved early DispNetS layers (32 ch) XLA sustains ~9
    TFLOPS on the direct form in-step vs >100 TFLOPS on the 128-channel
    s2d form — the 2x tap-FLOP overhead is a large net win. The backward
    convs are lane-packed too (see _s2d_conv_bwd). Exactness (forward and
    gradients) is tested against nn.Conv in tests/test_geonet_train.py.
    """
    features: int
    kernel: int
    dtype: Any

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c_in = x.shape[-1]
        w = self.param("kernel", _xavier,
                       (self.kernel, self.kernel, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        h_, w_ = x.shape[1], x.shape[2]
        f_fwd = _fold_factor(self.kernel, self.features, h_, w_)
        f_dgrad = _fold_factor(self.kernel, c_in, h_, w_)
        if f_fwd == 1 and f_dgrad == 1:
            # Direct form is already lane-efficient (or dims are odd).
            p = (self.kernel - 1) // 2
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w.astype(self.dtype), (1, 1),
                ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias.astype(self.dtype)
        return _s2d_conv(x, w, bias, self.dtype, f_fwd, f_dgrad)


class _DownBlock(nn.Module):
    features: int
    kernel: int
    dtype: Any
    s2d: bool = False
    packed_dgrad: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # Explicit symmetric padding: for stride-2 convs flax 'SAME' pads
        # asymmetrically ((k-1)//2 - 1, (k-1)//2 + ...), while the torch
        # reference pads (k-1)//2 on both sides — a one-pixel shift that
        # breaks converted-checkpoint parity.
        p = (self.kernel - 1) // 2
        pad = ((p, p), (p, p))
        if self.packed_dgrad:
            # Same params/name as the nn.Conv branch (checkpoint-exact).
            x = _PackedDGradDownConv(self.features, self.kernel, self.dtype,
                                     name="Conv_0")(x)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(2, 2), padding=pad, dtype=self.dtype,
                        kernel_init=_xavier, name="Conv_0")(x)
        x = nn.relu(x)
        if self.s2d:
            # Same params/name as the nn.Conv branch (checkpoint-exact).
            x = _S2DConv(self.features, self.kernel, self.dtype,
                         name="Conv_1")(x)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        padding=pad, dtype=self.dtype, kernel_init=_xavier,
                        name="Conv_1")(x)
        return nn.relu(x)


def _deconv2x_impl(x: Array, k: Array, bias: Array, dtype: Any) -> Array:
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), k[::-1, ::-1].astype(dtype),
        window_strides=(1, 1), padding=((1, 2), (1, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _deconv2x(x: Array, k: Array, bias: Array, dtype: Any) -> Array:
    """torch ConvTranspose2d(k3 s2 p1 op1) forward with hand-formed
    gradients. XLA's autodiff of the lhs-dilated form materializes a
    full-resolution spatial ``reverse`` of dy AND a lane-starved
    weight-grad per level (geonet trace: ~4 ms of reverses + the
    worst-utilization wgrad fusions). The closed forms below avoid both;
    grad-parity-tested vs autodiff of :func:`_deconv2x_impl`."""
    return _deconv2x_impl(x, k, bias, dtype)


def _deconv2x_fwd(x, k, bias, dtype):
    return _deconv2x(x, k, bias, dtype), (x, k)


def _deconv2x_bwd(dtype, res, dy):
    x, k = res
    ci = k.shape[2]
    # dx: the adjoint of a transposed conv is the plain strided conv
    # with the same (unflipped) taps, in/out swapped.
    dx = jax.lax.conv_general_dilated(
        dy, k.swapaxes(2, 3).astype(dtype), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(x.dtype)
    # dk via the output-phase (space-to-depth) formulation: y's phase
    # (a, c) is a 2x2 stride-1 conv of x (see _S2DUpConv2x), and each
    # original tap (u, v) appears in exactly one (phase, offset) slot:
    # u = 1 <- (a=0, dy=0), u = 2 <- (a=1, dy=0), u = 0 <- (a=1, dy=1).
    # So the whole dk is one well-laned 2x2 wgrad of (x, s2d(dy)) plus a
    # static re-indexing of the tiny (2, 2, ci, 2, 2, co) result.
    n, h2, w2, co = dy.shape
    dy2 = dy.reshape(n, h2 // 2, 2, w2 // 2, 2, co)
    dy2 = dy2.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, h2 // 2, w2 // 2, 4 * co)
    dk2 = jax.vjp(
        lambda kv: jax.lax.conv_general_dilated(
            x.astype(dtype), kv.astype(dtype), (1, 1), ((0, 1), (0, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        jnp.zeros((2, 2, ci, 4 * co), k.dtype))[1](dy2)[0]
    dk2 = dk2.reshape(2, 2, ci, 2, 2, co)
    # dk[u, v] = dk2[dy(u), a(u) ... ]: (u, v) -> (dy, a), (dx, c)
    # with (dy, a) = {0: (1, 1), 1: (0, 0), 2: (0, 1)}[u].
    um = [(1, 1), (0, 0), (0, 1)]
    dk = jnp.stack([
        jnp.stack([dk2[du, dv, :, au, cv, :] for (dv, cv) in um], axis=0)
        for (du, au) in um], axis=0)
    # Bias grad from dy2 (not dy): both wgrad and db then read the same
    # tensor, so XLA fuses the reduce into the dy2 producer instead of
    # a second full-resolution pass over dy.
    db = jnp.sum(dy2.reshape(n, h2 // 2, w2 // 2, 4, co),
                 axis=(0, 1, 2, 3), dtype=jnp.float32)
    return dx, dk.astype(k.dtype), db.astype(jnp.float32)


_deconv2x.defvjp(_deconv2x_fwd, _deconv2x_bwd)


class TorchConvTranspose2x(nn.Module):
    """Transposed conv with torch ``ConvTranspose2d(k=3, s=2, p=1, op=1)``
    semantics, exactly (verified to f64 precision against torch): kernel
    (kh, kw, in, out), zero-stuffing via ``lhs_dilation=2``, padding
    (k-1-p, k-1-p+op) = (1, 2), spatially flipped taps. Output = 2x input.
    Exactness matters for converting reference checkpoints
    (`sndepth_tpu/utils/convert_weights.py`). The backward uses the
    hand-formed gradients of :func:`_deconv2x` (same values, no
    full-res reverses) when the spatial dims are even."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        k = self.param("kernel", _xavier, (3, 3, in_ch, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return _deconv2x(x, k, b, self.dtype)


class _S2DUpConv2x(nn.Module):
    """TorchConvTranspose2x evaluated in space-to-depth output form.

    The k3/s2/p1/op1 transposed conv writes output phase (a, b) from at
    most 2x2 input taps: y[2i+a, 2j+b] = sum_{dy,dx in {0,1}}
    x[i+dy, j+dx] * k[r(a,dy), r(b,dx)] with r = {0: (1, -), 1: (2, 0)}
    (phase 0 has a single tap; the dy=1 slot is zero). So the whole op is
    a 2x2 stride-1 conv with 4*features output channels followed by a
    depth-to-space — same FLOPs, but the MXU sees 4x the output lanes
    (the direct lhs-dilated form is lane-starved at 16-32 channels and
    its backward materializes full-res reverses). Same param tree as
    TorchConvTranspose2x; exactness tested in test_geonet_train.py.
    """
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        k = self.param("kernel", _xavier, (3, 3, in_ch, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        kp = jnp.pad(k.astype(self.dtype),
                     ((0, 1), (0, 1), (0, 0), (0, 0)))   # slot 3 == 0
        ridx = {0: (1, 3), 1: (2, 0)}
        k2 = jnp.concatenate(
            [kp[jnp.array(ridx[a])[:, None], jnp.array(ridx[c])[None, :]]
             for a in (0, 1) for c in (0, 1)], axis=-1)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k2, (1, 1), ((0, 1), (0, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + jnp.tile(b, 4).astype(self.dtype)
        return _depth_to_space(y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _wgrad_s2d_conv(x: Array, w: Array, bias: Array, dtype: Any) -> Array:
    """'same' KxK stride-1 conv with direct forward and data-grad, but
    the WEIGHT grad evaluated through the f=2 folded form: the direct
    wgrad of a small-Cout conv is the worst-laned fusion family of the
    train step ([3,3,17,16] at ~2 TF/s — 4.07 ms of the geonet trace);
    the folded wgrad has f^2*Cout output lanes. fwd/dgrad stay direct
    (the full-layer s2d forms A/B'd negative — this pays the fold cost
    only where the direct form is pathological)."""
    p = (w.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(dtype)


def _wgrad_s2d_conv_fwd(x, w, bias, dtype):
    return _wgrad_s2d_conv(x, w, bias, dtype), (x, w)


def _wgrad_s2d_conv_bwd(dtype, res, dy):
    x, w = res
    p = (w.shape[0] - 1) // 2
    wt = jnp.flip(w, (0, 1)).swapaxes(2, 3)
    dx = jax.lax.conv_general_dilated(
        dy, wt.astype(dtype), (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(x.dtype)
    dy_p = _s2d_f(dy, 2)
    dw = jax.vjp(lambda wv: _fold_conv(x, wv, dtype, 2), w)[1](dy_p)[0]
    db = jnp.sum(dy, axis=(0, 1, 2), dtype=jnp.float32)
    return dx, dw, db.astype(jnp.float32)


_wgrad_s2d_conv.defvjp(_wgrad_s2d_conv_fwd, _wgrad_s2d_conv_bwd)


class _WgradS2DConv(nn.Module):
    """nn.Conv(features, (K, K), 'SAME') with the folded weight-grad;
    identical param tree ('kernel' + 'bias')."""
    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c_in = x.shape[-1]
        w = self.param("kernel", _xavier,
                       (self.kernel, self.kernel, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if x.shape[1] % 2 or x.shape[2] % 2:
            p = (self.kernel - 1) // 2
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w.astype(self.dtype), (1, 1),
                ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias.astype(self.dtype)
        return _wgrad_s2d_conv(x, w, bias, self.dtype)


class _UpConv(nn.Module):
    features: int
    dtype: Any
    s2d: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cls = _S2DUpConv2x if self.s2d else TorchConvTranspose2x
        x = cls(self.features, self.dtype, name="TorchConvTranspose2x_0")(x)
        return nn.relu(x)


class _IConv(nn.Module):
    features: int
    dtype: Any
    s2d: bool = False
    wgrad_s2d: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.s2d:
            # Same params/name as the nn.Conv branch (checkpoint-exact);
            # stride-1 3x3 'SAME' == symmetric pad 1, which _S2DConv uses.
            x = _S2DConv(self.features, 3, self.dtype, name="Conv_0")(x)
        elif self.wgrad_s2d:
            x = _WgradS2DConv(self.features, 3, self.dtype,
                              name="Conv_0")(x)
        else:
            x = nn.Conv(self.features, (3, 3), padding="SAME",
                        dtype=self.dtype, kernel_init=_xavier)(x)
        return nn.relu(x)


class _TapStackHeadConv(nn.Module):
    """3x3 C->1 head conv as one (BHW, C) @ (C, 9) matmul + shift-add.

    The direct 1-output-channel conv occupies 1/128 MXU lanes and its
    backward (1->C dgrad + full-res wgrad) ran at ~3 TFLOPS moving ~5.8 GB
    per step (XProf r2, dispnet.py heads ~10.6 ms/step at batch 128).
    Stacking the 9 taps on the dot's output axis turns the whole op into
    one bandwidth-optimal skinny matmul; the tap planes land on a leading
    axis (lane dim stays W) and the shifted 9-plane sum fuses. Backward is
    the transposed matmul + broadcast shifts — no conv anywhere. Param
    tree identical to the nn.Conv branch (checkpoint-exact); summation
    order differs (per-tap partials), so values match to f32 roundoff
    rather than bitwise.
    """
    dtype: Any

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c_in = x.shape[-1]
        w = self.param("kernel", _xavier, (3, 3, c_in, 1))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        hh, ww = x.shape[1], x.shape[2]
        k9 = jnp.transpose(w.reshape(9, c_in)).astype(self.dtype)
        y9 = jnp.einsum("bhwc,cj->jbhw", x.astype(self.dtype), k9)
        y9 = jnp.pad(y9, ((0, 0), (0, 0), (1, 1), (1, 1)))
        out = y9[0, :, 0:hh, 0:ww]
        for j in range(1, 9):
            out = out + y9[j, :, j // 3:j // 3 + hh, j % 3:j % 3 + ww]
        return out[..., None] + bias.astype(self.dtype)


def _crop_like(x: Array, ref: Array) -> Array:
    if x.shape[1] == ref.shape[1] and x.shape[2] == ref.shape[2]:
        return x
    return x[:, :ref.shape[1], :ref.shape[2], :]


def _upsample2x(x: Array) -> Array:
    """Bilinear 2x upsample (align_corners=False), NHWC."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


class DispNetS(nn.Module):
    """4-scale disparity network. Input NHWC in [-1, 1]; outputs are
    (disp1, disp2, disp3, disp4) each (B, H/2^s, W/2^s, 1), finest first."""

    alpha: float = 10.0
    beta: float = 0.01
    enc_planes: Sequence[int] = (32, 64, 128, 256, 512, 512, 512)
    dec_planes: Sequence[int] = (512, 512, 256, 128, 64, 32, 16)
    dtype: Any = jnp.float32
    # Rematerialize encoder blocks in the backward pass: measured 339 ->
    # 308 ms/step on the batch-128 GeoNet train step (the recompute is
    # cheaper than storing/streaming the big early-scale activations).
    # Rematting the decoder too measured slower (328 ms) -- encoder only.
    # Transparent to the param tree; no effect on inference.
    remat: bool = True
    # Encoder levels whose stride-1 conv runs in space-to-depth form
    # (exact; see _S2DConv). Level 0's direct 7x7 32ch conv is the single
    # hottest op in the train step (9.4 TFLOPS in-step layout pathology).
    s2d_levels: Sequence[int] = (0,)
    # Decoder up-conv indices (into dec_planes) evaluated in s2d form
    # (exact; see _S2DUpConv2x). Default off: measured 225.0 vs 222.5
    # ms/step with (5, 6) at batch 128 — the depth-to-space output copies
    # eat the lane-packing gain while i1/i2 stay in original space.
    s2d_up_levels: Sequence[int] = ()
    # Encoder levels whose stride-2 conv keeps the direct forward but
    # computes its data-grad lane-packed (see _PackedDGradDownConv).
    # Level 0 is pointless (its dx is the image gradient, DCE'd by XLA).
    packed_dgrad_levels: Sequence[int] = ()
    # Decoder iconv indices (into dec_planes: 4 -> i3, 5 -> i2, 6 -> i1)
    # evaluated in s2d form with packed gradients (exact; see _S2DConv).
    # i1/i2 run at 12-25% MXU lane occupancy direct (16-32 channels at
    # 128x416 / 64x208); the 2.78x tap-FLOP overhead of the 3x3 fold is
    # paid back 4-8x in lanes.
    s2d_iconv_levels: Sequence[int] = ()
    # Disparity heads (3x3 -> 1 channel: 1/128 lanes direct) in s2d form
    # (the chooser picks f=8 at full res). Default off until A/B'd — XLA
    # may already lower 1-channel convs as bandwidth-bound fusions.
    s2d_heads: bool = False
    # Disparity heads as tap-stacked matmul + shift-add (_TapStackHeadConv;
    # takes precedence over s2d_heads). Default off until A/B'd on TPU.
    mat_heads: bool = False
    # Decoder iconv indices whose WEIGHT grad (only) is computed through
    # the f=2 folded form (_WgradS2DConv): fwd/dgrad stay direct. The
    # direct wgrads of i1/i2 are the worst-laned fusions of the train
    # step. Default off until A/B'd on TPU.
    wgrad_s2d_iconv_levels: Sequence[int] = ()

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array, Array, Array]:
        x = x.astype(self.dtype)
        ep, dp = self.enc_planes, self.dec_planes
        kernels = (7, 5, 3, 3, 3, 3, 3)

        down = nn.remat(_DownBlock) if self.remat else _DownBlock
        feats = []
        h = x
        for i, (planes, k) in enumerate(zip(ep, kernels)):
            # Explicit name keeps the param tree identical with/without
            # remat (nn.remat would otherwise rename the module scope,
            # breaking the torch-checkpoint converter paths).
            h = down(planes, k, self.dtype, i in self.s2d_levels,
                     i in self.packed_dgrad_levels,
                     name=f"_DownBlock_{i}")(h)
            feats.append(h)
        c1, c2, c3, c4, c5, c6, c7 = feats

        head_idx = iter(range(4))

        def disp_head(h: Array) -> Array:
            # Head conv in compute dtype (MXU accumulates f32 regardless);
            # only the 1-channel sigmoid math runs in f32 so the 1/d depths
            # feeding the warp stay well-conditioned. The earlier f32-input
            # head materialized f32 copies of the 16-ch full-res feature
            # maps and its fwd+bwd convs ran at 3-5 TFLOPS (XProf r2) —
            # ~8 ms/step across scales at batch 128.
            i = next(head_idx)
            if self.mat_heads:
                # Same param name as the nn.Conv branch (checkpoint-exact).
                d = _TapStackHeadConv(self.dtype, name=f"Conv_{i}")(h)
            elif self.s2d_heads:
                # Same param name as the nn.Conv branch (checkpoint-exact).
                d = _S2DConv(1, 3, self.dtype, name=f"Conv_{i}")(h)
            else:
                d = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                            kernel_init=_xavier, name=f"Conv_{i}")(h)
            return self.alpha * nn.sigmoid(d.astype(jnp.float32)) + self.beta

        s2d_i = self.s2d_iconv_levels
        wg_i = self.wgrad_s2d_iconv_levels

        u7 = _crop_like(_UpConv(dp[0], self.dtype,
                                0 in self.s2d_up_levels)(c7), c6)
        i7 = _IConv(dp[0], self.dtype,
                    0 in s2d_i, 0 in wg_i)(jnp.concatenate([u7, c6], -1))

        u6 = _crop_like(_UpConv(dp[1], self.dtype,
                                1 in self.s2d_up_levels)(i7), c5)
        i6 = _IConv(dp[1], self.dtype,
                    1 in s2d_i, 1 in wg_i)(jnp.concatenate([u6, c5], -1))

        u5 = _crop_like(_UpConv(dp[2], self.dtype,
                                2 in self.s2d_up_levels)(i6), c4)
        i5 = _IConv(dp[2], self.dtype,
                    2 in s2d_i, 2 in wg_i)(jnp.concatenate([u5, c4], -1))

        u4 = _crop_like(_UpConv(dp[3], self.dtype,
                                3 in self.s2d_up_levels)(i5), c3)
        i4 = _IConv(dp[3], self.dtype,
                    3 in s2d_i, 3 in wg_i)(jnp.concatenate([u4, c3], -1))
        disp4 = disp_head(i4)

        u3 = _crop_like(_UpConv(dp[4], self.dtype,
                                4 in self.s2d_up_levels)(i4), c2)
        d4_up = _crop_like(_upsample2x(disp4), c2).astype(self.dtype)
        i3 = _IConv(dp[4], self.dtype,
                    4 in s2d_i, 4 in wg_i)(jnp.concatenate([u3, c2, d4_up], -1))
        disp3 = disp_head(i3)

        u2 = _crop_like(_UpConv(dp[5], self.dtype,
                                5 in self.s2d_up_levels)(i3), c1)
        d3_up = _crop_like(_upsample2x(disp3), c1).astype(self.dtype)
        i2 = _IConv(dp[5], self.dtype,
                    5 in s2d_i, 5 in wg_i)(jnp.concatenate([u2, c1, d3_up], -1))
        disp2 = disp_head(i2)

        u1 = _crop_like(_UpConv(dp[6], self.dtype,
                                6 in self.s2d_up_levels)(i2), x)
        d2_up = _crop_like(_upsample2x(disp2), x).astype(self.dtype)
        i1 = _IConv(dp[6], self.dtype,
                    6 in s2d_i, 6 in wg_i)(jnp.concatenate([u1, d2_up], -1))
        disp1 = disp_head(i1)

        return disp1, disp2, disp3, disp4
