"""Surface-normal decoder with uncertainty-guided point refinement (NHWC).

Re-design of the reference decoder (`/root/reference/submodules/decoder.py`)
and its submodules (`/root/reference/submodules/submodules.py`):

* ``UpSample`` skip blocks with GroupNorm + weight-standardized convs (the
  "GN" architecture, reference default) or BatchNorm ("BN");
* 4-channel heads (normal xyz + kappa) at 1/8, 1/4, 1/2, 1/1 resolution,
  normalized by :func:`norm_normalize` (L2 + ELU kappa, min 0.01);
* train mode refines only a sampled subset of points per scale
  (importance = lowest-kappa by top-k, coverage = uniform) through a shared
  pointwise MLP; test mode runs the MLP densely.

TPU-first notes: the reference's per-sample python loops + ``grid_sample``
at *exact integer* coordinates (`decoder.py:92-101`) reduce to pure gathers
and one scatter per scale — both static-shape, so the whole train path jits.
The sample count is a static function of (H, W, sampling_ratio): no dynamic
shapes. The reference sorts the full uncertainty map; we use ``top_k`` for
the importance set and a random permutation for coverage, which matches its
distribution without a full sort.
"""

from __future__ import annotations

import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from sndepth_tpu.ops.norm import BlockedGroupNorm
from sndepth_tpu.ops.resize import resize_bilinear_align_corners

Array = jax.Array

MIN_KAPPA = 0.01

# Point-sampling backend: "exact" (full top_k sort + permutation — the
# reference-faithful split), "approx" (TPU-native approx_max_k for the
# importance set + stratified-uniform coverage via approx_max_k over
# random keys; O(n) instead of O(n log n) full sorts — the 4 sorts were
# ~10 ms of the measured 198 ms NNET train step), "auto" = approx on
# TPU, exact elsewhere. The sampled sets differ per draw from the exact
# backend (selection machinery only, not a numeric op), with the same
# importance/coverage semantics.
_SAMPLE = os.environ.get("SNDEPTH_NNET_SAMPLE", "auto")


def _use_approx_sampling() -> bool:
    if _SAMPLE == "exact":
        return False
    if _SAMPLE == "approx":
        return True
    return jax.default_backend() in ("tpu", "axon")


def norm_normalize(out: Array) -> Array:
    """L2-normalize xyz; kappa -> elu(kappa)+1+0.01 (`submodules.py:64-70`).

    out: (..., 4)."""
    xyz, kappa = out[..., :3], out[..., 3:]
    norm = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1, keepdims=True)) + 1e-10
    kappa = nn.elu(kappa) + 1.0 + MIN_KAPPA
    return jnp.concatenate([xyz / norm, kappa], axis=-1)


def sample_points(rng: Array, init_normal: Array,
                  gt_norm_mask: Array | None, sampling_ratio: float,
                  beta: float) -> tuple[Array, Array]:
    """Uncertainty-guided point sampling (`submodules.py:75-140`).

    init_normal: (B, H, W, 4). Returns (rows, cols) int32 of shape (B, N)
    with N = int(sampling_ratio * H * W): the ``int(beta*N)`` least-confident
    points (lowest kappa / masked-out excluded) plus uniform coverage
    samples from the remainder.
    """
    b, h, w, _ = init_normal.shape
    n = int(sampling_ratio * h * w)
    n_imp = int(beta * n)
    n_cov = n - n_imp

    uncertainty = -init_normal[..., 3].reshape(b, h * w)
    if gt_norm_mask is not None:
        mask = resize_nearest(gt_norm_mask.astype(jnp.float32), h, w)
        invalid = mask.reshape(b, h * w) < 0.5
        uncertainty = jnp.where(invalid, -1e4, uncertainty)

    if _use_approx_sampling():
        # O(n) TPU path: approx_max_k for the importance set; coverage =
        # approx_max_k over uniform random keys with importance masked
        # out (a stratified uniform-without-replacement sample over the
        # remainder — same coverage role as the reference's permutation).
        _, importance = jax.lax.approx_max_k(uncertainty, n_imp)
        if n_cov > 0:
            key = jax.random.uniform(rng, (b, h * w))
            bidx = jnp.broadcast_to(jnp.arange(b)[:, None],
                                    importance.shape)
            key = key.at[bidx, importance].set(-1.0)
            _, coverage = jax.lax.approx_max_k(key, n_cov)
            samples = jnp.concatenate([importance, coverage], axis=1)
        else:
            samples = importance
        return samples // w, samples % w

    # Descending sort of all positions; topk(HW) is a full sort but keeps
    # the importance/remainder split identical to the reference.
    _, idx_sorted = jax.lax.top_k(uncertainty, h * w)
    importance = idx_sorted[:, :n_imp]
    remaining = idx_sorted[:, n_imp:]

    def pick_coverage(key, rem):
        perm = jax.random.permutation(key, rem.shape[0])
        return rem[perm[:n_cov]]

    if n_cov > 0:
        keys = jax.random.split(rng, b)
        coverage = jax.vmap(pick_coverage)(keys, remaining)
        samples = jnp.concatenate([importance, coverage], axis=1)
    else:
        samples = importance

    return samples // w, samples % w


def resize_nearest(x: Array, h: int, w: int) -> Array:
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]),
                            method="nearest")


def gather_points(feat: Array, rows: Array, cols: Array) -> Array:
    """feat: (B, H, W, C); rows/cols: (B, N) -> (B, N, C).

    Equivalent to the reference's ``grid_sample(..., align_corners=True)``
    at exactly-integer normalized coordinates (`decoder.py:92-93`)."""
    bidx = jnp.arange(feat.shape[0])[:, None]
    return feat[bidx, rows, cols]


def scatter_points(base: Array, rows: Array, cols: Array,
                   values: Array) -> Array:
    """Write per-point predictions back into the dense map
    (`decoder.py:100-101`)."""
    bidx = jnp.broadcast_to(jnp.arange(base.shape[0])[:, None], rows.shape)
    return base.at[bidx, rows, cols].set(values)


class WSConv(nn.Module):
    """3x3 conv with weight standardization (`submodules.py:46-60`):
    kernel is mean-centred and divided by its per-output-channel std
    (Bessel-corrected, +1e-5), computed at apply time.

    ``__call__`` accepts either one input or a *sequence* of inputs that
    are conceptually concatenated on channels: the kernel (standardized
    over its FULL extent, exactly as for the concatenated input) is
    sliced per piece and the partial convs are summed — same math,
    without ever materializing the concat (the skip concats were a
    9.4 ms/step block of the NNET train trace)."""
    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Array:
        xs = x if isinstance(x, (list, tuple)) else [x]
        in_ch = sum(p.shape[-1] for p in xs)
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, in_ch, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        centred = w - mean
        var = jnp.var(centred, axis=(0, 1, 2), keepdims=True)
        n = self.kernel * self.kernel * in_ch
        std = jnp.sqrt(var * n / (n - 1))
        w_std = centred / (std + 1e-5)
        y = None
        c0 = 0
        for p in xs:
            c1 = c0 + p.shape[-1]
            part = jax.lax.conv_general_dilated(
                p.astype(self.dtype),
                w_std[:, :, c0:c1].astype(self.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = part if y is None else y + part
            c0 = c1
        return y + b.astype(self.dtype)


class UpSampleBlock(nn.Module):
    """Bilinear (align-corners) upsample to the skip's size, concat, then
    two conv+norm+leaky-relu stages (`submodules.py:10-42`)."""
    features: int
    architecture: str = "GN"   # reference default (`baseline.py:118`)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, skip: Array, train: bool = False) -> Array:
        up = resize_bilinear_align_corners(x, skip.shape[1], skip.shape[2])
        # The concat consumer is the first conv; hand it the pieces so
        # the concatenated tensor is never materialized (WSConv slices
        # its full-extent-standardized kernel per piece — same math).
        h = (up, skip.astype(up.dtype))
        for i in range(2):
            if self.architecture == "GN":
                h = WSConv(self.features, dtype=self.dtype)(h)
                # BlockedGroupNorm == nn.GroupNorm (tests/test_norm.py)
                # without the 5D activation view that relayouts the whole
                # tensor when C//g isn't a lane multiple (C=128, g=8 ->
                # 16-lane reduces). Scope name pinned for checkpoints.
                h = BlockedGroupNorm(num_groups=8, dtype=self.dtype,
                                     name=f"GroupNorm_{i}")(h)
            else:
                if isinstance(h, tuple):
                    h = jnp.concatenate(h, axis=-1)
                h = nn.Conv(self.features, (3, 3), padding="SAME",
                            dtype=self.dtype)(h)
                h = nn.BatchNorm(use_running_average=not train,
                                 dtype=self.dtype)(h)
            h = nn.leaky_relu(h, 0.01)
        return h


class PointMLP(nn.Module):
    """Shared pointwise refinement head: three Dense+ReLU then Dense->4
    (the reference's Conv1d(k=1) stacks, `decoder.py:36-57`). Applies to
    either (B, N, C) sampled points or (B, H, W, C) dense maps."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = x.astype(self.dtype)
        for _ in range(3):
            h = nn.Dense(128, dtype=self.dtype)(h)
            h = nn.relu(h)
        return nn.Dense(4, dtype=jnp.float32)(h.astype(jnp.float32))


def selection_mask(rows: Array, cols: Array, h: int, w: int) -> Array:
    """(B, N) sampled coordinates -> (B, h, w) float32 {0,1} mask."""
    b = rows.shape[0]
    flat = rows * w + cols
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], flat.shape)
    mask = jnp.zeros((b, h * w), jnp.float32)
    return mask.at[bidx, flat].set(1.0).reshape(b, h, w)


class NormalDecoder(nn.Module):
    """Outputs a list of (B, h_s, w_s, 4) normal+kappa maps at 1/8, 1/4,
    1/2, 1/1 of the *encoder input* resolution, plus per-scale sampled
    predictions and sample indices in train mode.

    ``dense_refine`` (default, TPU-first): train mode evaluates the
    pointwise refinement MLP DENSELY and selects with the sampling mask —
    numerically identical to the reference's gather -> per-point MLP ->
    scatter (the MLP is pointwise, so dense evaluation produces the same
    values at the sampled coordinates), but the (B,N,C) feature gathers,
    the (B,H,W,4) scatter and their transposed scatters in the backward
    disappear; the MXU eats the extra pointwise FLOPs for ~free. XProf on
    the gather form at batch 4: ~100 ms/step of gather/scatter/copy
    fusions vs <2 ms of dense MLP matmuls. With dense_refine the
    per-scale return is (pred_map, selection_mask) instead of
    ((B,N,4) points, (rows, cols))."""
    sampling_ratio: float = 0.4
    importance_ratio: float = 0.7
    architecture: str = "GN"
    dense_refine: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: dict, *, gt_norm_mask: Array | None = None,
                 mode: str = "test", rng: Array | None = None,
                 train_norm: bool = False):
        f0, f1, f2, f3, f4 = (features["stage0"], features["stage1"],
                              features["stage2"], features["stage4"],
                              features["head"])
        x_d0 = nn.Conv(2048, (1, 1), dtype=self.dtype)(
            f4.astype(self.dtype))
        x_d1 = UpSampleBlock(1024, self.architecture, self.dtype)(
            x_d0, f3, train_norm)
        x_d2 = UpSampleBlock(512, self.architecture, self.dtype)(
            x_d1, f2, train_norm)
        x_d3 = UpSampleBlock(256, self.architecture, self.dtype)(
            x_d2, f1, train_norm)
        x_d4 = UpSampleBlock(128, self.architecture, self.dtype)(
            x_d3, f0, train_norm)

        out_res8 = norm_normalize(
            nn.Conv(4, (3, 3), padding="SAME", dtype=jnp.float32)(
                x_d2.astype(jnp.float32)))

        mlps = [PointMLP(self.dtype, name=f"out_conv_res{r}")
                for r in (4, 2, 1)]
        feat_maps = [x_d2, x_d3, x_d4]

        outs = [out_res8]
        sampled_preds = [out_res8]
        sampled_idx = [None]
        prev = out_res8

        if mode == "train":
            assert rng is not None, "train mode needs an rng"
            rngs = jax.random.split(rng, 3)

        for level in range(3):
            up = resize_bilinear_align_corners(
                prev, 2 * prev.shape[1], 2 * prev.shape[2])
            if mode == "train":
                rows, cols = sample_points(
                    rngs[level], jax.lax.stop_gradient(up), gt_norm_mask,
                    self.sampling_ratio, self.importance_ratio)
                if self.dense_refine:
                    sel = selection_mask(rows, cols, up.shape[1],
                                         up.shape[2])
                    feat_up = resize_bilinear_align_corners(
                        feat_maps[level], up.shape[1], up.shape[2])
                    pred = norm_normalize(mlps[level](
                        jnp.concatenate([feat_up, up], axis=-1)))
                    out = jnp.where(sel[..., None] > 0.5, pred, up)
                    sampled_preds.append(pred)
                    sampled_idx.append(sel)
                else:
                    feat_pts = gather_points(
                        resize_bilinear_align_corners(
                            feat_maps[level], up.shape[1], up.shape[2]),
                        rows, cols)
                    init_pts = gather_points(up, rows, cols)
                    pred = norm_normalize(mlps[level](
                        jnp.concatenate([feat_pts, init_pts], axis=-1)))
                    out = scatter_points(up, rows, cols, pred)
                    sampled_preds.append(pred)
                    sampled_idx.append((rows, cols))
            else:
                feat_up = resize_bilinear_align_corners(
                    feat_maps[level], up.shape[1], up.shape[2])
                dense_in = jnp.concatenate([feat_up, up], axis=-1)
                out = norm_normalize(mlps[level](dense_in))
                sampled_preds.append(None)
                sampled_idx.append(None)
            outs.append(out)
            prev = out

        return outs, sampled_preds, sampled_idx
