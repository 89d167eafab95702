"""NNET: depth <-> normal mutual refinement (TPU-native, NHWC).

Re-design of the reference orchestrator `NNET.forward`
(`/root/reference/models/baseline.py:274-583`): an EfficientNet-B5 encoder +
uncertainty decoder produce an initial normal map; a least-squares D2N
module converts depth->normals; an N2D module converts normals->depth; a
Canny-edge-guided propagation refines both.

Everything is one jittable graph. The reference's per-batch CPU round trips
(cv2 Canny `baseline.py:550`, ``torch.det`` on CPU `baseline.py:416`) and its
per-call reload of pretrained weights (`baseline.py:288-299`) are all gone.

Documented behavioral divergences (defect fixes, see SURVEY.md §7):
* patches are extracted over the spatial dims of the NHWC maps — the
  reference's ``F.unfold`` on a channels-last tensor scrambles axes;
* edge propagation actually iterates (the reference's loop overwrites its
  input, so its 4 rounds collapse to 1 — `baseline.py:574-579`);
* no hardcoded batch size 4 / ``cuda:1`` pinning.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from sndepth_tpu.models.efficientnet import EfficientNetEncoder
from sndepth_tpu.models.normal_decoder import NormalDecoder
from sndepth_tpu.ops.edges import propagate
from sndepth_tpu.ops.patches import extract_patches_tap_last

Array = jax.Array

# ImageNet BGR mean the reference adds during preprocessing
# (`baseline.py:128,263-272`).
MEAN_BGR = (104.008, 116.669, 122.675)

K = 9          # patch size (`baseline.py:133`)
RATE = 4       # patch dilation (`baseline.py:134`)
THRESH = 0.95  # normal-agreement validity threshold (`baseline.py:135`)


def bgr_preprocess(rgb: Array) -> Array:
    """RGB (any float range matching training) -> BGR + ImageNet mean
    (`baseline.py:263-272`)."""
    bgr = rgb[..., ::-1]
    return bgr + jnp.asarray(MEAN_BGR, rgb.dtype)


def camera_grid(batch: int, height: int, width: int,
                dtype=jnp.float32) -> Array:
    """Normalized camera-ray grid: x in [-0.6, 0.6], y in [-0.4, 0.4], z=1
    (`baseline.py:308-316`)."""
    x = jnp.linspace(-0.6, 0.6, width, dtype=dtype)
    y = jnp.linspace(-0.4, 0.4, height, dtype=dtype)
    xg = jnp.broadcast_to(x[None, :], (height, width))
    yg = jnp.broadcast_to(y[:, None], (height, width))
    grid = jnp.stack([xg, yg, jnp.ones_like(xg)], axis=-1)
    return jnp.broadcast_to(grid[None], (batch, height, width, 3))


def _solve3x3(ata: Array, atb: Array) -> Array:
    """Batched closed-form 3x3 solve via explicit cofactors — pure
    elementwise math that XLA fuses; replaces the reference's CPU
    ``torch.det`` + ``inverse`` (`baseline.py:416,433`). ``jnp.linalg.solve``
    would lower to XLA's LuDecompositionBlock custom-call, which measured
    84 ms per (4,128,416,3,3) call on v5e — 73% of the whole fused
    GeoNet+NNET inference pipeline. Singular systems (det <= 1e-5) fall
    back to the identity system like the reference (`baseline.py:417-430`).
    """
    b = atb[..., 0]

    def m(i, j):
        return ata[..., i, j]

    c00 = m(1, 1) * m(2, 2) - m(1, 2) * m(2, 1)
    c01 = m(1, 2) * m(2, 0) - m(1, 0) * m(2, 2)
    c02 = m(1, 0) * m(2, 1) - m(1, 1) * m(2, 0)
    c10 = m(0, 2) * m(2, 1) - m(0, 1) * m(2, 2)
    c11 = m(0, 0) * m(2, 2) - m(0, 2) * m(2, 0)
    c12 = m(0, 1) * m(2, 0) - m(0, 0) * m(2, 1)
    c20 = m(0, 1) * m(1, 2) - m(0, 2) * m(1, 1)
    c21 = m(0, 2) * m(1, 0) - m(0, 0) * m(1, 2)
    c22 = m(0, 0) * m(1, 1) - m(0, 1) * m(1, 0)
    det = m(0, 0) * c00 + m(0, 1) * c01 + m(0, 2) * c02

    # x = adj(A) @ b / det; adj[i, j] = C[j, i].
    x = jnp.stack([
        c00 * b[..., 0] + c10 * b[..., 1] + c20 * b[..., 2],
        c01 * b[..., 0] + c11 * b[..., 1] + c21 * b[..., 2],
        c02 * b[..., 0] + c12 * b[..., 1] + c22 * b[..., 2],
    ], axis=-1)
    ok = det > 1e-5
    x = jnp.where(ok[..., None],
                  x / jnp.where(ok, det, 1.0)[..., None], b)
    return x[..., None]


def d2n_least_squares(pre_norm: Array, points: Array) -> tuple[Array, Array, Array]:
    """Depth->normal least-squares fit over k=9 dil=4 neighborhoods
    (`baseline.py:350-446`).

    pre_norm: (B, H, W, 3) unit normals; points: (B, H, W, 3) 3-D points.
    Returns (normals*10, angle, point_patches) where angle (B, H, W, 81) is
    the per-tap agreement used again by N2D, and point_patches is in the
    TPU-preferred (B, H, W, 3, 81) taps-last layout.
    """
    norm_patches = extract_patches_tap_last(pre_norm, K, RATE)  # B,H,W,3,81
    angle = jnp.einsum("bhwct,bhwc->bhwt", norm_patches, pre_norm)
    valid = (angle > THRESH)[:, :, :, None, :]                  # B,H,W,1,81

    point_patches = extract_patches_tap_last(points, K, RATE)   # B,H,W,3,81
    a = jnp.where(valid, point_patches, 0.0)
    ata = jnp.einsum("bhwit,bhwjt->bhwij", a, a)                # 3x3
    atb = jnp.sum(a, axis=-1)[..., None]                        # A^T @ 1
    n = _solve3x3(ata, atb)[..., 0]                             # B,H,W,3
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)
    return n * 10.0, angle, point_patches


def n2d_depth(pre_norm: Array, grid: Array, angle: Array,
              point_patches: Array) -> Array:
    """Normal->depth re-estimation (`baseline.py:495-524`). Returns
    (B, H, W, 1) clamped to [0, 10]. angle: (B, H, W, 81);
    point_patches: (B, H, W, 3, 81)."""
    norm_patches = extract_patches_tap_last(pre_norm, K, RATE)
    grid_patches = extract_patches_tap_last(grid, K, RATE)
    depth_taps = point_patches[:, :, :, 2, :]                  # B,H,W,81

    lower_m = jnp.einsum("bhwct,bhwc->bhwt", norm_patches, grid)
    cond = lower_m > 1e-5
    lower = jnp.where(cond, 1.0 / jnp.where(cond, lower_m, 1.0), 1.0)
    valid_angle = jnp.where(cond, angle, 0.0)
    upper = jnp.sum(norm_patches * grid_patches, axis=3)       # B,H,W,81
    est_depth = lower * upper * depth_taps

    weight = valid_angle / (jnp.sum(valid_angle, axis=-1,
                                    keepdims=True) + 1e-5)
    depth = jnp.sum(est_depth * weight, axis=-1)
    return jnp.clip(depth, 0.0, 10.0)[..., None]


class _ConvStack(nn.Module):
    plan: tuple   # sequence of (features, kernel, dilation, relu)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = x.astype(self.dtype)
        for features, kernel, dil, relu in self.plan:
            h = nn.Conv(features, (kernel, kernel),
                        kernel_dilation=(dil, dil), padding="SAME",
                        dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform())(h)
            if relu:
                h = nn.relu(h)
        return h


class NNETRefiner(nn.Module):
    """The D2N noise/fusion CNNs + N2D fusion CNN + edge-weight CNN and the
    propagation stage (`baseline.py:137-203` parameter inventory)."""
    dtype: Any = jnp.float32
    propagation_rounds: int = 4

    @nn.compact
    def __call__(self, pre_depth_log2: Array, rgb_model_input: Array,
                 init_norm: Array, edge_inputs: Array, canny: Array
                 ) -> tuple[Array, Array]:
        """pre_depth_log2: (B, H, W) log2-depth; rgb_model_input: (B, H, W, 3)
        BGR+mean images; init_norm: (B, H, W, 3) decoder normals;
        edge_inputs: (B, H, W, 4); canny: (B, H, W, 1).
        Returns (normals (B,H,W,3), depth (B,H,W,1))."""
        b, h, w = pre_depth_log2.shape
        grid = camera_grid(b, h, w, jnp.float32)
        exp_depth = jnp.exp2(pre_depth_log2)[..., None]        # 2^d
        points = grid * exp_depth

        # --- D2N ---
        norm_scale, angle, point_patches = d2n_least_squares(
            init_norm, points)

        noise = _ConvStack(((64, 3, 1, True), (64, 3, 1, True)),
                           self.dtype, name="noise_enc1")(norm_scale)
        noise = nn.max_pool(noise, (3, 3), strides=(2, 2), padding="SAME")
        noise = _ConvStack(((128, 3, 1, True), (128, 3, 1, True),
                            (256, 3, 1, True), (256, 3, 1, True),
                            (512, 1, 1, True), (3, 3, 1, False)),
                           self.dtype, name="noise_enc2")(noise)
        noise_up = jax.image.resize(noise.astype(jnp.float32),
                                    (b, h, w, 3), method="nearest")
        sum_norm = norm_scale * 0.1 + noise_up
        norm_pred_noise = sum_norm / (
            jnp.linalg.norm(sum_norm, axis=-1, keepdims=True) + 1e-12)

        fuse_in = jnp.concatenate(
            [init_norm, norm_pred_noise,
             rgb_model_input.astype(jnp.float32) / 255.0], axis=-1)
        norm_final = _ConvStack(
            ((128, 3, 2, True), (128, 3, 2, True), (128, 3, 1, True),
             (128, 3, 1, True), (3, 3, 1, False)),
            self.dtype, name="norm_fusion")(fuse_in)
        norm_final = norm_final / (
            jnp.linalg.norm(norm_final, axis=-1, keepdims=True) + 1e-12)

        # --- N2D ---
        depth_stage1 = n2d_depth(init_norm, grid, angle, point_patches)
        depth_in = jnp.concatenate(
            [depth_stage1, exp_depth,
             rgb_model_input.astype(jnp.float32) / 255.0], axis=-1)
        depth_final = _ConvStack(
            ((128, 3, 2, True),) * 6 + ((1, 3, 1, False),),
            self.dtype, name="depth_fusion")(depth_in)

        # --- Edge-guided propagation ---
        edge_feat = _ConvStack(((32, 3, 2, False),) * 3 +
                               ((32, 3, 1, False),) * 3,
                               self.dtype, name="edge_encoder")(edge_inputs)
        edge_w = _ConvStack(((8, 3, 1, False),), self.dtype,
                            name="edge_weight")(edge_feat)
        edges_all = jnp.clip(edge_w + canny, 0.0, 1.0)
        dlr, drl, dud, ddu, nlr, nrl, nud, ndu = jnp.split(edges_all, 8, -1)

        for _ in range(self.propagation_rounds):
            depth_final = propagate(depth_final, dlr, drl, dud, ddu)
        for _ in range(self.propagation_rounds):
            norm_final = propagate(norm_final, nlr, nrl, nud, ndu)
            norm_final = norm_final / (
                jnp.linalg.norm(norm_final, axis=-1, keepdims=True) + 1e-12)

        return norm_final, depth_final


class NNET(nn.Module):
    """Full normal/depth refinement pipeline: encoder -> decoder -> refiner
    (`baseline.py:274-583`). Input ``rgb`` is the RGB image in the
    training-value range; ``pre_depth_log2`` comes from GeoNet disparity
    (log2-depth, `baseline.py:383`); ``edge_inputs``/``canny`` come from
    :func:`sndepth_tpu.ops.edges.edge_model_inputs` (precomputable)."""
    sampling_ratio: float = 0.4
    importance_ratio: float = 0.7
    architecture: str = "GN"
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = EfficientNetEncoder(dtype=self.dtype)
        self.decoder = NormalDecoder(
            sampling_ratio=self.sampling_ratio,
            importance_ratio=self.importance_ratio,
            architecture=self.architecture, dtype=self.dtype)
        self.refiner = NNETRefiner(dtype=self.dtype)

    def __call__(self, pre_depth_log2: Array, rgb: Array,
                 edge_inputs: Array, canny: Array, *,
                 mode: str = "test", gt_norm_mask: Array | None = None,
                 rng: Array | None = None):
        model_in = bgr_preprocess(rgb)
        feats = self.encoder(model_in / 255.0, train=False)
        norm_outs, sampled, idx = self.decoder(
            feats, gt_norm_mask=gt_norm_mask, mode=mode, rng=rng)
        init_norm = norm_outs[-1][..., :3]
        norm_final, depth_final = self.refiner(
            pre_depth_log2, model_in, init_norm, edge_inputs, canny)
        return norm_final, depth_final, (norm_outs, sampled, idx)
