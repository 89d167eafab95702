"""Motion segmentation nets (TPU-native, NHWC).

Re-design of the reference family:
* residual-unit factory: `/root/reference/utils/motion_split/build_unit.py`
  — four unit shapes (identity bottleneck; strided projection; dual-dilated
  branch; dual-dilated branch + projection) collapsed here into one
  parametric :class:`ResidualUnit`;
* flow tower: `/root/reference/models/MotionFeatureNet.py:7-49` (-> 512 ch
  at 1/16 res);
* RGB tower: `/root/reference/models/SemanticFeatureNet.py:7-60` (-> 2048 ch
  at 1/16 res; the reference defines a ``layer4`` it never calls in
  ``forward`` — omitted here for that reason);
* fusion head: `/root/reference/models/MotionFusionNet.py:10-61` (concat ->
  8 residual units -> 1x1 -> 16x ConvTranspose -> 3-class logits).

BatchNorm runs through flax's ``batch_stats`` collection; the train step
threads it explicitly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

_kaiming = nn.initializers.variance_scaling(2.0, "fan_out",
                                            "truncated_normal")


@dataclasses.dataclass(frozen=True)
class UnitSpec:
    """One residual unit. ``branch_dilations=None`` -> plain bottleneck;
    otherwise a dual-dilated 3x3 branch pair with ``branch_width`` total
    channels. ``project`` adds a 1x1(+BN) shortcut; ``project_relu`` matches
    the reference type-2 unit whose shortcut includes a ReLU."""
    in_ch: int
    mid_ch: int
    out_ch: int
    stride: int = 1
    branch_width: int = 0
    branch_dilations: tuple[int, int] | None = None
    project: bool = False
    project_relu: bool = False


def _cbr(x: Array, features: int, kernel: int, stride: int, dilation: int,
         dtype, train: bool, relu: bool = True) -> Array:
    x = nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                kernel_dilation=(dilation, dilation), padding="SAME",
                dtype=dtype, kernel_init=_kaiming)(x)
    x = nn.BatchNorm(use_running_average=not train, dtype=dtype)(x)
    return nn.relu(x) if relu else x


class ResidualUnit(nn.Module):
    spec: UnitSpec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        s = self.spec
        if s.branch_dilations is None:
            h = _cbr(x, s.mid_ch, 1, s.stride, 1, self.dtype, train)
            h = _cbr(h, s.mid_ch, 3, 1, 1, self.dtype, train)
            h = _cbr(h, s.out_ch, 1, 1, 1, self.dtype, train)
        else:
            h = _cbr(x, s.mid_ch, 1, s.stride, 1, self.dtype, train)
            p, d = s.branch_dilations
            b1 = _cbr(h, s.branch_width // 2, 3, 1, p, self.dtype, train)
            b2 = _cbr(h, s.branch_width // 2, 3, 1, d, self.dtype, train)
            h = jnp.concatenate([b1, b2], axis=-1)
            h = _cbr(h, s.out_ch, 1, 1, 1, self.dtype, train)

        if s.project:
            shortcut = _cbr(x, s.out_ch, 1, s.stride, 1, self.dtype, train,
                            relu=s.project_relu)
        else:
            shortcut = x
        return nn.relu(h + shortcut)


def _unit(*args, **kw) -> UnitSpec:
    return UnitSpec(*args, **kw)


# Tower plans transcribed from the reference option lists.
MOTION_UNITS: Sequence[UnitSpec] = (
    _unit(64, 64, 256, stride=1, project=True, project_relu=True),
    _unit(256, 64, 256),
    _unit(256, 64, 256),
    _unit(256, 256, 512, stride=2, project=True, project_relu=True),
    _unit(512, 128, 512),
    _unit(512, 256, 512, stride=2, project=True, project_relu=True),
)

SEMANTIC_UNITS: Sequence[UnitSpec] = (
    _unit(64, 64, 256, stride=1, project=True, project_relu=True),
    _unit(256, 64, 256),
    _unit(256, 64, 256),
    _unit(256, 256, 512, stride=2, project=True, project_relu=True),
    _unit(512, 128, 512),
    _unit(512, 128, 512),
    _unit(512, 128, 512, branch_width=64, branch_dilations=(1, 2)),
    _unit(512, 768, 1024, stride=2, project=True, project_relu=True),
    _unit(1024, 256, 1024),
    _unit(1024, 256, 1024, branch_width=256, branch_dilations=(1, 2)),
    _unit(1024, 256, 1024, branch_width=256, branch_dilations=(1, 4)),
    _unit(1024, 256, 1024, branch_width=256, branch_dilations=(1, 8)),
    _unit(1024, 256, 1024, branch_width=256, branch_dilations=(1, 16)),
    _unit(1024, 512, 2048, branch_width=256, branch_dilations=(2, 4),
          project=True),
    _unit(2048, 512, 2048, branch_width=512, branch_dilations=(2, 8)),
    _unit(2048, 512, 2048, branch_width=512, branch_dilations=(2, 16)),
)

FUSION_UNITS: Sequence[UnitSpec] = (
    _unit(2560, 128, 512, stride=1, project=True, project_relu=True),
    _unit(512, 128, 512),
    _unit(512, 128, 512),
    _unit(512, 256, 1024, branch_width=128, branch_dilations=(1, 2),
          project=True),
    _unit(1024, 256, 1024, branch_width=128, branch_dilations=(1, 4)),
    _unit(1024, 256, 1024, branch_width=128, branch_dilations=(1, 8)),
    _unit(1024, 512, 2048, branch_width=256, branch_dilations=(4, 16),
          project=True),
    _unit(2048, 512, 2048, branch_width=256, branch_dilations=(4, 16)),
)


class MotionFeatureNet(nn.Module):
    """Optical-flow-image tower -> 512 channels at 1/16 resolution."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow: Array, train: bool = False) -> Array:
        x = _cbr(flow.astype(self.dtype), 64, 3, 2, 1, self.dtype, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for spec in MOTION_UNITS:
            x = ResidualUnit(spec, self.dtype)(x, train)
        return x


class SemanticFeatureNet(nn.Module):
    """RGB tower -> 2048 channels at 1/16 resolution."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: Array, train: bool = False) -> Array:
        x = _cbr(image.astype(self.dtype), 32, 3, 1, 1, self.dtype, train)
        x = _cbr(x, 64, 7, 2, 1, self.dtype, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for spec in SEMANTIC_UNITS:
            x = ResidualUnit(spec, self.dtype)(x, train)
        return x


class _MatmulDeconv16(nn.Module):
    """nn.ConvTranspose(num_classes, (16, 16), strides=(16, 16)) evaluated
    as a matmul + 16x16 depth-to-space.

    With kernel == stride the transposed conv has no tap overlap:
    ``y[16i+a, 16j+b, co] = sum_ci x[i, j, ci] * k[a, b, ci, co] + bias``.
    XLA lowers the direct form as an lhs-dilated conv whose 16x16x2048-tap
    window is 99.6% zeros (14.8 dense TFLOP at 2% MXU lane occupancy in
    the census); the matmul form is 58 GFLOP at full occupancy and all
    three of its gradients are matmuls. Identical param tree; exactness
    tested in tests/test_motionseg.py.
    """
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c_in = x.shape
        k = self.param("kernel", _kaiming, (16, 16, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # flax ConvTranspose writes spatially *flipped* taps:
        # y[16i+a, .] = x[i] . k[15-a, .] (verified vs nn.ConvTranspose).
        kd = jnp.flip(k.astype(self.dtype), (0, 1))
        w_mat = jnp.transpose(kd, (2, 0, 1, 3)).reshape(
            c_in, 16 * 16 * self.features)
        y = (x.astype(self.dtype).reshape(b * h * w, c_in) @ w_mat)
        y = y.reshape(b, h, w, 16, 16, self.features)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
            b, 16 * h, 16 * w, self.features)
        return y + bias.astype(self.dtype)


class MotionFusionNet(nn.Module):
    """Full 3-class motion segmentation net. Inputs NHWC float in [0, 1]."""
    num_classes: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: Array, flow: Array, train: bool = False
                 ) -> Array:
        motion = MotionFeatureNet(self.dtype)(flow, train)
        semantic = SemanticFeatureNet(self.dtype)(image, train)
        x = jnp.concatenate([motion, semantic], axis=-1)
        for spec in FUSION_UNITS:
            x = ResidualUnit(spec, self.dtype)(x, train)
        x = _cbr(x, 2048, 1, 1, 1, self.dtype, train)
        x = _MatmulDeconv16(self.num_classes, jnp.float32,
                            name="ConvTranspose_0")(x.astype(jnp.float32))
        x = nn.BatchNorm(use_running_average=not train,
                         dtype=jnp.float32)(x)
        return x  # (B, H, W, num_classes) logits
