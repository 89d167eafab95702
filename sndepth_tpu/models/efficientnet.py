"""EfficientNet feature encoder (TPU-native, NHWC, Flax).

BatchNorm epsilon is 1e-3 (the TF default baked into ``tf_efficientnet``
checkpoints) — required for converted-weight parity.

Replaces the reference's hub-downloaded ``tf_efficientnet_b5_ap``
(`/root/reference/submodules/encoder.py:6-30`), which strips the classifier
and returns every intermediate block output. Here the network is built from
scratch (MBConv + squeeze-excitation), with the B5 scaling
(width x1.6, depth x2.2): stage channels (24, 40, 64, 128, 176, 304, 512),
stage depths (3, 5, 5, 7, 7, 9, 3), stem 48, head 2048.

Returns the feature dict the normal decoder consumes — equivalent to the
reference's features[4]/[5]/[6]/[8]/[11] indexing (stage outputs at 1/2,
1/4, 1/8 res plus stage-4 at 1/16 and the conv head at 1/32).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from sndepth_tpu.ops.norm import BatchNorm

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    in_ch: int
    out_ch: int
    kernel: int
    stride: int
    expand: int
    repeats: int
    se_ratio: float = 0.25


def _round_filters(ch: int, width_mult: float, divisor: int = 8) -> int:
    ch *= width_mult
    new_ch = max(divisor, int(ch + divisor / 2) // divisor * divisor)
    if new_ch < 0.9 * ch:
        new_ch += divisor
    return int(new_ch)


def _round_repeats(r: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * r))


def b5_blocks() -> tuple[BlockSpec, ...]:
    base = [  # (in, out, k, stride, expand, repeats) — B0 plan
        (32, 16, 3, 1, 1, 1),
        (16, 24, 3, 2, 6, 2),
        (24, 40, 5, 2, 6, 2),
        (40, 80, 3, 2, 6, 3),
        (80, 112, 5, 1, 6, 3),
        (112, 192, 5, 2, 6, 4),
        (192, 320, 3, 1, 6, 1),
    ]
    w, d = 1.6, 2.2
    return tuple(
        BlockSpec(_round_filters(i, w), _round_filters(o, w), k, s, e,
                  _round_repeats(r, d))
        for i, o, k, s, e, r in base)


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: Any

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype)(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype)(s)
        return x * nn.sigmoid(s)


class ShiftDepthwise(nn.Module):
    """Depthwise KxK 'SAME' conv evaluated as K*K shifted multiply-adds.

    Identical params to ``nn.Conv(ch, (K, K), strides, padding='SAME',
    feature_group_count=ch, use_bias=False)`` (kernel (K, K, 1, ch)). A
    depthwise conv does no channel contraction, so it never belongs on the
    MXU; expressing it as strided-slice FMAs keeps it a pure VPU/fusion op
    and sidesteps whatever grouped-conv lowering XLA picks. Exactness
    tested in tests/test_nnet.py.
    """
    features: int
    kernel: int
    stride: int
    dtype: Any

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k, s = self.kernel, self.stride
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, 1, self.features))
        b_, h, wd, c = x.shape
        ho, wo = -(-h // s), -(-wd // s)
        pad_h = max((ho - 1) * s + k - h, 0)
        pad_w = max((wo - 1) * s + k - wd, 0)
        xp = jnp.pad(x.astype(self.dtype),
                     ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                      (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
        wdt = w.astype(self.dtype)
        # accumulate in f32 like the conv lowering (MXU/conv accumulators
        # are f32 even for bf16 inputs); products stay in compute dtype
        out = jnp.zeros((b_, ho, wo, c), jnp.float32)
        for u in range(k):
            for v in range(k):
                sl = jax.lax.slice(
                    xp, (0, u, v, 0),
                    (b_, u + (ho - 1) * s + 1, v + (wo - 1) * s + 1, c),
                    (1, s, s, 1))
                out = out + (sl * wdt[u, v, 0]).astype(jnp.float32)
        return out.astype(self.dtype)


class MBConv(nn.Module):
    spec: BlockSpec
    stride: int
    in_ch: int
    dtype: Any
    shift_depthwise: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        s = self.spec
        residual = x
        mid = self.in_ch * s.expand
        h = x
        n_conv = 0
        if s.expand != 1:
            h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="Conv_0")(h)
            n_conv = 1
            h = BatchNorm(use_running_average=not train, epsilon=1e-3,
                             dtype=self.dtype)(h)
            h = nn.silu(h)
        if self.shift_depthwise:
            # Same param name as the nn.Conv branch (checkpoint-exact).
            h = ShiftDepthwise(mid, s.kernel, self.stride, self.dtype,
                               name=f"Conv_{n_conv}")(h)
        else:
            h = nn.Conv(mid, (s.kernel, s.kernel),
                        strides=(self.stride,) * 2, padding="SAME",
                        feature_group_count=mid, use_bias=False,
                        dtype=self.dtype, name=f"Conv_{n_conv}")(h)
        h = BatchNorm(use_running_average=not train, epsilon=1e-3,
                         dtype=self.dtype)(h)
        h = nn.silu(h)
        h = SqueezeExcite(max(1, int(self.in_ch * s.se_ratio)),
                          self.dtype)(h)
        h = nn.Conv(s.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name=f"Conv_{n_conv + 1}")(h)
        h = BatchNorm(use_running_average=not train, epsilon=1e-3,
                         dtype=self.dtype)(h)
        if self.stride == 1 and self.in_ch == s.out_ch:
            h = h + residual
        return h


class EfficientNetEncoder(nn.Module):
    """EfficientNet-B5 feature pyramid. Input NHWC; output dict of features:
    ``stem`` (1/2), ``stage0``..``stage6``, ``head`` (2048ch, 1/32)."""

    blocks: Sequence[BlockSpec] = dataclasses.field(default_factory=b5_blocks)
    stem_ch: int = 48       # _round_filters(32, 1.6)
    head_ch: int = 2048     # _round_filters(1280, 1.6)
    dtype: Any = jnp.float32
    # Evaluate depthwise convs as shifted FMAs (see ShiftDepthwise);
    # param-tree-identical, off until A/B'd on hardware.
    shift_depthwise: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> dict:
        x = x.astype(self.dtype)
        feats: dict[str, Array] = {}
        h = nn.Conv(self.stem_ch, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        h = BatchNorm(use_running_average=not train, epsilon=1e-3,
                         dtype=self.dtype)(h)
        h = nn.silu(h)
        feats["stem"] = h

        in_ch = self.stem_ch
        for si, spec in enumerate(self.blocks):
            for ri in range(spec.repeats):
                stride = spec.stride if ri == 0 else 1
                h = MBConv(spec, stride, in_ch, self.dtype,
                           self.shift_depthwise,
                           name=f"stage{si}_block{ri}")(h, train)
                in_ch = spec.out_ch
            feats[f"stage{si}"] = h

        h = nn.Conv(self.head_ch, (1, 1), use_bias=False,
                    dtype=self.dtype)(h)
        h = BatchNorm(use_running_average=not train, epsilon=1e-3,
                         dtype=self.dtype)(h)
        h = nn.silu(h)
        feats["head"] = h
        return feats


# The feature keys the normal decoder consumes, mirroring the reference's
# features[4]/[5]/[6]/[8]/[11] selection (`submodules/decoder.py:60`).
DECODER_FEATURE_KEYS = ("stage0", "stage1", "stage2", "stage4", "head")
