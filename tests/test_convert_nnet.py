"""Parity tests for the NNET (EfficientNet encoder + normal decoder)
checkpoint converters.

Tiny torch replicas follow the exact timm ``tf_efficientnet`` /
reference-decoder (`/root/reference/submodules/decoder.py`) module naming
and semantics (TF-SAME padding, BN eps 1e-3, weight-standardized convs,
align-corners upsampling), so the converted flax params must reproduce the
torch outputs on random weights.
"""

import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from sndepth_tpu.models.efficientnet import BlockSpec, EfficientNetEncoder
from sndepth_tpu.models.normal_decoder import NormalDecoder
from sndepth_tpu.utils.convert_weights import (convert_efficientnet,
                                               convert_normal_decoder)

torch.manual_seed(0)


def _pad_same(x, k, s):
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


class _ConvSame(tnn.Conv2d):
    def forward(self, x):
        x = _pad_same(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


class _SE(tnn.Module):
    def __init__(self, ch, reduced):
        super().__init__()
        self.conv_reduce = tnn.Conv2d(ch, reduced, 1)
        self.conv_expand = tnn.Conv2d(reduced, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = F.silu(self.conv_reduce(s))
        return x * torch.sigmoid(self.conv_expand(s))


class _DSBlock(tnn.Module):
    """timm DepthwiseSeparableConv (stage-0, expand==1)."""

    def __init__(self, in_ch, out_ch, k):
        super().__init__()
        self.conv_dw = _ConvSame(in_ch, in_ch, k, 1, groups=in_ch, bias=False)
        self.bn1 = tnn.BatchNorm2d(in_ch, eps=1e-3)
        self.se = _SE(in_ch, max(1, int(in_ch * 0.25)))
        self.conv_pw = tnn.Conv2d(in_ch, out_ch, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out_ch, eps=1e-3)
        self.has_res = in_ch == out_ch

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_dw(x)))
        h = self.se(h)
        h = self.bn2(self.conv_pw(h))
        return h + x if self.has_res else h


class _IRBlock(tnn.Module):
    """timm InvertedResidual."""

    def __init__(self, in_ch, out_ch, k, stride, expand):
        super().__init__()
        mid = in_ch * expand
        self.conv_pw = tnn.Conv2d(in_ch, mid, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid, eps=1e-3)
        self.conv_dw = _ConvSame(mid, mid, k, stride, groups=mid, bias=False)
        self.bn2 = tnn.BatchNorm2d(mid, eps=1e-3)
        self.se = _SE(mid, max(1, int(in_ch * 0.25)))
        self.conv_pwl = tnn.Conv2d(mid, out_ch, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out_ch, eps=1e-3)
        self.has_res = stride == 1 and in_ch == out_ch

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_pw(x)))
        h = F.silu(self.bn2(self.conv_dw(h)))
        h = self.se(h)
        h = self.bn3(self.conv_pwl(h))
        return h + x if self.has_res else h


_TINY = (BlockSpec(8, 8, 3, 1, 1, 1), BlockSpec(8, 16, 3, 2, 6, 2))


class TorchTinyEffNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv_stem = _ConvSame(3, 8, 3, 2, bias=False)
        self.bn1 = tnn.BatchNorm2d(8, eps=1e-3)
        self.blocks = tnn.ModuleList([
            tnn.ModuleList([_DSBlock(8, 8, 3)]),
            tnn.ModuleList([_IRBlock(8, 16, 3, 2, 6),
                            _IRBlock(16, 16, 3, 1, 6)]),
        ])
        self.conv_head = tnn.Conv2d(16, 32, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(32, eps=1e-3)

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_stem(x)))
        outs = []
        for stage in self.blocks:
            for blk in stage:
                h = blk(h)
            outs.append(h)
        outs.append(F.silu(self.bn2(self.conv_head(h))))
        return outs

    def state_dict_flat(self):
        return {k: v for k, v in self.state_dict().items()}


def test_efficientnet_conversion_parity():
    net = TorchTinyEffNet().eval()
    # randomize batch stats away from init
    for m in net.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.7, 1.5)
            m.weight.data.uniform_(0.6, 1.3)
            m.bias.data.uniform_(-0.2, 0.2)

    x = np.random.RandomState(0).rand(2, 3, 32, 48).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in net(torch.from_numpy(x))]

    variables = convert_efficientnet(net.state_dict_flat(), blocks=_TINY)
    enc = EfficientNetEncoder(blocks=_TINY, stem_ch=8, head_ch=32)
    feats = enc.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

    for key, ref in zip(("stage0", "stage1", "head"), want):
        got = np.asarray(feats[key]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=key)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _WSConv(tnn.Conv2d):
    """Reference weight-standardized Conv2d (`submodules.py:46-60`)."""

    def forward(self, x):
        w = self.weight
        mean = w.mean(dim=(1, 2, 3), keepdim=True)
        w = w - mean
        std = w.view(w.size(0), -1).std(dim=1).view(-1, 1, 1, 1)
        w = w / (std + 1e-5)
        return F.conv2d(x, w, self.bias, self.stride, self.padding)


class _UpGN(tnn.Module):
    def __init__(self, skip_in, out):
        super().__init__()
        self._net = tnn.Sequential(
            _WSConv(skip_in, out, 3, padding=1), tnn.GroupNorm(8, out),
            tnn.LeakyReLU(),
            _WSConv(out, out, 3, padding=1), tnn.GroupNorm(8, out),
            tnn.LeakyReLU())

    def forward(self, x, skip):
        up = F.interpolate(x, size=skip.shape[-2:], mode="bilinear",
                           align_corners=True)
        return self._net(torch.cat([up, skip], dim=1))


def _mlp(cin):
    return tnn.Sequential(
        tnn.Conv1d(cin, 128, 1), tnn.ReLU(),
        tnn.Conv1d(128, 128, 1), tnn.ReLU(),
        tnn.Conv1d(128, 128, 1), tnn.ReLU(),
        tnn.Conv1d(128, 4, 1))


def _norm_normalize_t(o):
    n = torch.sqrt((o[:, :3] ** 2).sum(1, keepdim=True)) + 1e-10
    kappa = F.elu(o[:, 3:]) + 1.0 + 0.01
    return torch.cat([o[:, :3] / n, kappa], dim=1)


class TorchTinyDecoder(tnn.Module):
    """Reference decoder (`decoder.py:7-57` + test-mode forward
    `:59-201`) at the real B5 channel widths, driven on tiny spatial
    maps (the flax decoder hardcodes the reference channels)."""

    def __init__(self):
        super().__init__()
        self.conv2 = tnn.Conv2d(2048, 2048, 1)
        self.up1 = _UpGN(2048 + 176, 1024)
        self.up2 = _UpGN(1024 + 64, 512)
        self.up3 = _UpGN(512 + 40, 256)
        self.up4 = _UpGN(256 + 24, 128)
        self.out_conv_res8 = tnn.Conv2d(512, 4, 3, padding=1)
        self.out_conv_res4 = _mlp(512 + 4)
        self.out_conv_res2 = _mlp(256 + 4)
        self.out_conv_res1 = _mlp(128 + 4)

    def forward(self, feats):
        f0, f1, f2, f3, f4 = feats
        x_d0 = self.conv2(f4)
        x_d1 = self.up1(x_d0, f3)
        x_d2 = self.up2(x_d1, f2)
        x_d3 = self.up3(x_d2, f1)
        x_d4 = self.up4(x_d3, f0)

        out_res8 = _norm_normalize_t(self.out_conv_res8(x_d2))
        outs = [out_res8]
        prev = out_res8
        for mlp, fm in ((self.out_conv_res4, x_d2),
                        (self.out_conv_res2, x_d3),
                        (self.out_conv_res1, x_d4)):
            b, _, h, w = prev.shape
            up = F.interpolate(prev, size=(2 * h, 2 * w), mode="bilinear",
                               align_corners=True)
            feat_up = F.interpolate(fm, size=(2 * h, 2 * w), mode="bilinear",
                                    align_corners=True)
            dense = torch.cat([feat_up, up], dim=1)
            flat = dense.view(b, dense.shape[1], -1)
            pred = mlp(flat).view(b, 4, 2 * h, 2 * w)
            prev = _norm_normalize_t(pred)
            outs.append(prev)
        return outs


def test_normal_decoder_conversion_parity():
    net = TorchTinyDecoder().eval()
    rng = np.random.RandomState(1)
    h8 = 4
    feats_t = [
        torch.from_numpy((rng.rand(1, 24, h8 * 8, h8 * 8) - .5).astype("f")),
        torch.from_numpy((rng.rand(1, 40, h8 * 4, h8 * 4) - .5).astype("f")),
        torch.from_numpy((rng.rand(1, 64, h8 * 2, h8 * 2) - .5).astype("f")),
        torch.from_numpy((rng.rand(1, 176, h8, h8) - .5).astype("f")),
        torch.from_numpy((rng.rand(1, 2048, h8 // 2, h8 // 2) - .5).astype("f")),
    ]
    with torch.no_grad():
        want = [t.numpy() for t in net(feats_t)]

    variables = convert_normal_decoder(net.state_dict(), architecture="GN")
    dec = NormalDecoder(architecture="GN")
    feats = {k: jnp.asarray(t.numpy().transpose(0, 2, 3, 1))
             for k, t in zip(("stage0", "stage1", "stage2", "stage4", "head"),
                             feats_t)}
    outs, _, _ = dec.apply(variables, feats, mode="test")
    for got, ref in zip(outs, want):
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   ref, atol=3e-5)
