"""RAFT2DLarge vs a torch replica of torchvision ``raft_large``.

torchvision is not installed in this image, so the oracle is a
state-dict-compatible torch re-implementation of
``torchvision.models.optical_flow.raft_large`` (RAFT paper network, batch/
instance norm split, SepConvGRU, align_corners=True correlation lookup,
convex upsampling) matching the checkpoint the reference loads in
`/root/reference/predict.py:8-9,24`. Random weights + random running stats
flow through both implementations and must agree.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sndepth_tpu.models.raft2d import RAFT2DLarge
from sndepth_tpu.utils.convert_weights import convert_raft2d_large


# ---------------------------------------------------------------------------
# torch replica (torchvision raft.py semantics, state-dict compatible)
# ---------------------------------------------------------------------------

def _cna(cin, cout, k, stride=1, norm=None, act=True):
    layers = [tnn.Conv2d(cin, cout, k, stride, k // 2, bias=norm is None)]
    if norm == "instance":
        layers.append(tnn.InstanceNorm2d(cout))
    elif norm == "batch":
        layers.append(tnn.BatchNorm2d(cout))
    if act:
        layers.append(tnn.ReLU())
    return tnn.Sequential(*layers)


class _ResBlock(tnn.Module):
    def __init__(self, cin, cout, stride, norm):
        super().__init__()
        self.convnormrelu1 = _cna(cin, cout, 3, stride, norm)
        self.convnormrelu2 = _cna(cout, cout, 3, 1, norm)
        if stride != 1 or cin != cout:
            self.downsample = _cna(cin, cout, 1, stride, norm, act=False)
        else:
            self.downsample = tnn.Identity()

    def forward(self, x):
        y = self.convnormrelu2(self.convnormrelu1(x))
        return F.relu(self.downsample(x) + y)


class _Encoder(tnn.Module):
    def __init__(self, norm):
        super().__init__()
        self.convnormrelu = _cna(3, 64, 7, 2, norm)
        self.layer1 = tnn.Sequential(_ResBlock(64, 64, 1, norm),
                                     _ResBlock(64, 64, 1, norm))
        self.layer2 = tnn.Sequential(_ResBlock(64, 96, 2, norm),
                                     _ResBlock(96, 96, 1, norm))
        self.layer3 = tnn.Sequential(_ResBlock(96, 128, 2, norm),
                                     _ResBlock(128, 128, 1, norm))
        self.conv = tnn.Conv2d(128, 256, 1)

    def forward(self, x):
        x = self.convnormrelu(x)
        x = self.layer3(self.layer2(self.layer1(x)))
        return self.conv(x)


class _MotionEncoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.convcorr1 = _cna(324, 256, 1)
        self.convcorr2 = _cna(256, 192, 3)
        self.convflow1 = _cna(2, 128, 7)
        self.convflow2 = _cna(128, 64, 3)
        self.conv = _cna(192 + 64, 126, 3)

    def forward(self, flow, corr):
        co = self.convcorr2(self.convcorr1(corr))
        fl = self.convflow2(self.convflow1(flow))
        out = self.conv(torch.cat([co, fl], dim=1))
        return torch.cat([out, flow], dim=1)


class _TorchConvGRU(tnn.Module):
    def __init__(self, k, pad):
        super().__init__()
        self.convz = tnn.Conv2d(128 + 256, 128, k, padding=pad)
        self.convr = tnn.Conv2d(128 + 256, 128, k, padding=pad)
        self.convq = tnn.Conv2d(128 + 256, 128, k, padding=pad)

    def forward(self, h, x):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz(hx))
        r = torch.sigmoid(self.convr(hx))
        q = torch.tanh(self.convq(torch.cat([r * h, x], dim=1)))
        return (1 - z) * h + z * q


class _RecurrentBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        self.convgru1 = _TorchConvGRU((1, 5), (0, 2))
        self.convgru2 = _TorchConvGRU((5, 1), (2, 0))

    def forward(self, h, x):
        return self.convgru2(self.convgru1(h, x), x)


class _FlowHead(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(128, 256, 3, padding=1)
        self.conv2 = tnn.Conv2d(256, 2, 3, padding=1)

    def forward(self, x):
        return self.conv2(F.relu(self.conv1(x)))


class _UpdateBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        self.motion_encoder = _MotionEncoder()
        self.recurrent_block = _RecurrentBlock()
        self.flow_head = _FlowHead()

    def forward(self, hidden, context, corr, flow):
        motion = self.motion_encoder(flow, corr)
        x = torch.cat([context, motion], dim=1)
        hidden = self.recurrent_block(hidden, x)
        return hidden, self.flow_head(hidden)


class _MaskPredictor(tnn.Module):
    def __init__(self):
        super().__init__()
        self.convrelu = _cna(128, 256, 3)
        self.conv = tnn.Conv2d(256, 8 * 8 * 9, 1)

    def forward(self, x):
        return 0.25 * self.conv(self.convrelu(x))


def _grid_sample_abs(img, grid):
    h, w = img.shape[-2:]
    xg = 2 * grid[..., 0] / (w - 1) - 1
    yg = 2 * grid[..., 1] / (h - 1) - 1
    return F.grid_sample(img, torch.stack([xg, yg], dim=-1),
                         mode="bilinear", align_corners=True)


class _TorchRAFTLarge(tnn.Module):
    def __init__(self, levels=4, radius=4):
        super().__init__()
        self.feature_encoder = _Encoder("instance")
        self.context_encoder = _Encoder("batch")
        self.update_block = _UpdateBlock()
        self.mask_predictor = _MaskPredictor()
        self.levels, self.radius = levels, radius

    def forward(self, image1, image2, iters):
        fmap1 = self.feature_encoder(image1)
        fmap2 = self.feature_encoder(image2)
        b, c, h, w = fmap1.shape
        corr = torch.matmul(
            fmap1.view(b, c, h * w).transpose(1, 2),
            fmap2.view(b, c, h * w)) / torch.sqrt(torch.tensor(float(c)))
        vol = corr.view(b * h * w, 1, h, w)
        pyramid = [vol]
        for _ in range(self.levels - 1):
            vol = F.avg_pool2d(vol, 2, 2)
            pyramid.append(vol)

        cnet = self.context_encoder(image1)
        hidden, context = torch.split(cnet, [128, 128], dim=1)
        hidden = torch.tanh(hidden)
        context = F.relu(context)

        ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w),
                                indexing="ij")
        coords0 = torch.stack([xs, ys], dim=0).float()[None].repeat(
            b, 1, 1, 1)
        coords1 = coords0.clone()

        side = 2 * self.radius + 1
        d = torch.linspace(-self.radius, self.radius, side)
        delta = torch.stack(torch.meshgrid(d, d, indexing="ij"),
                            dim=-1).view(1, side, side, 2)

        up_mask = None
        for _ in range(iters):
            cc = coords1.permute(0, 2, 3, 1).reshape(b * h * w, 1, 1, 2)
            indexed = []
            for lvl in pyramid:
                sampled = _grid_sample_abs(lvl, cc + delta)
                indexed.append(sampled.view(b, h, w, -1))
                cc = cc / 2
            corr_feat = torch.cat(indexed, dim=-1).permute(
                0, 3, 1, 2).contiguous()
            flow = coords1 - coords0
            hidden, dflow = self.update_block(hidden, context, corr_feat,
                                              flow)
            coords1 = coords1 + dflow
            up_mask = self.mask_predictor(hidden)

        flow = coords1 - coords0
        up_mask = up_mask.view(b, 1, 9, 8, 8, h, w)
        up_mask = torch.softmax(up_mask, dim=2)
        up_flow = F.unfold(8 * flow, kernel_size=3, padding=1).view(
            b, 2, 9, 1, 1, h, w)
        up_flow = torch.sum(up_mask * up_flow, dim=2)
        up_flow = up_flow.permute(0, 1, 4, 2, 5, 3).reshape(
            b, 2, 8 * h, 8 * w)
        return flow, up_flow


def _randomize(model):
    g = torch.Generator().manual_seed(0)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = 0.5 + torch.rand(v.shape, generator=g)
            elif "running_mean" in k:
                sd[k] = 0.2 * torch.randn(v.shape, generator=g)
            elif "flow_head.conv2" in k:
                # keep per-iteration deltas sub-pixel: with O(10px) random
                # deltas the piecewise-linear corr lookup amplifies fp
                # noise chaotically across iterations
                sd[k] = 0.001 * torch.randn(v.shape, generator=g)
            else:
                sd[k] = 0.1 * torch.randn(v.shape, generator=g)
    model.load_state_dict(sd)
    return model


@pytest.mark.slow
def test_raft2d_large_matches_torch_replica():
    torch.manual_seed(0)
    model = _randomize(_TorchRAFTLarge()).eval()

    b, ht, wd, iters = 1, 128, 128, 3
    rs = np.random.RandomState(0)
    im1 = rs.rand(b, 3, ht, wd).astype(np.float32) * 2 - 1
    im2 = rs.rand(b, 3, ht, wd).astype(np.float32) * 2 - 1

    with torch.no_grad():
        tlo, tup = model(torch.from_numpy(im1), torch.from_numpy(im2),
                         iters)

    variables = convert_raft2d_large(model.state_dict())
    variables = jax.tree.map(jnp.asarray, variables)
    net = RAFT2DLarge()
    jlo, jup = jax.jit(
        lambda v, a, b_: net.apply(v, a, b_, iters=iters, train_mode=True)
    )(variables, jnp.asarray(im1.transpose(0, 2, 3, 1)),
      jnp.asarray(im2.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(
        np.asarray(jlo).transpose(0, 3, 1, 2), tlo.numpy(), rtol=2e-4,
        atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(jup).transpose(0, 3, 1, 2), tup.numpy(), rtol=2e-4,
        atol=2e-4)
