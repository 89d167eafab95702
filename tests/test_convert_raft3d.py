"""RAFT3D weight-converter parity: torch oracles of the reference
subnetworks (`/root/reference/models/raft3d/blocks/extractor.py`,
`blocks/resnet.py`, `raft3d.py:40-98`) -> converted params -> flax outputs
match. The full RAFT3D forward needs lietorch (absent); the converted
surface is exactly these three torch submodules, so component parity covers
the checkpoint mapping completely.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sndepth_tpu.utils.convert_weights import (_convert_basic_encoder,
                                               _convert_fpn_context,
                                               _convert_update_block)


class _TorchResidualBlock(tnn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 3, padding=1, stride=stride)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1)
        self.norm1 = tnn.InstanceNorm2d(planes)
        self.norm2 = tnn.InstanceNorm2d(planes)
        if stride == 1:
            self.downsample = None
        else:
            self.norm3 = tnn.InstanceNorm2d(planes)
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes, 1, stride=stride), self.norm3)

    def forward(self, x):
        y = F.relu(self.norm1(self.conv1(x)))
        y = F.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class TorchBasicEncoder(tnn.Module):
    def __init__(self, output_dim=128):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3)
        self.norm1 = tnn.InstanceNorm2d(64)
        self.layer1 = tnn.Sequential(_TorchResidualBlock(64, 64),
                                     _TorchResidualBlock(64, 64))
        self.layer2 = tnn.Sequential(_TorchResidualBlock(64, 96, 2),
                                     _TorchResidualBlock(96, 96))
        self.layer3 = tnn.Sequential(_TorchResidualBlock(96, 128, 2),
                                     _TorchResidualBlock(128, 128))
        self.conv2 = tnn.Conv2d(128, output_dim, 1)

    def forward(self, x):
        x = F.relu(self.norm1(self.conv1(x)))
        x = self.layer3(self.layer2(self.layer1(x)))
        return self.conv2(x)


def test_basic_encoder_conversion_parity():
    torch.manual_seed(0)
    tm = TorchBasicEncoder().eval()
    x = np.random.RandomState(0).randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    sd = {f"fnet.{k}": v for k, v in tm.state_dict().items()}
    params = _convert_basic_encoder(sd)
    from sndepth_tpu.models.raft3d import BasicEncoder
    net = BasicEncoder(dtype=jnp.float32)
    got = np.asarray(net.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-4)


@pytest.mark.slow
def test_fpn_context_conversion_parity():
    torchvision = pytest.importorskip("torchvision")
    from torchvision.models.resnet import Bottleneck, ResNet

    class TorchFPN(ResNet):
        def __init__(self, output_dim=512):
            super().__init__(Bottleneck, [3, 4, 6, 3],
                             norm_layer=tnn.BatchNorm2d)
            self.uconv1 = tnn.Conv2d(2048, 512, 3, padding=1)
            self.uconv2 = tnn.Conv2d(1024, 512, 3, padding=1)
            self.uconv3 = tnn.Conv2d(512, output_dim, 1)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer2(self.layer1(x))
            z = self.layer4(self.layer3(x))
            z = F.relu(self.uconv1(z))
            z = F.interpolate(z, x.shape[2:], mode="bilinear",
                              align_corners=True)
            x = torch.cat([x, z], dim=1)
            return F.relu(self.uconv3(F.relu(self.uconv2(x))))

    torch.manual_seed(1)
    tm = TorchFPN().eval()
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.8, 1.2)
    x = np.random.RandomState(1).randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    sd = {f"cnet.{k}": v for k, v in tm.state_dict().items()}
    params, stats = _convert_fpn_context(sd)
    from sndepth_tpu.models.raft3d import FPNContext
    net = FPNContext(dtype=jnp.float32)
    got = np.asarray(net.apply(
        jax.tree_util.tree_map(jnp.asarray,
                               {"params": params, "batch_stats": stats}),
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=5e-4)


class TorchUpdateBlock(tnn.Module):
    """`raft3d.py:40-98` + `blocks/gru.py`."""

    def __init__(self, hidden_dim=128, corr_ch=98):
        super().__init__()
        self.gru = tnn.Module()
        for g in ("z", "r", "q"):
            setattr(self.gru, f"conv{g}1",
                    tnn.Conv2d(hidden_dim, hidden_dim, 3, padding=1))
            setattr(self.gru, f"conv{g}2",
                    tnn.Conv2d(hidden_dim, hidden_dim, 3, dilation=4,
                               padding=4))
        self.corr_enc = tnn.Sequential(
            tnn.Conv2d(corr_ch, 256, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(256, 3 * 128, 1))
        self.flow_enc = tnn.Sequential(
            tnn.Conv2d(9, 128, 7, padding=3), tnn.ReLU(),
            tnn.Conv2d(128, 3 * 128, 1))
        self.ae = tnn.Sequential(tnn.Conv2d(128, 256, 3, padding=1),
                                 tnn.ReLU(), tnn.Conv2d(256, 32, 1))
        self.mask = tnn.Sequential(tnn.Conv2d(128, 256, 3, padding=1),
                                   tnn.ReLU(), tnn.Conv2d(256, 64 * 9, 1))
        self.delta = tnn.Sequential(tnn.Conv2d(128, 256, 3, padding=1),
                                    tnn.ReLU(), tnn.Conv2d(256, 3, 1))
        self.weight = tnn.Sequential(tnn.Conv2d(128, 256, 3, padding=1),
                                     tnn.ReLU(), tnn.Conv2d(256, 3, 1),
                                     tnn.Sigmoid())

    def _gru(self, h, *inputs):
        iz = ir = iq = 0
        for inp in inputs:
            a, b, c = inp.split([128, 128, 128], dim=1)
            iz, ir, iq = iz + a, ir + b, iq + c
        g = self.gru
        z = torch.sigmoid(g.convz1(h) + g.convz2(h) + iz)
        r = torch.sigmoid(g.convr1(h) + g.convr2(h) + ir)
        q = torch.tanh(g.convq1(r * h) + g.convq2(r * h) + iq)
        return (1 - z) * h + z * q

    def forward(self, net, inp, corr, flow, twist, dz):
        motion = torch.cat([flow, 10 * dz, 10 * twist], dim=-1)
        motion = motion.clamp(-50.0, 50.0).permute(0, 3, 1, 2)
        mot = self.flow_enc(motion)
        cor = self.corr_enc(corr)
        net = self._gru(net, inp, cor, mot)
        return (net, self.mask(net), self.ae(net), self.delta(net),
                self.weight(net))


def test_update_block_conversion_parity():
    torch.manual_seed(2)
    tm = TorchUpdateBlock().eval()
    rng = np.random.RandomState(2)
    h, w = 8, 12
    net = rng.randn(1, 128, h, w).astype(np.float32)
    inp = rng.randn(1, 384, h, w).astype(np.float32)
    corr = rng.randn(1, 98, h, w).astype(np.float32)
    flow = rng.randn(1, h, w, 2).astype(np.float32)
    twist = rng.randn(1, h, w, 6).astype(np.float32)
    dz = rng.randn(1, h, w, 1).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in tm(*map(torch.from_numpy,
                                           (net, inp, corr, flow, twist,
                                            dz)))]

    sd = {f"update_block.{k}": v for k, v in tm.state_dict().items()}
    params = _convert_update_block(sd)
    from sndepth_tpu.models.raft3d import BasicUpdateBlock
    blk = BasicUpdateBlock(dtype=jnp.float32)
    got = blk.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(net.transpose(0, 2, 3, 1)),
        jnp.asarray(inp.transpose(0, 2, 3, 1)),
        jnp.asarray(corr.transpose(0, 2, 3, 1)),
        jnp.asarray(flow), jnp.asarray(twist), jnp.asarray(dz))
    # order: net, mask, ae, delta, weight
    for g, w_ in zip((got[0], got[1], got[2], got[3], got[4]),
                     (want[0], want[1], want[2], want[3], want[4])):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), w_,
                                   atol=1e-4)
