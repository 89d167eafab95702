"""Golden parity tests: torch reference topologies -> converted params ->
flax outputs match torch outputs.

The torch models here are test oracles implementing the documented
reference topology (`/root/reference/models/DispNetS.py`, `PoseNet.py`).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sndepth_tpu.utils.convert_weights import (convert_dispnet,
                                               convert_posenet)


def _downsample(cin, cout, k):
    return tnn.Sequential(
        tnn.Conv2d(cin, cout, k, stride=2, padding=(k - 1) // 2),
        tnn.ReLU(inplace=True),
        tnn.Conv2d(cout, cout, k, padding=(k - 1) // 2),
        tnn.ReLU(inplace=True))


def _upconv(cin, cout):
    return tnn.Sequential(
        tnn.ConvTranspose2d(cin, cout, 3, stride=2, padding=1,
                            output_padding=1),
        tnn.ReLU(inplace=True))


def _conv(cin, cout):
    return tnn.Sequential(tnn.Conv2d(cin, cout, 3, padding=1),
                          tnn.ReLU(inplace=True))


def _pred_disp(cin):
    return tnn.Sequential(tnn.Conv2d(cin, 1, 3, padding=1), tnn.Sigmoid())


class TorchDispNetS(tnn.Module):
    def __init__(self, alpha=10, beta=0.01):
        super().__init__()
        self.alpha, self.beta = alpha, beta
        cp = [32, 64, 128, 256, 512, 512, 512]
        up = [512, 512, 256, 128, 64, 32, 16]
        ks = [7, 5, 3, 3, 3, 3, 3]
        cin = 3
        for i in range(7):
            setattr(self, f"conv{i + 1}", _downsample(cin, cp[i], ks[i]))
            cin = cp[i]
        self.upconv7 = _upconv(cp[6], up[0])
        self.upconv6 = _upconv(up[0], up[1])
        self.upconv5 = _upconv(up[1], up[2])
        self.upconv4 = _upconv(up[2], up[3])
        self.upconv3 = _upconv(up[3], up[4])
        self.upconv2 = _upconv(up[4], up[5])
        self.upconv1 = _upconv(up[5], up[6])
        self.iconv7 = _conv(up[0] + cp[5], up[0])
        self.iconv6 = _conv(up[1] + cp[4], up[1])
        self.iconv5 = _conv(up[2] + cp[3], up[2])
        self.iconv4 = _conv(up[3] + cp[2], up[3])
        self.iconv3 = _conv(1 + up[4] + cp[1], up[4])
        self.iconv2 = _conv(1 + up[5] + cp[0], up[5])
        self.iconv1 = _conv(1 + up[6], up[6])
        self.predict_disp4 = _pred_disp(up[3])
        self.predict_disp3 = _pred_disp(up[4])
        self.predict_disp2 = _pred_disp(up[5])
        self.predict_disp1 = _pred_disp(up[6])

    def forward(self, x):
        import torch.nn.functional as F

        def crop(a, ref):
            return a[:, :, :ref.size(2), :ref.size(3)]

        c1 = self.conv1(x); c2 = self.conv2(c1); c3 = self.conv3(c2)
        c4 = self.conv4(c3); c5 = self.conv5(c4); c6 = self.conv6(c5)
        c7 = self.conv7(c6)
        u7 = crop(self.upconv7(c7), c6)
        i7 = self.iconv7(torch.cat((u7, c6), 1))
        u6 = crop(self.upconv6(i7), c5)
        i6 = self.iconv6(torch.cat((u6, c5), 1))
        u5 = crop(self.upconv5(i6), c4)
        i5 = self.iconv5(torch.cat((u5, c4), 1))
        u4 = crop(self.upconv4(i5), c3)
        i4 = self.iconv4(torch.cat((u4, c3), 1))
        d4 = self.alpha * self.predict_disp4(i4) + self.beta
        u3 = crop(self.upconv3(i4), c2)
        d4u = crop(F.interpolate(d4, scale_factor=2, mode="bilinear",
                                 align_corners=False), c2)
        i3 = self.iconv3(torch.cat((u3, c2, d4u), 1))
        d3 = self.alpha * self.predict_disp3(i3) + self.beta
        u2 = crop(self.upconv2(i3), c1)
        d3u = crop(F.interpolate(d3, scale_factor=2, mode="bilinear",
                                 align_corners=False), c1)
        i2 = self.iconv2(torch.cat((u2, c1, d3u), 1))
        d2 = self.alpha * self.predict_disp2(i2) + self.beta
        u1 = crop(self.upconv1(i2), x)
        d2u = crop(F.interpolate(d2, scale_factor=2, mode="bilinear",
                                 align_corners=False), x)
        i1 = self.iconv1(torch.cat((u1, d2u), 1))
        d1 = self.alpha * self.predict_disp1(i1) + self.beta
        return d1, d2, d3, d4


class TorchPoseNet(tnn.Module):
    def __init__(self, num_source=2):
        super().__init__()
        self.num_source = num_source
        plan = [(3 * (1 + num_source), 16, 7), (16, 32, 5), (32, 64, 3),
                (64, 128, 3), (128, 256, 3), (256, 256, 3), (256, 256, 3)]
        for i, (cin, cout, k) in enumerate(plan):
            setattr(self, f"conv{i + 1}", tnn.Sequential(
                tnn.Conv2d(cin, cout, k, stride=2, padding=(k - 1) // 2),
                tnn.ReLU(inplace=True)))
        self.pred_poses = tnn.Conv2d(256, 6 * num_source, 1)

    def forward(self, x):
        for i in range(7):
            x = getattr(self, f"conv{i + 1}")(x)
        p = self.pred_poses(x).mean((2, 3))
        return 0.01 * p.view(p.shape[0], self.num_source, 6)


@pytest.mark.slow
def test_dispnet_conversion_parity():
    torch.manual_seed(0)
    tm = TorchDispNetS().eval()
    x = np.random.RandomState(0).randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = [d.numpy() for d in tm(torch.from_numpy(x))]

    params = convert_dispnet(tm.state_dict())
    from sndepth_tpu.models.dispnet import DispNetS
    net = DispNetS(dtype=jnp.float32)
    got = net.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g)[..., 0], w[:, 0],
                                   atol=2e-3)


def test_posenet_conversion_parity():
    torch.manual_seed(1)
    tm = TorchPoseNet().eval()
    x = np.random.RandomState(1).randn(2, 9, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    params = convert_posenet(tm.state_dict())
    from sndepth_tpu.models.posenet import PoseNet
    net = PoseNet(num_source=2, dtype=jnp.float32)
    got = np.asarray(net.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-5)
