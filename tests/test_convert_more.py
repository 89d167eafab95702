"""Parity tests for the round-2 weight converters: MotionFusionNet, DINO
ViT-S/16, AutoencoderKL. The torch modules here are oracles implementing the
documented reference topologies (`/root/reference/models/MotionFusionNet.py`,
`utils/motion_split/build_unit.py`, `models/image_f_extract.py`,
`submodules/vae/vae_model.py`) with state_dict keys matching the reference,
so the converters exercise the exact key layout real checkpoints have.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sndepth_tpu.utils.convert_weights import (convert_dino_vit,
                                               convert_motionfusion,
                                               convert_vae)


# ---------------------------------------------------------------------------
# MotionFusionNet oracle (reference key names)
# ---------------------------------------------------------------------------

def _cbr_t(cin, cout, k=1, s=1, p=0, d=1):
    return [tnn.Conv2d(cin, cout, k, stride=s, padding=p, dilation=d),
            tnn.BatchNorm2d(cout), tnn.ReLU(inplace=True)]


class _ResNet1(tnn.Module):
    def __init__(self, o):
        super().__init__()
        d0, d1, d2 = o
        self.layer_1 = tnn.Sequential(*_cbr_t(d0, d1), *_cbr_t(d1, d1, 3, 1, 1),
                                      *_cbr_t(d1, d2))

    def forward(self, x):
        return F.relu(self.layer_1(x) + x)


class _ResNet2(tnn.Module):
    def __init__(self, o):
        super().__init__()
        d0, d1, d2, s = o
        self.layer_1 = tnn.Sequential(*_cbr_t(d0, d1, 1, s),
                                      *_cbr_t(d1, d1, 3, 1, 1),
                                      *_cbr_t(d1, d2))
        self.layer_2 = tnn.Sequential(*_cbr_t(d0, d2, 1, s))

    def forward(self, x):
        return F.relu(self.layer_1(x) + self.layer_2(x))


class _ResNet3(tnn.Module):
    def __init__(self, o):
        super().__init__()
        d0, d1, d2, d3, p, d = o
        self.initial_conv = tnn.Sequential(*_cbr_t(d0, d1))
        self.branch1 = tnn.Sequential(*_cbr_t(d1, d3 // 2, 3, 1, p, p))
        self.branch2 = tnn.Sequential(*_cbr_t(d1, d3 // 2, 3, 1, d, d))
        self.final_conv = tnn.Sequential(*_cbr_t(d3, d2))

    def forward(self, x):
        h = self.initial_conv(x)
        cat = torch.cat((self.branch1(h), self.branch2(h)), 1)
        return F.relu(self.final_conv(cat) + x)


class _ResNet4(tnn.Module):
    def __init__(self, o):
        super().__init__()
        d0, d1, d2, d3, p, d = o
        self.initial_conv = tnn.Sequential(*_cbr_t(d0, d1))
        self.branch1 = tnn.Sequential(*_cbr_t(d1, d3 // 2, 3, 1, p, p))
        self.branch2 = tnn.Sequential(*_cbr_t(d1, d3 // 2, 3, 1, d, d))
        self.final_conv = tnn.Sequential(*_cbr_t(d3, d2))
        self.down_conv = tnn.Sequential(tnn.Conv2d(d0, d2, 1),
                                        tnn.BatchNorm2d(d2))

    def forward(self, x):
        h = self.initial_conv(x)
        cat = torch.cat((self.branch1(h), self.branch2(h)), 1)
        return F.relu(self.final_conv(cat) + self.down_conv(x))


def _build_units(options):
    m = {"1": _ResNet1, "2": _ResNet2, "3": _ResNet3, "4": _ResNet4}
    return [m[t](o) for t, o in options]


class _TorchMotionFeatureNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.layer1 = tnn.Sequential(*_cbr_t(3, 64, 3, 2, 1))
        self.layer2 = tnn.MaxPool2d(2, 2)
        self.layer3 = tnn.Sequential(*_build_units([
            ("2", [64, 64, 256, 1]), ("1", [256, 64, 256]),
            ("1", [256, 64, 256]), ("2", [256, 256, 512, 2]),
            ("1", [512, 128, 512]), ("2", [512, 256, 512, 2])]))

    def forward(self, x):
        return self.layer3(self.layer2(self.layer1(x)))


class _TorchSemanticFeatureNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.layer1 = tnn.Sequential(*_cbr_t(3, 32, 3, 1, 1),
                                     *_cbr_t(32, 64, 7, 2, 3))
        self.layer2 = tnn.MaxPool2d(2, 2)
        self.layer3 = tnn.Sequential(*_build_units([
            ("2", [64, 64, 256, 1]), ("1", [256, 64, 256]),
            ("1", [256, 64, 256]), ("2", [256, 256, 512, 2]),
            ("1", [512, 128, 512]), ("1", [512, 128, 512]),
            ("3", [512, 128, 512, 64, 1, 2]), ("2", [512, 768, 1024, 2]),
            ("1", [1024, 256, 1024]), ("3", [1024, 256, 1024, 256, 1, 2]),
            ("3", [1024, 256, 1024, 256, 1, 4]),
            ("3", [1024, 256, 1024, 256, 1, 8]),
            ("3", [1024, 256, 1024, 256, 1, 16]),
            ("4", [1024, 512, 2048, 256, 2, 4]),
            ("3", [2048, 512, 2048, 512, 2, 8]),
            ("3", [2048, 512, 2048, 512, 2, 16])]))

    def forward(self, x):
        return self.layer3(self.layer2(self.layer1(x)))


class TorchMotionFusionNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.motionFeatureNet = _TorchMotionFeatureNet()
        self.semanticFeatureNet = _TorchSemanticFeatureNet()
        self.layer1 = tnn.Sequential(*_build_units([
            ("2", [2560, 128, 512, 1]), ("1", [512, 128, 512]),
            ("1", [512, 128, 512]), ("4", [512, 256, 1024, 128, 1, 2]),
            ("3", [1024, 256, 1024, 128, 1, 4]),
            ("3", [1024, 256, 1024, 128, 1, 8]),
            ("4", [1024, 512, 2048, 256, 4, 16]),
            ("3", [2048, 512, 2048, 256, 4, 16])]))
        self.layer2 = tnn.Sequential(tnn.Conv2d(2048, 2048, 1),
                                     tnn.BatchNorm2d(2048), tnn.ReLU())
        self.layer3 = tnn.Sequential(
            tnn.ConvTranspose2d(2048, 3, (16, 16), stride=(16, 16)),
            tnn.BatchNorm2d(3))

    def forward(self, image, flow):
        fusion = torch.cat((self.motionFeatureNet(flow),
                            self.semanticFeatureNet(image)), 1)
        return self.layer3(self.layer2(self.layer1(fusion)))


@pytest.mark.slow
def test_motionfusion_conversion_parity():
    torch.manual_seed(0)
    tm = TorchMotionFusionNet().eval()
    # randomize BN stats so the conversion is actually exercised
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 64, 64).astype(np.float32)
    flow = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(img), torch.from_numpy(flow)).numpy()

    variables = convert_motionfusion(tm.state_dict())
    from sndepth_tpu.models.motionseg import MotionFusionNet
    net = MotionFusionNet(dtype=jnp.float32)
    got = np.asarray(net.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(flow.transpose(0, 2, 3, 1)), train=False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-3)


# ---------------------------------------------------------------------------
# DINO ViT-S/16 oracle
# ---------------------------------------------------------------------------

class _TorchViTBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, 3 * dim)
        self.attn.proj = tnn.Linear(dim, dim)
        self.heads = heads
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, 4 * dim)
        self.mlp.fc2 = tnn.Linear(4 * dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        h = self.heads
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(b, n, 3, h, c // h)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = (q @ k.transpose(-2, -1)) * (c // h) ** -0.5
        att = att.softmax(-1)
        y = (att @ v).transpose(1, 2).reshape(b, n, c)
        x = x + self.attn.proj(y)
        y = self.norm2(x)
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(y)))
        return x + y


class TorchDinoViT(tnn.Module):
    def __init__(self, dim=384, depth=12, heads=6, patch=16):
        super().__init__()
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = tnn.Parameter(torch.randn(1, 197, dim) * 0.02)
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, stride=patch)
        self.blocks = tnn.ModuleList(
            [_TorchViTBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim)
        self.patch = patch

    def forward(self, x):
        b = x.shape[0]
        t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), t], 1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)[:, 0]


@pytest.mark.slow
def test_dino_vit_conversion_parity():
    torch.manual_seed(1)
    depth = 4  # keep the oracle small; per-block mapping is identical
    tm = TorchDinoViT(depth=depth).eval()
    with torch.no_grad():
        tm.cls_token.normal_(0, 0.02)
    x = np.random.RandomState(2).rand(1, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    params = convert_dino_vit(tm.state_dict(), depth=depth)
    from sndepth_tpu.models.vit import ViT
    net = ViT(depth=depth, dtype=jnp.float32)
    got = np.asarray(net.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x.transpose(0, 2, 3, 1))))
    # accumulation-order drift across transformer layers: ~6e-4 relative
    np.testing.assert_allclose(got, want, atol=1e-3)


# ---------------------------------------------------------------------------
# AutoencoderKL oracle (LDM key names), reduced config
# ---------------------------------------------------------------------------

def _t_resblock(cin, cout):
    m = tnn.Module()
    m.norm1 = tnn.GroupNorm(32, cin, eps=1e-6)
    m.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
    m.norm2 = tnn.GroupNorm(32, cout, eps=1e-6)
    m.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
    if cin != cout:
        m.nin_shortcut = tnn.Conv2d(cin, cout, 1)
    return m


def _run_resblock(m, x):
    h = m.conv1(F.silu(m.norm1(x)))
    h = m.conv2(F.silu(m.norm2(h)))
    if hasattr(m, "nin_shortcut"):
        x = m.nin_shortcut(x)
    return x + h


def _t_attnblock(c):
    m = tnn.Module()
    m.norm = tnn.GroupNorm(32, c, eps=1e-6)
    m.q = tnn.Conv2d(c, c, 1)
    m.k = tnn.Conv2d(c, c, 1)
    m.v = tnn.Conv2d(c, c, 1)
    m.proj_out = tnn.Conv2d(c, c, 1)
    return m


def _run_attnblock(m, x):
    b, c, h, w = x.shape
    y = m.norm(x)
    q = m.q(y).reshape(b, c, h * w).permute(0, 2, 1)
    k = m.k(y).reshape(b, c, h * w)
    v = m.v(y).reshape(b, c, h * w)
    att = torch.softmax(torch.bmm(q, k) * c ** -0.5, dim=2)
    out = torch.bmm(v, att.permute(0, 2, 1)).reshape(b, c, h, w)
    return x + m.proj_out(out)


class TorchVAE(tnn.Module):
    """base_ch=32, ch_mult=(1,2), nrb=1, z=4 — LDM layout."""

    def __init__(self):
        super().__init__()
        ch, mults, z = 32, (1, 2), 4
        enc = tnn.Module()
        enc.conv_in = tnn.Conv2d(4, ch, 3, padding=1)
        enc.down = tnn.ModuleList()
        c = ch
        for i, m in enumerate(mults):
            lvl = tnn.Module()
            lvl.block = tnn.ModuleList([_t_resblock(c, ch * m)])
            c = ch * m
            if i != len(mults) - 1:
                lvl.downsample = tnn.Module()
                lvl.downsample.conv = tnn.Conv2d(c, c, 3, stride=2)
            enc.down.append(lvl)
        enc.mid = tnn.Module()
        enc.mid.block_1 = _t_resblock(c, c)
        enc.mid.attn_1 = _t_attnblock(c)
        enc.mid.block_2 = _t_resblock(c, c)
        enc.norm_out = tnn.GroupNorm(32, c, eps=1e-6)
        enc.conv_out = tnn.Conv2d(c, 2 * z, 3, padding=1)
        self.encoder = enc

        dec = tnn.Module()
        dec.conv_in = tnn.Conv2d(z, c, 3, padding=1)
        dec.mid = tnn.Module()
        dec.mid.block_1 = _t_resblock(c, c)
        dec.mid.attn_1 = _t_attnblock(c)
        dec.mid.block_2 = _t_resblock(c, c)
        dec.up = tnn.ModuleList()
        cc = c
        ups = []
        for i in reversed(range(len(mults))):
            lvl = tnn.Module()
            lvl.block = tnn.ModuleList(
                [_t_resblock(cc, ch * mults[i]),
                 _t_resblock(ch * mults[i], ch * mults[i])])
            cc = ch * mults[i]
            if i != 0:
                lvl.upsample = tnn.Module()
                lvl.upsample.conv = tnn.Conv2d(cc, cc, 3, padding=1)
            ups.append(lvl)
        for lvl in reversed(ups):        # LDM indexes up[] by level
            dec.up.append(lvl)
        dec.norm_out = tnn.GroupNorm(32, cc, eps=1e-6)
        dec.conv_out = tnn.Conv2d(cc, 4, 3, padding=1)
        self.decoder = dec

        self.quant_conv = tnn.Conv2d(2 * z, 2 * z, 1)
        self.post_quant_conv = tnn.Conv2d(z, z, 1)

    def encode(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for i, lvl in enumerate(e.down):
            for blk in lvl.block:
                h = _run_resblock(blk, h)
            if hasattr(lvl, "downsample"):
                h = lvl.downsample.conv(F.pad(h, (0, 1, 0, 1)))
        h = _run_resblock(e.mid.block_1, h)
        h = _run_attnblock(e.mid.attn_1, h)
        h = _run_resblock(e.mid.block_2, h)
        h = e.conv_out(F.silu(e.norm_out(h)))
        return self.quant_conv(h)

    def decode(self, z):
        d = self.decoder
        h = d.conv_in(self.post_quant_conv(z))
        h = _run_resblock(d.mid.block_1, h)
        h = _run_attnblock(d.mid.attn_1, h)
        h = _run_resblock(d.mid.block_2, h)
        for i in reversed(range(len(d.up))):
            lvl = d.up[i]
            for blk in lvl.block:
                h = _run_resblock(blk, h)
            if hasattr(lvl, "upsample"):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = lvl.upsample.conv(h)
        return d.conv_out(F.silu(d.norm_out(h)))


@pytest.mark.slow
def test_vae_conversion_parity():
    from sndepth_tpu.models.vae import AutoencoderKL, VAEConfig

    torch.manual_seed(3)
    tm = TorchVAE().eval()
    x = np.random.RandomState(3).rand(1, 4, 32, 32).astype(np.float32)
    with torch.no_grad():
        moments = tm.encode(torch.from_numpy(x))
        z = moments[:, :4]
        recon = tm.decode(z).numpy()

    cfg = VAEConfig(base_ch=32, ch_mult=(1, 2), num_res_blocks=1)
    params = convert_vae(tm.state_dict(), cfg)
    net = AutoencoderKL(cfg, dtype=jnp.float32)

    got_post = net.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x.transpose(0, 2, 3, 1)), method=net.encode)
    got_moments = np.concatenate(
        [np.asarray(got_post.mean), np.asarray(got_post.logvar)], -1)
    np.testing.assert_allclose(got_moments.transpose(0, 3, 1, 2),
                               moments.numpy(), atol=2e-4)

    got_recon = np.asarray(net.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(z.numpy().transpose(0, 2, 3, 1)), method=net.decode))
    np.testing.assert_allclose(got_recon.transpose(0, 3, 1, 2), recon,
                               atol=2e-4)
