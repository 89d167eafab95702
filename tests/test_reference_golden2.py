"""Golden parity vs the ACTUAL reference code, wave 2 (VERDICT r4 #3).

Round 3 introduced golden tests that import the reference's own torch
modules from /root/reference as the oracle (test_reference_golden.py);
they stopped at the GeoNet family. This file extends the oracle to every
remaining reference module that imports on this box:

* `models.MotionFusionNet` (:10-61)            vs `models/motionseg.py`
* `submodules.vae.vae_model` Encoder/Decoder (:370-560)
                                               vs `models/vae.py`
* `submodules.vae.distributions`
  DiagonalGaussianDistribution (:26-68) / normal_kl (:71-93)
                                               vs `models/vae.py`
* `submodules.submodules.norm_normalize` (:64-70) / `sample_points`
  (:75-140)                                    vs `models/normal_decoder.py`
* `submodules.decoder.Decoder` test path (:59-201)
                                               vs `models/normal_decoder.py`

Each forward test routes the reference's randomly initialized
state_dict through the production converter (utils/convert_weights.py)
exactly as a user converting a released checkpoint would — the replica
tests in test_convert_more.py / test_convert_nnet.py remain as fast
topology checks, but parity is anchored here.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"


@pytest.fixture(scope="module")
def refpath():
    added = False
    if REF not in sys.path:
        sys.path.append(REF)       # append: never shadow our packages
        added = True
    yield
    if added:
        sys.path.remove(REF)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _randomize_bn(tm):
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)


# ---------------------------------------------------------------------------
# MotionFusionNet
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_motionfusion_forward_golden(refpath):
    """The reference's own models.MotionFusionNet (three towers + fusion
    trunk + 16x deconv head, `MotionFusionNet.py:10-61`), random-init
    with randomized BN stats, through convert_motionfusion."""
    from models.MotionFusionNet import MotionFusionNet as RefNet
    torch.manual_seed(0)
    tm = RefNet().eval()
    _randomize_bn(tm)
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 64, 64).astype(np.float32)
    flow = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(_t(img), _t(flow)).numpy()

    from sndepth_tpu.models.motionseg import MotionFusionNet
    from sndepth_tpu.utils.convert_weights import convert_motionfusion
    variables = convert_motionfusion(tm.state_dict())
    net = MotionFusionNet(dtype=jnp.float32)
    got = np.asarray(net.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(flow.transpose(0, 2, 3, 1)), train=False))
    # Kaiming-init activations reach ~8.5e3 through the ~60-conv
    # unnormalized stack (eval-mode BN with random running stats does not
    # renormalize), so f32 conv-order drift accumulates to ~0.27% of the
    # output scale (torch-vs-torch with the same state_dict is bit-exact;
    # verified while writing this test). Structural misreads produce
    # O(scale) errors; assert against 1% of scale.
    scale = float(np.abs(want).max())
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               atol=0.01 * scale)


# ---------------------------------------------------------------------------
# VAE Encoder / Decoder
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_vae_encoder_decoder_golden(refpath):
    """The reference's own submodules.vae.vae_model Encoder/Decoder
    (:370-560) at a reduced ddconfig, assembled into the AutoencoderKL
    state_dict layout (`models/AutoencoderKL.py:28-38`) and routed
    through convert_vae."""
    from submodules.vae import vae_model as vm
    torch.manual_seed(3)
    dd = dict(ch=32, out_ch=4, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=[], in_channels=4, resolution=32,
              z_channels=4, double_z=True)
    enc = vm.Encoder(**dd).eval()
    dec = vm.Decoder(**dd).eval()
    quant = torch.nn.Conv2d(2 * 4, 2 * 4, 1)
    post_quant = torch.nn.Conv2d(4, 4, 1)

    sd = {}
    for prefix, mod in (("encoder", enc), ("decoder", dec),
                        ("quant_conv", quant),
                        ("post_quant_conv", post_quant)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v

    x = np.random.RandomState(3).rand(1, 4, 32, 32).astype(np.float32)
    with torch.no_grad():
        moments = quant(enc(_t(x)))
        z = moments[:, :4]
        recon = dec(post_quant(z)).numpy()

    from sndepth_tpu.models.vae import AutoencoderKL, VAEConfig
    from sndepth_tpu.utils.convert_weights import convert_vae
    cfg = VAEConfig(base_ch=32, ch_mult=(1, 2), num_res_blocks=1)
    params = convert_vae(sd, cfg)
    net = AutoencoderKL(cfg, dtype=jnp.float32)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}

    got_post = net.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         method=net.encode)
    got_moments = np.concatenate(
        [np.asarray(got_post.mean), np.asarray(got_post.logvar)], -1)
    np.testing.assert_allclose(got_moments.transpose(0, 3, 1, 2),
                               moments.numpy(), atol=2e-4)

    got_recon = np.asarray(net.apply(
        variables, jnp.asarray(z.numpy().transpose(0, 2, 3, 1)),
        method=net.decode))
    np.testing.assert_allclose(got_recon.transpose(0, 3, 1, 2), recon,
                               atol=2e-4)


# ---------------------------------------------------------------------------
# DiagonalGaussianDistribution / normal_kl
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_diagonal_gaussian_golden(refpath):
    from submodules.vae.distributions import DiagonalGaussianDistribution
    rng = np.random.RandomState(7)
    p1 = rng.randn(2, 8, 6, 5).astype(np.float32) * 3
    p2 = rng.randn(2, 8, 6, 5).astype(np.float32) * 3
    s = rng.randn(2, 4, 6, 5).astype(np.float32)
    rd1 = DiagonalGaussianDistribution(_t(p1))
    rd2 = DiagonalGaussianDistribution(_t(p2))
    with torch.no_grad():
        want_kl = rd1.kl().numpy()
        want_kl2 = rd1.kl(rd2).numpy()
        want_nll = rd1.nll(_t(s)).numpy()
        want_mode = rd1.mode().numpy()

    from sndepth_tpu.models.vae import DiagonalGaussian
    d1 = DiagonalGaussian(jnp.asarray(p1.transpose(0, 2, 3, 1)))
    d2 = DiagonalGaussian(jnp.asarray(p2.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(d1.kl()), want_kl, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d1.kl(d2)), want_kl2, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(d1.nll(jnp.asarray(s.transpose(0, 2, 3, 1)))),
        want_nll, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(d1.mode()).transpose(0, 3, 1, 2), want_mode)


@pytest.mark.slow
def test_normal_kl_golden(refpath):
    from submodules.vae.distributions import normal_kl as ref_normal_kl
    rng = np.random.RandomState(8)
    m1, lv1 = rng.randn(3, 5).astype(np.float32), rng.randn(3, 5).astype(np.float32)
    m2, lv2 = rng.randn(3, 5).astype(np.float32), rng.randn(3, 5).astype(np.float32)
    with torch.no_grad():
        want = ref_normal_kl(_t(m1), _t(lv1), _t(m2), _t(lv2)).numpy()
    from sndepth_tpu.models.vae import normal_kl
    got = np.asarray(normal_kl(jnp.asarray(m1), jnp.asarray(lv1),
                               jnp.asarray(m2), jnp.asarray(lv2)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ---------------------------------------------------------------------------
# norm_normalize / sample_points
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_norm_normalize_golden(refpath):
    from submodules.submodules import norm_normalize as ref_nn
    rng = np.random.RandomState(9)
    x = (rng.rand(2, 4, 6, 7).astype(np.float32) - 0.5) * 4
    with torch.no_grad():
        want = ref_nn(_t(x)).numpy()
    from sndepth_tpu.models.normal_decoder import norm_normalize
    got = np.asarray(norm_normalize(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-6)


@pytest.mark.slow
def test_sample_points_importance_golden(refpath, monkeypatch):
    """beta=1.0 makes the reference's sampler fully deterministic (the
    coverage permutation is empty, `submodules.py:96-110`): the selected
    rows/cols must match our exact backend, with and without a gt mask."""
    from submodules.submodules import sample_points as ref_sp
    from sndepth_tpu.models import normal_decoder as nd
    monkeypatch.setattr(nd, "_SAMPLE", "exact")

    rng = np.random.RandomState(10)
    b, h, w = 2, 12, 16
    init = rng.rand(b, 4, h, w).astype(np.float32)
    mask = (rng.rand(b, 1, h, w) > 0.2).astype(np.float32)
    for gt_t, gt_j in ((None, None),
                       (_t(mask), jnp.asarray(mask.transpose(0, 2, 3, 1)))):
        with torch.no_grad():
            coords, rows, cols = ref_sp(_t(init), gt_t,
                                        sampling_ratio=0.4, beta=1.0)
        got_r, got_c = nd.sample_points(
            jax.random.PRNGKey(0),
            jnp.asarray(init.transpose(0, 2, 3, 1)), gt_j, 0.4, 1.0)
        np.testing.assert_array_equal(np.asarray(got_r), rows.numpy())
        np.testing.assert_array_equal(np.asarray(got_c), cols.numpy())
        # and the normalized grid coords the reference derives from them
        np.testing.assert_allclose(
            coords[:, 0, :, 0].numpy(),
            np.asarray(got_c) / float(w - 1) * 2.0 - 1.0, atol=1e-6)
        np.testing.assert_allclose(
            coords[:, 0, :, 1].numpy(),
            np.asarray(got_r) / float(h - 1) * 2.0 - 1.0, atol=1e-6)


# ---------------------------------------------------------------------------
# NNET decoder (test path)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_nnet_decoder_forward_golden(refpath):
    """The reference's own submodules.decoder.Decoder in test mode
    (dense per-pixel MLPs, `decoder.py:59-201`) on synthetic encoder
    features at the real B5 channel widths, through
    convert_normal_decoder."""
    from submodules.decoder import Decoder as RefDecoder
    torch.manual_seed(4)
    args = types.SimpleNamespace(sampling_ratio=0.4, importance_ratio=0.7,
                                 architecture="GN")
    tm = RefDecoder(args).eval()

    rng = np.random.RandomState(4)
    h8 = 4  # 1/8-res height/width; full res would be 32x32
    chans = {4: (24, h8 * 8), 5: (40, h8 * 4), 6: (64, h8 * 2),
             8: (176, h8), 11: (2048, h8 // 2)}
    features = [None] * 12
    for i, (c, s) in chans.items():
        features[i] = _t((rng.rand(1, c, s, s) - 0.5).astype(np.float32))
    with torch.no_grad():
        want, _, _ = tm(features, gt_norm_mask=None, mode="test")
    want = [t.numpy() for t in want]

    from sndepth_tpu.models.normal_decoder import NormalDecoder
    from sndepth_tpu.utils.convert_weights import convert_normal_decoder
    variables = convert_normal_decoder(tm.state_dict(), architecture="GN")
    dec = NormalDecoder(architecture="GN")
    feats = {k: jnp.asarray(features[i].numpy().transpose(0, 2, 3, 1))
             for k, i in (("stage0", 4), ("stage1", 5), ("stage2", 6),
                          ("stage4", 8), ("head", 11))}
    outs, _, _ = dec.apply(variables, feats, mode="test")
    for s, (got, ref) in enumerate(zip(outs, want)):
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   ref, atol=3e-5, err_msg=f"scale {s}")
