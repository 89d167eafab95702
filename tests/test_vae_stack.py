"""Tests for the VAE / attention / denoiser / ViT stack."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sndepth_tpu.models.attention import (BasicTransformerBlock,
                                          CrossAttention, LinearAttention,
                                          SpatialTransformer,
                                          SpatialTransformer3D)
from sndepth_tpu.models.denoiser import (Denoiser, TimeStepEmbedding,
                                         harmonic_embedding,
                                         harmonic_out_dim,
                                         timestep_embedding)
from sndepth_tpu.models.vae import (AutoencoderKL, DiagonalGaussian,
                                    VAEConfig, normal_kl)
from sndepth_tpu.utils.diffusion import (extract_into_tensor,
                                         make_beta_schedule,
                                         make_ddim_timesteps)


def test_diagonal_gaussian_stats():
    rng = np.random.RandomState(0)
    mean = rng.randn(2, 4, 4, 3).astype(np.float32)
    logvar = rng.randn(2, 4, 4, 3).astype(np.float32)
    moments = jnp.concatenate([jnp.array(mean), jnp.array(logvar)], -1)
    dist = DiagonalGaussian(moments)
    np.testing.assert_allclose(np.asarray(dist.mode()), mean)
    # KL to standard normal: closed form check on a simple case
    d2 = DiagonalGaussian(jnp.zeros((1, 1, 1, 2)))
    np.testing.assert_allclose(np.asarray(d2.kl()), 0.0, atol=1e-6)
    # sample statistics
    samples = dist.sample(jax.random.PRNGKey(0))
    assert samples.shape == mean.shape


def test_normal_kl_zero_for_identical():
    x = jnp.array([0.3, -0.1])
    lv = jnp.array([0.2, -0.5])
    np.testing.assert_allclose(np.asarray(normal_kl(x, lv, x, lv)), 0.0,
                               atol=1e-7)


@pytest.mark.slow
def test_autoencoder_shapes_and_latent_res():
    cfg = VAEConfig(base_ch=32, ch_mult=(1, 2, 2), num_res_blocks=1)
    model = AutoencoderKL(cfg)
    x = jnp.zeros((1, 32, 48, 4))
    variables = model.init(jax.random.PRNGKey(0), x,
                           rng=jax.random.PRNGKey(1))
    rec, posterior = model.apply(variables, x, rng=jax.random.PRNGKey(1))
    # 3 levels -> 1/4 latent
    assert posterior.mean.shape == (1, 8, 12, 4)
    assert rec.shape == (1, 32, 48, 4)
    assert np.isfinite(np.asarray(rec)).all()


def test_cross_attention_shapes():
    attn = CrossAttention(heads=2, dim_head=8)
    x = jnp.zeros((2, 5, 16))
    ctx = jnp.zeros((2, 7, 12))
    v = attn.init(jax.random.PRNGKey(0), x, ctx)
    out = attn.apply(v, x, ctx)
    assert out.shape == (2, 5, 16)


def test_linear_attention_shapes():
    la = LinearAttention(heads=2, dim_head=4)
    x = jnp.zeros((1, 6, 8, 12))
    v = la.init(jax.random.PRNGKey(0), x)
    assert la.apply(v, x).shape == (1, 6, 8, 12)


def test_spatial_transformer_residual_at_init():
    # Output projection is zero-initialized -> module is identity at init.
    st = SpatialTransformer(heads=2, dim_head=8)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 4, 4, 32), jnp.float32)
    v = st.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(st.apply(v, x)), np.asarray(x),
                               atol=1e-5)


def test_spatial_transformer_3d_cross_frame():
    st = SpatialTransformer3D(frames=2, heads=2, dim_head=8)
    x = jnp.zeros((4, 4, 4, 32))  # (b f) = 4 with f=2
    v = st.init(jax.random.PRNGKey(0), x)
    assert st.apply(v, x).shape == (4, 4, 4, 32)


def test_harmonic_embedding():
    x = jnp.array([[0.5, -1.0]])
    out = np.asarray(harmonic_embedding(x, n_harmonics=3))
    assert out.shape == (1, 2 * (2 * 3 + 1))
    np.testing.assert_allclose(out[0, 0], np.sin(0.5), atol=1e-6)
    np.testing.assert_allclose(out[0, -2:], [0.5, -1.0], atol=1e-6)
    assert harmonic_out_dim(9) == 189


def test_timestep_embedding_structure():
    emb = np.asarray(timestep_embedding(jnp.array([0.0, 5.0]), 8))
    assert emb.shape == (2, 8)
    np.testing.assert_allclose(emb[0, :4], 1.0)    # cos(0)
    np.testing.assert_allclose(emb[0, 4:], 0.0, atol=1e-7)    # sin(0)


def test_denoiser_shapes():
    model = Denoiser(num_layers=2, d_model=64, dim_feedforward=128)
    x = jnp.zeros((2, 4, 9))
    t = jnp.array([3, 7])
    z = jnp.zeros((2, 4, 384))
    v = model.init(jax.random.PRNGKey(0), x, t, z)
    out = model.apply(v, x, t, z)
    assert out.shape == (2, 4, 9)


@pytest.mark.slow
def test_vit_extractor():
    from sndepth_tpu.models.vit import MultiScaleImageFeatureExtractor
    model = MultiScaleImageFeatureExtractor(scale_factors=(1.0, 0.5))
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    feat = model.apply(v, x)
    assert feat.shape == (1, 384)


def test_beta_schedules():
    for name in ("linear", "cosine", "sqrt_linear", "sqrt"):
        betas = make_beta_schedule(name, 100)
        assert betas.shape == (100,)
        assert (betas >= 0).all() and (betas <= 1).all()
    ts = make_ddim_timesteps("uniform", 10, 100)
    assert ts.shape == (10,)
    out = extract_into_tensor(np.arange(10.0), jnp.array([2, 5]),
                              (2, 3, 3, 1))
    assert out.shape == (2, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), [2.0, 5.0])


def test_chunked_attention_matches_dense():
    """chunked_attention (the TPU memory-efficient path) is exact vs the
    dense softmax attention for any chunk size, with and without mask."""
    from sndepth_tpu.models.attention import chunked_attention

    rng = np.random.RandomState(0)
    b, n, m, h, d = 2, 37, 29, 4, 16
    q = jnp.asarray(rng.randn(b, n, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, m, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, m, h, d), jnp.float32)
    mask = jnp.asarray(rng.rand(b, m) > 0.3)

    def dense(q, k, v, mask):
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (d ** -0.5)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits, -1e9)
        return jnp.einsum("bhnm,bmhd->bnhd",
                          jax.nn.softmax(logits, -1), v)

    for chunk in (8, 16, 64):
        for msk in (None, mask):
            got = chunked_attention(q, k, v, chunk=chunk, mask=msk)
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(dense(q, k, v, msk)),
                                       atol=1e-5)


def test_transformer_block_21_and_spatial_21():
    """The _21 variants (`attention.py:349-471`): disable_self_attn routes
    context into attn1; use_linear swaps 1x1 convs for Dense."""
    from sndepth_tpu.models.attention import (BasicTransformerBlock21,
                                              SpatialTransformer21)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 20, 32), jnp.float32)
    ctx = jnp.asarray(rng.randn(2, 7, 32), jnp.float32)

    blk = BasicTransformerBlock21(heads=2, dim_head=16,
                                  disable_self_attn=True)
    v = blk.init(jax.random.PRNGKey(0), x, ctx)
    y = blk.apply(v, x, ctx)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()
    # disable_self_attn must actually consume the context in attn1: a
    # context perturbation must change the output even with attn2's
    # context zeroed out... both consume ctx, so compare against the
    # self-attn variant instead: param trees must match in structure.
    blk_sa = BasicTransformerBlock21(heads=2, dim_head=16)
    v_sa = blk_sa.init(jax.random.PRNGKey(0), x, ctx)
    assert (jax.tree_util.tree_structure(v["params"]) ==
            jax.tree_util.tree_structure(v_sa["params"]))
    y_sa = blk_sa.apply(v_sa, x, ctx)
    assert not np.allclose(np.asarray(y), np.asarray(y_sa))

    img = jnp.asarray(rng.randn(2, 8, 12, 32), jnp.float32)
    for use_linear in (False, True):
        st = SpatialTransformer21(heads=2, dim_head=16, depth=2,
                                  use_linear=use_linear)
        vs = st.init(jax.random.PRNGKey(2), img, [ctx, None])
        out = st.apply(vs, img, [ctx, None])
        assert out.shape == img.shape
        assert np.isfinite(np.asarray(out)).all()


def test_ddpm_unet_variants():
    """DDPMUNet / SimpleDecoder / UpsampleDecoder / LatentRescaler
    (`vae_model.py:208-744`) run, keep shape contracts, stay finite."""
    from sndepth_tpu.models.vae import (DDPMUNet, LatentRescaler,
                                        SimpleDecoder, UpsampleDecoder)

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3),
                    jnp.float32)
    unet = DDPMUNet(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                    attn_resolutions=(8,), resolution=16)
    t = jnp.array([3, 7], jnp.int32)
    params = unet.init(rng, x, t)
    y = unet.apply(params, x, t)
    assert y.shape == (2, 16, 16, 3) and np.isfinite(np.asarray(y)).all()
    # context concat path + no-timestep path
    unet2 = DDPMUNet(ch=32, out_ch=2, ch_mult=(1, 2), num_res_blocks=1,
                     resolution=16, use_timestep=False)
    p2 = unet2.init(rng, x, None, x[..., :1])
    y2 = unet2.apply(p2, x, None, x[..., :1])
    assert y2.shape == (2, 16, 16, 2)

    z = jnp.tile(x[:, :8, :8, :], (1, 1, 1, 11))[..., :32]
    sd = SimpleDecoder(out_channels=4)
    ps = sd.init(rng, z)
    ys = sd.apply(ps, z)
    assert ys.shape == (2, 16, 16, 4)

    ud = UpsampleDecoder(out_channels=3, ch=32, num_res_blocks=1,
                         ch_mult=(2, 2))
    pu = ud.init(rng, z)
    yu = ud.apply(pu, z)
    assert yu.shape == (2, 16, 16, 3)

    lr = LatentRescaler(factor=1.5, mid_channels=32, out_channels=5,
                        depth=1)
    pl = lr.init(rng, z)
    yl = lr.apply(pl, z)
    assert yl.shape == (2, 12, 12, 5)


def test_dice_cost_matches_reference_formula():
    """dice_cost == the reference DiceCost math (`match_cost.py:32-84`),
    including the bilinear resize of GT to the prediction grid."""
    import torch
    import torch.nn.functional as F

    from sndepth_tpu.losses.track_loss import dice_cost

    rs = np.random.RandomState(1)
    pred = rs.rand(5, 8, 12).astype(np.float32)
    gt = rs.rand(3, 16, 24).astype(np.float32)

    tgt = F.interpolate(torch.from_numpy(gt).unsqueeze(0), size=(8, 12),
                        mode="bilinear").squeeze(0)
    p = torch.from_numpy(pred).reshape(5, -1)[:, None, :]
    g = tgt.reshape(3, -1)[None, :, :]
    a = torch.sum(p * g, -1)
    b = torch.sum(p * p, -1) + 0.001
    c = torch.sum(g * g, -1) + 0.001
    want = (1 - (2 * a) / (b + c)) * 2.0

    got = dice_cost(jnp.asarray(pred), jnp.asarray(gt), weight=2.0)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-5,
                               atol=2e-6)
