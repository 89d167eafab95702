"""Tests for the motion-segmentation family."""

import numpy as np
import jax
import jax.numpy as jnp

from sndepth_tpu.data.kitti_motion import (KITTIMotionDataset,
                                           synthetic_motion_batches)
from sndepth_tpu.losses.segmentation import cross_entropy, weighted_motion_ce
from sndepth_tpu.models.motionseg import (MotionFeatureNet, MotionFusionNet,
                                          SemanticFeatureNet)
from sndepth_tpu.train import motion

H, W = 32, 64


def test_tower_output_shapes():
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, H, W, 3))
    mf = MotionFeatureNet()
    v = mf.init(rng, x)
    out = mf.apply(v, x)
    assert out.shape == (1, H // 16, W // 16, 512)

    sf = SemanticFeatureNet()
    v = sf.init(rng, x)
    out = sf.apply(v, x)
    assert out.shape == (1, H // 16, W // 16, 2048)


def test_fusion_full_resolution_logits():
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, H, W, 3))
    net = MotionFusionNet()
    v = net.init(rng, x, x)
    logits = net.apply(v, x, x)
    assert logits.shape == (1, H, W, 3)


def test_cross_entropy_weighted_ignores_background():
    logits = jnp.zeros((1, 2, 2, 3))
    labels = jnp.zeros((1, 2, 2), jnp.int32)  # all background
    w = weighted_motion_ce(logits, labels)
    assert float(w) == 0.0
    labels2 = jnp.ones((1, 2, 2), jnp.int32)
    assert float(weighted_motion_ce(logits, labels2)) > 0


def test_cross_entropy_matches_manual():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 3, 4, 3).astype(np.float32)
    labels = rng.randint(0, 3, (2, 3, 4))
    got = float(cross_entropy(jnp.array(logits), jnp.array(labels)))
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = -np.mean(np.log(
        np.take_along_axis(p, labels[..., None], -1)[..., 0]))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_train_step_learns_synthetic():
    state = motion.init_motion_state(jax.random.PRNGKey(0), H, W)
    step = motion.make_train_step()
    batches = synthetic_motion_batches(2, H, W, seed=0)
    batch = next(batches)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # BatchNorm stats must actually update
    stats_sum = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), state.batch_stats, 0.0)
    assert stats_sum > 0


def test_eval_step_miou():
    state = motion.init_motion_state(jax.random.PRNGKey(0), H, W)
    batch = next(synthetic_motion_batches(1, H, W))
    out = motion.make_eval_step()(state, batch)
    miou = float(out["miou"])
    assert 0.0 <= miou <= 1.0
    assert out["pred"].shape == (1, H, W)


def test_kitti_motion_dataset(tmp_path):
    from PIL import Image
    for split in ("train",):
        for sub in ("image", "flow", "label"):
            (tmp_path / split / sub).mkdir(parents=True)
        rng = np.random.RandomState(0)
        for i in range(3):
            img = rng.randint(0, 255, (32, 48, 3), np.uint8)
            Image.fromarray(img).save(tmp_path / split / "image" / f"{i}.png")
            Image.fromarray(img).save(tmp_path / split / "flow" / f"{i}.png")
            lbl = np.zeros((32, 48, 3), np.uint8)
            lbl[..., 0] = (rng.randint(0, 3, (32, 48)) * 100).astype(np.uint8)
            Image.fromarray(lbl).save(tmp_path / split / "label" / f"{i}.png")
    ds = KITTIMotionDataset(str(tmp_path), train=True)
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (32, 48, 3)
    assert s["image"].max() <= 1.0
    assert set(np.unique(s["label"])) <= {0, 1, 2}


def test_matmul_deconv16_matches_conv_transpose():
    """_MatmulDeconv16 == nn.ConvTranspose(k=16, s=16) exactly (same param
    tree; matmul + depth-to-space form with flipped taps), fwd and grads."""
    import flax.linen as nn
    import jax.numpy as jnp

    from sndepth_tpu.models.motionseg import _MatmulDeconv16

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, 5, 8), jnp.float32)
    ref = nn.ConvTranspose(3, (16, 16), strides=(16, 16), dtype=jnp.float32)
    v = ref.init(jax.random.PRNGKey(0), x)
    mod = _MatmulDeconv16(3, jnp.float32)
    np.testing.assert_allclose(np.asarray(mod.apply(v, x)),
                               np.asarray(ref.apply(v, x)),
                               rtol=1e-6, atol=1e-6)
    g = jnp.asarray(rng.randn(2, 48, 80, 3), jnp.float32)
    gr = jax.grad(lambda vv, xx: jnp.sum(ref.apply(vv, xx) * g),
                  argnums=(0, 1))(v, x)
    gm = jax.grad(lambda vv, xx: jnp.sum(mod.apply(vv, xx) * g),
                  argnums=(0, 1))(v, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4), gr, gm)
