"""UniAD tracker training path: clip loss, aux/past-traj terms, descent.

Covers the reference's `_forward_single_frame_train` / `forward_track_train`
(`/root/reference/models/track_uniad.py:363-586`) and the ClipMatcher
aux-layer + past-traj losses (`models/register_module/track_loss.py`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sndepth_tpu.losses import track_loss as tl
from sndepth_tpu.models import track_runtime as tr
from sndepth_tpu.models.uniad_track import UniADTrack
from sndepth_tpu.train import uniad as tu


def _tiny_model():
    return UniADTrack(
        num_query=12, num_classes=3, embed_dims=32, bev_h=4, bev_w=4,
        num_cams=2, encoder_layers=1, decoder_layers=2,
        backbone_blocks=(1, 1, 1, 1), mem_len=2)


def test_train_frame_layer_losses_terms_and_binding():
    rng = np.random.RandomState(0)
    L, nq, ng, nc, steps = 2, 8, 3, 4, 5
    logits = jnp.asarray(rng.randn(L, nq, nc), jnp.float32)
    boxes = jnp.asarray(rng.randn(L, nq, 10), jnp.float32)
    trajs = jnp.asarray(rng.randn(L, nq, steps, 2), jnp.float32)
    obj = jnp.full((nq,), -1, jnp.int32).at[3].set(11)  # slot 3 tracks 11
    gt = {
        "labels": jnp.array([0, 1, 2]),
        "boxes": jnp.asarray(rng.randn(ng, 10), jnp.float32),
        "valid": jnp.array([True, True, True]),
        "instance_ids": jnp.array([11, 21, 31]),
        "past_traj": jnp.asarray(rng.randn(ng, steps, 2), jnp.float32),
        "past_traj_mask": jnp.ones((ng, steps, 2), jnp.float32),
    }
    losses, new_obj, assigned, matched = tl.train_frame_layer_losses(
        logits, boxes, trajs, obj, gt, nc, sdc_slot=nq - 1)
    for k in ("loss_cls", "loss_bbox", "loss_past_trajs"):
        assert np.isfinite(float(losses[k])), k
        assert float(losses[k]) > 0, k
    # GT 0 (instance 11) stays pinned to slot 3.
    assert int(assigned[0]) == 3
    assert bool(matched.all())
    new_obj = np.asarray(new_obj)
    # newly matched slots now carry the GT instance ids
    assert set(new_obj[new_obj >= 0]) == {11, 21, 31}
    # the sdc slot is never used for matching
    assert int(new_obj[-1]) == -1
    assert nq - 1 not in np.asarray(assigned)


def test_aux_layer_losses_differ_from_final():
    """Aux decoder layers are matched against their own predictions: with
    different per-layer outputs, the 2-layer loss must differ from 2x the
    final layer's loss."""
    rng = np.random.RandomState(1)
    nq, ng, nc, steps = 8, 2, 3, 4
    final_logits = rng.randn(nq, nc).astype(np.float32)
    aux_logits = rng.randn(nq, nc).astype(np.float32)
    boxes = rng.randn(nq, 10).astype(np.float32)
    trajs = rng.randn(nq, steps, 2).astype(np.float32)
    gt = {
        "labels": jnp.array([0, 1]),
        "boxes": jnp.asarray(rng.randn(ng, 10), jnp.float32),
        "valid": jnp.array([True, True]),
        "instance_ids": jnp.array([5, 6]),
        "past_traj": jnp.asarray(rng.randn(ng, steps, 2), jnp.float32),
        "past_traj_mask": jnp.ones((ng, steps, 2), jnp.float32),
    }
    obj = jnp.full((nq,), -1, jnp.int32)
    two, *_ = tl.train_frame_layer_losses(
        jnp.stack([aux_logits, final_logits]),
        jnp.stack([boxes, boxes]), jnp.stack([trajs, trajs]),
        obj, gt, nc)
    one, *_ = tl.train_frame_layer_losses(
        jnp.stack([final_logits]), jnp.stack([boxes]), jnp.stack([trajs]),
        obj, gt, nc)
    assert abs(float(two["loss_cls"]) - 2 * float(one["loss_cls"])) > 1e-8


def test_qim_select_train_drop_and_fp():
    tracks = tr.empty_tracks(10, 8)
    tracks = tracks.replace(
        obj_idxes=jnp.array([0, 1, 2, 3, -1, -1, -1, -1, -1, -1]),
        iou=jnp.array([0.9, 0.9, 0.9, 0.9, 0, 0, 0, 0, 0, 0.0]),
        scores=jnp.arange(10, dtype=jnp.float32) / 10.0)
    keep = np.asarray(tr.qim_select_train(
        tracks, jax.random.PRNGKey(0), random_drop=0.0, fp_ratio=0.0))
    assert keep[:4].all() and not keep[4:].any()

    # fp_ratio=1: every active track injects one FP; the top-scoring
    # inactive slots are selected.
    keep_fp = np.asarray(tr.qim_select_train(
        tracks, jax.random.PRNGKey(0), random_drop=0.0, fp_ratio=1.0))
    assert keep_fp[:4].all()
    assert keep_fp[4:].sum() == 4
    assert keep_fp[9] and keep_fp[8] and keep_fp[7] and keep_fp[6]

    # random_drop=1: everything dropped, nothing to inject FPs for.
    keep_none = np.asarray(tr.qim_select_train(
        tracks, jax.random.PRNGKey(0), random_drop=1.0, fp_ratio=1.0))
    assert not keep_none.any()


@pytest.mark.slow
def test_uniad_train_step_descends():
    model = _tiny_model()
    clip = tu.synthetic_clip(model, t_frames=3, ng=3, img_hw=(64, 64))
    state = tu.create_train_state(model, clip, learning_rate=1e-3)
    step = tu.make_train_step(model, learning_rate=1e-3)

    losses = []
    for _ in range(6):
        state, metrics = step(state, clip)
        val = float(metrics["loss_total"])
        assert np.isfinite(val)
        for k in ("loss_cls", "loss_bbox", "loss_past_trajs"):
            assert np.isfinite(float(metrics[k])), k
        losses.append(val)
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6


def test_uniad_remat_same_params_and_loss():
    """remat=True must leave the param tree AND the loss identical (it
    only changes what the backward stores) — the reference-scale memory
    path depends on this being a pure no-op on values."""
    model = _tiny_model()
    model_r = UniADTrack(
        num_query=12, num_classes=3, embed_dims=32, bev_h=4, bev_w=4,
        num_cams=2, encoder_layers=1, decoder_layers=2,
        backbone_blocks=(1, 1, 1, 1), mem_len=2, remat=True)
    clip = tu.synthetic_clip(model, t_frames=2, ng=3, img_hw=(64, 64))
    rng = jax.random.PRNGKey(0)
    v0 = tu.init_uniad_variables(model, clip, rng)
    v1 = tu.init_uniad_variables(model_r, clip, rng)
    assert (jax.tree_util.tree_structure(v0)
            == jax.tree_util.tree_structure(v1))
    for a, b in zip(jax.tree_util.tree_leaves(v0),
                    jax.tree_util.tree_leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    qim = jax.random.PRNGKey(7)

    def loss(m, params):
        return m.apply({"params": params}, clip["imgs_seq"],
                       clip["lidar2img"], clip["gt"], clip["timestamps"],
                       method=m.train_clip, rngs={"qim": qim})[0]

    l0, g0 = jax.value_and_grad(lambda p: loss(model, p))(v0["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(model_r, p))(v1["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jnp.concatenate([x.ravel() for x in
                             jax.tree_util.tree_leaves(g0)])
    flat1 = jnp.concatenate([x.ravel() for x in
                             jax.tree_util.tree_leaves(g1)])
    np.testing.assert_allclose(np.asarray(flat1), np.asarray(flat0),
                               atol=1e-5)


def test_train_uniad_cli_smoke(tmp_path):
    """cli/train_uniad drives the clip-training path end-to-end: losses
    printed (incl. past-traj term), loss decreases, checkpoint lands."""
    from sndepth_tpu.cli.train_uniad import main

    main(["--small", "--max_steps", "4", "--log_every", "2",
          "--ckpt_dir", str(tmp_path / "ck")])
    from sndepth_tpu.train import checkpoint as ckpt_lib
    assert ckpt_lib.latest_step(str(tmp_path / "ck")) == 4
