"""Tests for the UniAD/BEVFormer tracking stack."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sndepth_tpu.losses import track_loss as tl
from sndepth_tpu.models import track_runtime as tr
from sndepth_tpu.models.bevformer import (bev_pillar_points,
                                          inverse_sigmoid,
                                          project_points_to_cams,
                                          shift_prev_bev)
from sndepth_tpu.models.coders import nms_free_decode
from sndepth_tpu.models.deformable import (CustomMSDeformableAttention,
                                           ms_deformable_attention)
from sndepth_tpu.utils.uniad import (denormalize_bbox, grid_mask,
                                     normalize_bbox, pos2posemb2d)


def _np_ms_deform(value, shapes, locs, weights):
    """Naive oracle of multi_scale_deformable_attn_pytorch semantics."""
    b, _, heads, dim = value.shape
    _, nq, _, L, P, _ = locs.shape
    out = np.zeros((b, nq, heads, dim), np.float32)
    start = 0
    for lvl, (h, w) in enumerate(shapes):
        v = value[:, start:start + h * w].reshape(b, h, w, heads, dim)
        start += h * w
        for bi in range(b):
            for qi in range(nq):
                for hi in range(heads):
                    for pi in range(P):
                        x, y = locs[bi, qi, hi, lvl, pi]
                        px, py = x * w - 0.5, y * h - 0.5
                        x0, y0 = int(np.floor(px)), int(np.floor(py))
                        fx, fy = px - x0, py - y0
                        acc = np.zeros(dim, np.float32)
                        for dy, wy in ((0, 1 - fy), (1, fy)):
                            for dx, wx in ((0, 1 - fx), (1, fx)):
                                xi, yi = x0 + dx, y0 + dy
                                if 0 <= xi < w and 0 <= yi < h:
                                    acc += wx * wy * v[bi, yi, xi, hi]
                        out[bi, qi, hi] += acc * weights[bi, qi, hi, lvl, pi]
    return out.reshape(b, nq, heads * dim)


def test_ms_deformable_attention_matches_oracle():
    rng = np.random.RandomState(0)
    shapes = [(4, 6), (2, 3)]
    nk = sum(h * w for h, w in shapes)
    value = rng.randn(1, nk, 2, 4).astype(np.float32)
    locs = rng.rand(1, 5, 2, 2, 3, 2).astype(np.float32)
    weights = rng.rand(1, 5, 2, 2, 3).astype(np.float32)
    weights /= weights.sum((-1, -2), keepdims=True)
    got = np.asarray(ms_deformable_attention(
        jnp.array(value), shapes, jnp.array(locs), jnp.array(weights)))
    want = _np_ms_deform(value, shapes, locs, weights)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pillar_projection_geometry():
    pts = bev_pillar_points(4, 4, 2, (-10, -10, -2, 10, 10, 2))
    assert pts.shape == (2, 16, 3)
    # Simple pinhole looking down +x in lidar frame: P = K [R|t].
    lidar2img = jnp.eye(4)[None, None]
    ref, mask = project_points_to_cams(pts, lidar2img, 10, 10)
    assert ref.shape == (1, 1, 16, 2, 2)
    assert mask.shape == (1, 1, 16, 2)
    # Points with z <= 0 in camera space are masked.
    assert not bool(mask.all())


def test_shift_prev_bev_translation():
    bev = jnp.arange(16, dtype=jnp.float32).reshape(1, 16, 1)
    # shift of 1 grid cell in x: delta = 1/4 of grid
    out = np.asarray(shift_prev_bev(bev, 4, 4, jnp.array([[0.25, 0.0]])))
    grid = np.arange(16, dtype=np.float32).reshape(4, 4)
    want = np.zeros_like(grid)
    want[:, :-1] = grid[:, 1:]   # sampling at x+1
    np.testing.assert_allclose(out.reshape(4, 4), want, atol=1e-5)


def test_bbox_normalize_roundtrip():
    rng = np.random.RandomState(1)
    boxes = np.concatenate([
        rng.uniform(-20, 20, (5, 3)),       # center
        rng.uniform(0.5, 4.0, (5, 3)),      # dims
        rng.uniform(-np.pi, np.pi, (5, 1)),  # rot
        rng.uniform(-3, 3, (5, 2)),          # velocity
    ], -1).astype(np.float32)
    back = np.asarray(denormalize_bbox(normalize_bbox(jnp.array(boxes))))
    np.testing.assert_allclose(back, boxes, atol=1e-4)


def test_pos2posemb2d_shape():
    pos = jnp.zeros((3, 7, 2))
    emb = pos2posemb2d(pos, 128)
    assert emb.shape == (3, 7, 256)


def test_grid_mask_zeroes_cells():
    rng = jax.random.PRNGKey(0)
    imgs = jnp.ones((1, 16, 16, 3))
    out = np.asarray(grid_mask(rng, imgs, prob=1.0))
    assert out.min() == 0.0 and out.max() == 1.0


def test_tracker_update_birth_death():
    tracks = tr.empty_tracks(6, 8, num_classes=3)
    scores = jnp.array([0.9, 0.1, 0.5, 0.2, 0.8, 0.3])
    tracks = tracks.replace(track_scores=scores)
    tracks, next_id = tr.tracker_update(tracks, 0.4, 0.35, 2)
    obj = np.asarray(tracks.obj_idxes)
    assert obj[0] == 0 and obj[2] == 1 and obj[4] == 2  # births in order
    assert obj[1] == -1 and obj[3] == -1
    assert int(next_id) == 3

    # now drop scores below filter threshold for miss_tolerance frames
    tracks = tracks.replace(track_scores=jnp.full((6,), 0.1))
    tracks, next_id = tr.tracker_update(tracks, 0.4, 0.35, 2, next_id)
    assert (np.asarray(tracks.disappear_time)[[0, 2, 4]] == 1).all()
    tracks, next_id = tr.tracker_update(tracks, 0.4, 0.35, 2, next_id)
    assert (np.asarray(tracks.obj_idxes) == -1).all()   # all died


def test_velocity_reference_update():
    tracks = tr.empty_tracks(2, 4)
    tracks = tracks.replace(
        ref_pts=jnp.array([[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]]),
        obj_idxes=jnp.array([0, -1], jnp.int32))
    vel = jnp.array([[2.0, 0.0], [2.0, 0.0]])
    out = tr.velocity_update_reference_points(
        tracks, vel, jnp.asarray(1.0), (-10, -10, -2, 10, 10, 2))
    ref = np.asarray(out.ref_pts)
    np.testing.assert_allclose(ref[0], [0.6, 0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(ref[1], [0.5, 0.5, 0.5], atol=1e-6)  # inactive


def test_memory_bank_and_qim():
    mb = tr.MemoryBank(embed_dims=8, mem_len=3)
    tracks = tr.empty_tracks(4, 8)
    # Save gating follows the reference (`modules.py:38-45`): a slot is
    # pushed iff save_period==0 AND score > save_thresh; slot 3 scores 0.
    tracks = tracks.replace(
        obj_idxes=jnp.array([0, 1, -1, -1], jnp.int32),
        scores=jnp.array([0.9, 0.8, 0.7, 0.0]),
        output_embedding=jnp.ones((4, 8)))
    v = mb.init(jax.random.PRNGKey(0), tracks)
    out = mb.apply(v, tracks)
    assert bool(out.mem_valid[0, -1]) and not bool(out.mem_valid[3, -1])
    # pushed slots enter the 3-frame save cooldown
    assert int(out.save_period[0]) == 3 and int(out.save_period[3]) == 0
    # slots with no valid history pass their embedding through untouched
    np.testing.assert_allclose(np.asarray(out.output_embedding),
                               np.asarray(tracks.output_embedding))
    # second update: newest entry now valid -> temporal attn fuses
    out_b = mb.apply(v, out)
    assert not np.allclose(np.asarray(out_b.output_embedding[0]),
                           np.asarray(out.output_embedding[0]))

    qim = tr.QueryInteractionModule(embed_dims=8)
    vq = qim.init(jax.random.PRNGKey(0), out)
    out2 = qim.apply(vq, out)
    # inactive slots keep their original query
    np.testing.assert_allclose(np.asarray(out2.query[2]),
                               np.asarray(tracks.query[2]))


def test_hungarian_matches_scipy():
    rng = np.random.RandomState(2)
    cost = rng.rand(6, 4).astype(np.float32)
    valid = jnp.array([True, True, True, False])
    rows, cols = tl.hungarian_match(jnp.array(cost), valid)
    rows = np.asarray(rows)
    from scipy.optimize import linear_sum_assignment
    r, c = linear_sum_assignment(cost[:, :3])
    want = np.full(4, -1)
    want[c] = r
    np.testing.assert_array_equal(rows, want)


def test_clip_matcher_loss_runs_and_pins():
    rng = np.random.RandomState(3)
    nq, ng, nc = 8, 3, 5
    outputs = [{
        "logits": jnp.asarray(rng.randn(nq, nc), jnp.float32),
        "boxes": jnp.asarray(rng.randn(nq, 10), jnp.float32),
        "obj_idxes": jnp.array([7, -1, -1, -1, -1, -1, -1, -1]),
    }]
    gt = [{
        "labels": jnp.array([1, 2, 0]),
        "boxes": jnp.asarray(rng.randn(ng, 10), jnp.float32),
        "valid": jnp.array([True, True, False]),
        "instance_ids": jnp.array([7, 11, -1]),
    }]
    losses = tl.clip_matcher_loss(outputs, gt, num_classes=nc)
    assert np.isfinite(float(losses["loss_total"]))
    assert float(losses["loss_cls"]) > 0
    # GT 0 has instance id 7 which lives on query slot 0 -> pinned there.
    assigned, matched = tl.match_frame(
        outputs[0]["logits"], outputs[0]["boxes"], gt[0]["labels"],
        gt[0]["boxes"], gt[0]["valid"],
        pinned_query=jnp.array([0, -1, -1], jnp.int32))
    assert int(assigned[0]) == 0
    assert bool(matched[1]) and not bool(matched[2])


def test_nms_free_decode():
    rng = np.random.RandomState(4)
    logits = jnp.asarray(rng.randn(20, 3), jnp.float32)
    boxes = jnp.asarray(rng.randn(20, 10), jnp.float32)
    out = nms_free_decode(logits, boxes, max_num=5)
    assert out["bboxes"].shape == (5, 9)  # denormalized 9-dim boxes
    assert out["scores"].shape == (5,)
    s = np.asarray(out["scores"])
    assert (np.diff(s) <= 1e-6).all()   # sorted descending


@pytest.mark.slow
def test_uniad_track_single_frame():
    from sndepth_tpu.models.uniad_track import UniADTrack
    model = UniADTrack(
        num_query=12, num_classes=3, embed_dims=32, bev_h=4, bev_w=4,
        num_cams=2, encoder_layers=1, decoder_layers=1,
        backbone_blocks=(1, 1, 1, 1), mem_len=2)
    imgs = jnp.zeros((2, 1, 64, 64, 3))      # cams, B, H, W, 3
    lidar2img = jnp.tile(jnp.eye(4)[None, None], (1, 2, 1, 1))

    def init_fn(rng):
        st = model.init(rng, imgs, lidar2img,
                        _dummy_state(model), method=model.__call__)
        return st

    def _dummy_state(m):
        from sndepth_tpu.models.uniad_track import TrackState
        from sndepth_tpu.models.track_runtime import empty_tracks
        return TrackState(
            prev_bev=jnp.zeros((1, 16, 32)),
            tracks=empty_tracks(12, 32, 3, 2),
            next_obj_id=jnp.zeros((), jnp.int32),
            timestamp=jnp.zeros(()),
            has_prev=jnp.zeros((), bool))

    variables = init_fn(jax.random.PRNGKey(0))
    state, results = model.apply(variables, imgs, lidar2img,
                                 _dummy_state(model))
    assert results["bboxes"].shape[1] == 9 or results["bboxes"].shape[1] == 10
    assert state.prev_bev.shape == (1, 16, 32)
    assert np.isfinite(np.asarray(results["scores"])).all()

    # second frame consumes the carried state
    state2, results2 = model.apply(variables, imgs, lidar2img, state)
    assert bool(state2.has_prev)


def test_deform_conv_zero_init_is_half_conv():
    """DCNv2 with zero-initialized conv_offset: offsets are 0 and the
    modulation mask is sigmoid(0) = 0.5, so the op equals 0.5x a plain
    3x3 conv with the same kernel (mmcv's init convention)."""
    from sndepth_tpu.models.deformable import DeformConv2d

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 9, 11, 6), jnp.float32)
    m = DeformConv2d(4, kernel=3, stride=1)
    v = m.init(jax.random.PRNGKey(0), x)
    got = np.asarray(m.apply(v, x))

    k = np.asarray(v["params"]["kernel"]).reshape(3, 3, 6, 4)
    want = 0.5 * np.asarray(jax.lax.conv_general_dilated(
        x, jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_deform_conv_stride_and_grads():
    from sndepth_tpu.models.deformable import DeformConv2d

    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(1, 8, 12, 5), jnp.float32)
    m = DeformConv2d(7, kernel=3, stride=2)
    v = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(v, x)
    assert out.shape == (1, 4, 6, 7)

    def loss(params):
        return jnp.sum(m.apply({"params": params}, x) ** 2)

    g = jax.grad(loss)(v["params"])
    gk = float(jnp.abs(g["kernel"]).sum())
    go = float(jnp.abs(g["conv_offset"]["kernel"]).sum())
    assert np.isfinite(gk) and gk > 0
    assert np.isfinite(go) and go > 0   # offsets receive gradient


def test_uniad_backbone_dcn_stages():
    """ResNetFPN instantiates DeformConv2d exactly in the configured
    stages (reference stage_with_dcn=(False, False, True, True))."""
    from sndepth_tpu.models.uniad_track import ResNetFPN
    net = ResNetFPN(stage_blocks=(1, 1, 1, 1), embed_dims=16)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    flat = "/".join(str(k) for k in v["params"].keys())
    import flax
    keys = flax.traverse_util.flatten_dict(v["params"], sep="/").keys()
    dcn_blocks = {k.split("/")[0] for k in keys if "DeformConv2d" in k}
    # stages 0,1 plain (blocks 0-1), stages 2,3 DCN (blocks 2-3)
    assert dcn_blocks == {"_Bottleneck_2", "_Bottleneck_3"}, dcn_blocks


def test_uniad_carried_state_dtypes_stable_bf16():
    """Regression for the cross-frame recompile bug class (r3 prev_bev,
    r5 track fields): under a bf16 model, EVERY leaf of the carried
    TrackState must keep the incoming state's dtype, or each chained
    frame retraces (a hidden ~390 s/step recompile at reference scale)."""
    from sndepth_tpu.models.track_runtime import empty_tracks
    from sndepth_tpu.models.uniad_track import TrackState, UniADTrack
    model = UniADTrack(
        num_query=12, num_classes=3, embed_dims=32, bev_h=4, bev_w=4,
        num_cams=2, encoder_layers=1, decoder_layers=1,
        backbone_blocks=(1, 1, 1, 1), mem_len=2, dtype=jnp.bfloat16)
    imgs = jnp.zeros((2, 1, 64, 64, 3))
    lidar2img = jnp.tile(jnp.eye(4)[None, None], (1, 2, 1, 1))
    state0 = TrackState(
        prev_bev=jnp.zeros((1, 16, 32)),
        tracks=empty_tracks(12, 32, 3, 2),
        next_obj_id=jnp.zeros((), jnp.int32),
        timestamp=jnp.zeros(()),
        has_prev=jnp.zeros((), bool))
    variables = model.init(jax.random.PRNGKey(0), imgs, lidar2img, state0)
    state1, _ = model.apply(variables, imgs, lidar2img, state0)
    for a, b in zip(jax.tree_util.tree_leaves(state0),
                    jax.tree_util.tree_leaves(state1)):
        assert jnp.asarray(a).dtype == jnp.asarray(b).dtype, (
            f"carried dtype changed: {jnp.asarray(a).dtype} -> "
            f"{jnp.asarray(b).dtype}")
