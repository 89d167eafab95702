"""Golden parity vs the ACTUAL reference code (VERDICT r3 #2).

These tests import the reference's own modules from /root/reference
(torch + cv2 run on CPU here; `utils_edited.device` falls back to CPU)
and use them as the oracle — not hand-built replicas. Covered:

* `utils_edited.DSSIM` (:121-141)          vs `ops/ssim.dssim`
* `loss_functions.image_similarity` (:4-6) vs `ops/ssim.image_similarity`
* `loss_functions.smooth_loss` (:8-24)     vs `losses/photometric.smooth_loss`
* `utils_edited.bilinear_sampler` (:402-486) / `flow_warp` (:386)
                                           vs `ops/warp.*`
* `utils_edited.pose_vec2mat` (:268) / `compute_rigid_flow` (:331)
                                           vs `ops/camera.*`
* `utils_edited.scale_pyramid` (:89) / `compute_multi_scale_intrinsics`
  (:149)                                   vs `ops/pyramid.*`, `ops/camera.*`
* `models.DispNetS` / `models.PoseNet` forwards through the converter
                                           vs `models/dispnet.py`, `posenet.py`
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("cv2")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    added = False
    if REF not in sys.path:
        sys.path.append(REF)       # append: never shadow our packages
        added = True
    import importlib
    ue = importlib.import_module("utils.utils_edited")
    lf = importlib.import_module("models.loss_functions")
    yield ue, lf
    if added:
        sys.path.remove(REF)


def _t(x):
    return torch.from_numpy(np.asarray(x))


@pytest.mark.slow
def test_dssim_and_image_similarity_golden(ref):
    ue, lf = ref
    rng = np.random.RandomState(0)
    x = rng.rand(2, 16, 24, 3).astype(np.float32)
    y = rng.rand(2, 16, 24, 3).astype(np.float32)
    with torch.no_grad():
        want = ue.DSSIM(_t(x), _t(y)).numpy()
    from sndepth_tpu.ops.ssim import dssim, image_similarity
    got = np.asarray(dssim(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, atol=1e-6)

    with torch.no_grad():
        want_sim = lf.image_similarity(0.85, _t(x), _t(y)).numpy()
    got_sim = np.asarray(image_similarity(0.85, jnp.asarray(x),
                                          jnp.asarray(y)))
    np.testing.assert_allclose(got_sim, want_sim, atol=1e-6)


@pytest.mark.slow
def test_smooth_loss_golden(ref):
    ue, lf = ref
    rng = np.random.RandomState(1)
    depth = rng.rand(3, 16, 24, 1).astype(np.float32)
    image = rng.rand(3, 16, 24, 3).astype(np.float32)
    with torch.no_grad():
        want = float(lf.smooth_loss(_t(depth), _t(image)))
    from sndepth_tpu.losses.photometric import smooth_loss
    got = float(smooth_loss(jnp.asarray(depth), jnp.asarray(image)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.slow
def test_bilinear_sampler_golden(ref):
    """Includes out-of-range coords: the reference's border-clamp quirk
    (weights from CLAMPED corners zero the exact last row/col,
    `utils_edited.py:444-447`) must reproduce bit-for-bit."""
    ue, _ = ref
    rng = np.random.RandomState(2)
    imgs = rng.rand(2, 13, 21, 3).astype(np.float32)
    coords = rng.uniform(-4, 25, (2, 13, 21, 2)).astype(np.float32)
    with torch.no_grad():
        want = ue.bilinear_sampler(_t(imgs), _t(coords)).numpy()
    from sndepth_tpu.ops.warp import bilinear_sampler
    got = np.asarray(bilinear_sampler(jnp.asarray(imgs),
                                      jnp.asarray(coords)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_flow_warp_golden(ref):
    ue, _ = ref
    rng = np.random.RandomState(3)
    src = rng.rand(2, 12, 20, 3).astype(np.float32)
    flow = rng.uniform(-3, 3, (2, 12, 20, 2)).astype(np.float32)
    with torch.no_grad():
        want = ue.flow_warp(_t(src), _t(flow)).numpy()
    from sndepth_tpu.ops.warp import flow_warp
    got = np.asarray(flow_warp(jnp.asarray(src), jnp.asarray(flow)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_pose_vec2mat_and_rigid_flow_golden(ref):
    ue, _ = ref
    rng = np.random.RandomState(4)
    vec = (rng.rand(4, 6).astype(np.float32) - 0.5) * 0.2
    with torch.no_grad():
        want_mat = ue.pose_vec2mat(_t(vec)).numpy()
    from sndepth_tpu.ops.camera import compute_rigid_flow, pose_vec2mat
    got_mat = np.asarray(pose_vec2mat(jnp.asarray(vec)))
    np.testing.assert_allclose(got_mat, want_mat, atol=1e-6)

    b, h, w = 2, 12, 20
    depth = (rng.rand(b, h, w).astype(np.float32) * 5 + 1)
    intr = np.tile(np.array([[[w * 0.58, 0, w / 2],
                              [0, h * 1.92, h / 2],
                              [0, 0, 1]]], np.float32), (b, 1, 1))
    pose = (rng.rand(b, 6).astype(np.float32) - 0.5) * 0.2
    for reverse in (False, True):
        with torch.no_grad():
            want = ue.compute_rigid_flow(_t(pose), _t(depth), _t(intr),
                                         reverse).numpy()
        got = np.asarray(compute_rigid_flow(jnp.asarray(pose),
                                            jnp.asarray(depth),
                                            jnp.asarray(intr), reverse))
        np.testing.assert_allclose(got, want, atol=2e-4,
                                   err_msg=f"reverse={reverse}")


@pytest.mark.slow
def test_scale_pyramid_and_intrinsics_golden(ref):
    ue, _ = ref
    rng = np.random.RandomState(5)
    img = rng.rand(2, 3, 16, 32).astype(np.float32)        # torch NCHW
    with torch.no_grad():
        want = [s.numpy() for s in ue.scale_pyramid(_t(img), 4)]
    from sndepth_tpu.ops.pyramid import scale_pyramid
    got = scale_pyramid(jnp.asarray(img.transpose(0, 2, 3, 1)), 4)
    assert len(got) == len(want)
    for g, wv in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), wv, atol=1e-6)

    intr = np.tile(np.array([[[100.0, 0, 16], [0, 200.0, 8],
                              [0, 0, 1]]], np.float32), (3, 1, 1))
    with torch.no_grad():
        want_k = ue.compute_multi_scale_intrinsics(_t(intr), 4).numpy()
    from sndepth_tpu.ops.camera import compute_multi_scale_intrinsics
    got_k = np.asarray(compute_multi_scale_intrinsics(jnp.asarray(intr), 4))
    np.testing.assert_allclose(got_k, want_k, atol=1e-6)


@pytest.mark.slow
def test_propagate_golden(ref):
    """`utils_edited.propagate` (:526-563) — the reference hardcodes
    batch 4 (`torch.zeros((4, ...))`); we reproduce its math for any
    batch, checked here at its batch."""
    ue, _ = ref
    rng = np.random.RandomState(6)
    b, c, h, w = 4, 3, 10, 14
    data = rng.rand(b, c, h, w).astype(np.float32)
    ds = [rng.rand(b, 1, h, w).astype(np.float32) for _ in range(4)]
    with torch.no_grad():
        want = ue.propagate(_t(data), *[_t(d) for d in ds], c, h, w).numpy()
    from sndepth_tpu.ops.edges import propagate
    got = np.asarray(propagate(
        jnp.asarray(data.transpose(0, 2, 3, 1)),
        *[jnp.asarray(d.transpose(0, 2, 3, 1)) for d in ds]))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-6)


@pytest.mark.slow
def test_dispnet_forward_golden(ref):
    """The reference's own models.DispNetS (not a replica), random-init,
    converted and compared over all 4 training scales."""
    del ref  # fixture only ensures sys.path
    from models.DispNetS import DispNetS as RefDispNetS
    torch.manual_seed(0)
    tm = RefDispNetS().train()      # train mode -> 4 disparity scales
    x = np.random.RandomState(0).randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = [d.numpy() for d in tm(torch.from_numpy(x))]

    from sndepth_tpu.models.dispnet import DispNetS
    from sndepth_tpu.utils.convert_weights import convert_dispnet
    params = convert_dispnet(tm.state_dict())
    net = DispNetS(dtype=jnp.float32)
    got = net.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    for s, (g, wv) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(g)[..., 0], wv[:, 0],
                                   atol=2e-3, err_msg=f"scale {s}")


@pytest.mark.slow
def test_flownet_forward_golden(ref):
    """The reference's own models.FlowNet (stage-2 ``flow_*.pth`` family,
    `baseline.py:1218-1232`) through the new convert_flownet, compared
    over all 4 flow scales."""
    del ref
    from models.FlowNet import FlowNet as RefFlowNet
    torch.manual_seed(2)
    tm = RefFlowNet(14, 0.1).eval()
    x = np.random.RandomState(2).randn(1, 14, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = [f.numpy() for f in tm(torch.from_numpy(x))]

    from sndepth_tpu.models.flownet import FlowNet
    from sndepth_tpu.utils.convert_weights import convert_flownet
    params = convert_flownet(tm.state_dict())
    net = FlowNet(flow_scale_factor=0.1, dtype=jnp.float32)
    got = net.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    for s, (g, wv) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), wv, atol=2e-3,
            err_msg=f"scale {s}")


@pytest.mark.slow
def test_posenet_forward_golden(ref):
    del ref
    from models.PoseNet import PoseNet as RefPoseNet
    torch.manual_seed(1)
    tm = RefPoseNet(num_source=2).eval()
    x = np.random.RandomState(1).randn(2, 9, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    from sndepth_tpu.models.posenet import PoseNet
    from sndepth_tpu.utils.convert_weights import convert_posenet
    params = convert_posenet(tm.state_dict())
    net = PoseNet(num_source=2, dtype=jnp.float32)
    got = np.asarray(net.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-5)
