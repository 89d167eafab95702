"""Round-trip tests for the frame codecs (KITTI flow png, .flo, PFM)."""

import numpy as np

from sndepth_tpu.data import frame_codecs as fc


def test_kitti_flow_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    flow = (rng.rand(16, 24, 2).astype(np.float32) - 0.5) * 100
    path = str(tmp_path / "f.png")
    fc.write_flow_kitti(path, flow)
    back, valid = fc.read_flow_kitti(path)
    np.testing.assert_allclose(back, flow, atol=1.0 / 64.0)
    np.testing.assert_array_equal(valid, 1)


def test_kitti_disp_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    disp = rng.rand(8, 10).astype(np.float32) * 100
    path = str(tmp_path / "d.png")
    fc.write_disp_kitti(path, disp)
    back = fc.read_disp_kitti(path)
    np.testing.assert_allclose(back, disp, atol=1.0 / 256.0)


def test_flo_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    flow = rng.randn(12, 7, 2).astype(np.float32)
    path = str(tmp_path / "f.flo")
    fc.write_flo(path, flow)
    np.testing.assert_array_equal(fc.read_flo(path), flow)


def test_pfm_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    img = rng.rand(9, 13).astype(np.float32)
    path = str(tmp_path / "x.pfm")
    fc.write_pfm(path, img)
    np.testing.assert_allclose(fc.read_pfm(path), img, atol=1e-7)


def test_read_gen_dispatch(tmp_path):
    rng = np.random.RandomState(4)
    flow = rng.randn(4, 5, 2).astype(np.float32)
    path = str(tmp_path / "x.flo")
    fc.write_flo(path, flow)
    np.testing.assert_array_equal(fc.read_gen(path), flow)


def test_write_prediction_artifacts(tmp_path):
    from sndepth_tpu.data.raft3d_kitti import write_prediction
    from sndepth_tpu.ops import se3
    import jax.numpy as jnp
    rng = np.random.RandomState(5)
    flow = rng.randn(8, 12, 2).astype(np.float32)
    Ts = np.asarray(se3.identity((8, 12)))
    tau = rng.randn(8, 12, 3).astype(np.float32)
    phi = rng.randn(8, 12, 3).astype(np.float32)
    paths = write_prediction(str(tmp_path), 3, flow, Ts, tau, phi,
                             disp1=np.abs(rng.randn(8, 12)).astype(np.float32))
    import os
    for key in ("flow", "T", "tau", "phi", "disp_0"):
        assert os.path.exists(paths[key]), key
    t_back = np.loadtxt(paths["T"])
    assert t_back.shape == (96, 7)
    tau_back = np.loadtxt(paths["tau"])
    np.testing.assert_allclose(tau_back, tau.reshape(-1, 3), atol=1e-5)


def test_dpt_roundtrip(tmp_path):
    rng = np.random.RandomState(4)
    depth = rng.rand(11, 17).astype(np.float32) * 50
    path = str(tmp_path / "x.dpt")
    fc.write_dpt(path, depth)
    np.testing.assert_array_equal(fc.read_dpt(path), depth)
    np.testing.assert_array_equal(fc.read_gen(path), depth)


def test_cam_roundtrip(tmp_path):
    from scipy.spatial.transform import Rotation
    rng = np.random.RandomState(5)
    M = np.array([[720.0, 0, 511.5], [0, 725.0, 217.5], [0, 0, 1]])
    R = Rotation.from_euler("xyz", rng.rand(3)).as_matrix()
    t = rng.randn(3)
    N = np.concatenate([R, t[:, None]], axis=1)
    path = str(tmp_path / "x.cam")
    fc.write_cam(path, M, N)
    pvec, kvec = fc.read_cam(path)
    np.testing.assert_allclose(kvec, [720.0, 725.0, 511.5, 217.5])
    np.testing.assert_allclose(pvec[:3], t, atol=1e-12)
    np.testing.assert_allclose(
        Rotation.from_quat(pvec[3:]).as_matrix(), R, atol=1e-12)
    # read_gen dispatches .cam too
    pvec2, kvec2 = fc.read_gen(path)
    np.testing.assert_array_equal(pvec2, pvec)


def test_flyingthings_test_split(tmp_path):
    """Build a tiny on-disk FlyingThings-style tree + test pickle and read
    one sample end to end (`sceneflow.py:363-430` parity)."""
    import os
    import pickle
    from PIL import Image

    root = tmp_path / "FlyingThings3D"
    split, subset, seq, cam = "TEST", "A", "0000", "left"
    h, w = 16, 20
    rng = np.random.RandomState(6)

    def mk(kind, cam_dir, name, arr=None, img=False):
        d = root / kind / split / subset / seq / cam_dir
        os.makedirs(d, exist_ok=True)
        p = str(d / name)
        if img:
            Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
                            ).save(p)
        else:
            fc.write_pfm(p, arr)
        return p

    mk("frames_cleanpass", cam, "0006.png", img=True)
    mk("frames_cleanpass", cam, "0007.png", img=True)
    disp = rng.rand(h, w).astype(np.float32) * 30 + 5
    mk("disparity", cam, "0006.pfm", disp)
    mk("disparity", cam, "0007.pfm", disp)
    mk(os.path.join("optical_flow"), os.path.join("into_future", cam),
       "OpticalFlowIntoFuture_0006_L.pfm",
       rng.rand(h, w, 3).astype(np.float32))
    mk(os.path.join("disparity_change"), os.path.join("into_future", cam),
       "0006.pfm", rng.rand(h, w).astype(np.float32))

    pix_x = np.array([3, 5, 7])
    pix_y = np.array([530, 531, 532])
    mask = np.array([True, True, False])
    pkl = tmp_path / "things_test_data.pickle"
    with open(pkl, "wb") as f:
        pickle.dump([(f"{split}_{subset}_{seq}_{cam}_0006",
                      pix_x, pix_y, mask)], f)

    from sndepth_tpu.data.raft3d_datasets import FlyingThingsTest
    ds = FlyingThingsTest(str(root), pickle_path=str(pkl))
    assert len(ds) == 1
    s = ds[0]
    assert s["image1"].shape == (h, w, 3)
    assert s["flow3d"].shape == (h, w, 3)
    assert np.isfinite(s["flow3d"]).all()
    # y flip: 539 - pix2_y, mask applied
    np.testing.assert_array_equal(s["sampled_index"],
                                  [[9, 8], [3, 5]])
