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
