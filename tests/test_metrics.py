"""Oracle tests for the metric formulas (test_disp/utils_coders/evaluate)."""

import numpy as np

from sndepth_tpu.utils import metrics


def _np_depth_errors(gt, pred):
    thresh = np.maximum(gt / pred, pred / gt)
    return {
        "abs_diff": np.mean(np.abs(gt - pred)),
        "abs_rel": np.mean(np.abs(gt - pred) / gt),
        "sq_rel": np.mean((gt - pred) ** 2 / gt),
        "rms": np.sqrt(np.mean((gt - pred) ** 2)),
        "log_rms": np.sqrt(np.mean((np.log(gt) - np.log(pred)) ** 2)),
        "abs_log": np.mean(np.abs(np.log(gt) - np.log(pred))),
        "a1": np.mean(thresh < 1.25),
        "a2": np.mean(thresh < 1.25 ** 2),
        "a3": np.mean(thresh < 1.25 ** 3),
    }


def test_depth_errors_match_oracle():
    rng = np.random.RandomState(0)
    gt = rng.uniform(1, 50, 1000).astype(np.float32)
    pred = gt * rng.uniform(0.7, 1.4, 1000).astype(np.float32)
    got = {k: float(v) for k, v in
           metrics.compute_depth_errors(gt, pred).items()}
    want = _np_depth_errors(gt, pred)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-4, err_msg=k)


def test_median_scaling_protocol():
    rng = np.random.RandomState(1)
    gt = rng.uniform(2, 60, 500).astype(np.float32)
    pred = gt * 0.5  # off by a constant scale -> perfect after median scaling
    got = metrics.median_scaled_depth_errors(gt, pred)
    assert float(got["abs_rel"]) < 1e-5
    assert float(got["a1"]) == 1.0


def test_depth_perfect_prediction():
    gt = np.linspace(1, 70, 100).astype(np.float32)
    got = metrics.compute_depth_errors(gt, gt)
    assert float(got["abs_rel"]) == 0.0
    assert float(got["a1"]) == 1.0


def test_normal_errors_known_angles():
    gt = np.tile([0.0, 0.0, 1.0], (4, 1))
    pred = np.array([
        [0.0, 0.0, 1.0],                      # 0 deg
        [0.0, np.sin(np.radians(10)), np.cos(np.radians(10))],   # 10 deg
        [0.0, 1.0, 0.0],                      # 90 deg
        [0.0, 0.0, -1.0],                     # 180 deg
    ])
    err = np.asarray(metrics.normal_angular_errors(pred, gt))
    np.testing.assert_allclose(err, [0, 10, 90, 180], atol=1e-3)
    stats = {k: float(v) for k, v in
             metrics.compute_normal_errors(err).items()}
    np.testing.assert_allclose(stats["mean"], 70.0, atol=1e-3)
    np.testing.assert_allclose(stats["a3"], 50.0)   # 2 of 4 under 11.25 deg
    np.testing.assert_allclose(stats["median"], 50.0, atol=1e-3)


def test_mean_iou():
    target = np.array([0, 0, 1, 1, 2, 2])
    pred = np.array([0, 1, 1, 1, 2, 0])
    # class0: tp1 union3 (gt2 + pred2 - 1)-> 1/3; class1: tp2, union3 -> 2/3;
    # class2: tp1, union2 -> 1/2
    got = float(metrics.mean_iou(pred, target, 3))
    np.testing.assert_allclose(got, (1 / 3 + 2 / 3 + 1 / 2) / 3, rtol=1e-6)


def test_mean_iou_perfect():
    x = np.array([0, 1, 2, 1, 0])
    assert float(metrics.mean_iou(x, x, 3)) == 1.0
