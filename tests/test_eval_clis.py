"""End-to-end eval CLI tests over synthetic on-disk fixture trees.

Drives the full predict -> metric path of `cli/evaluate_depth.py`
(reference `models/test_disp.py:129-148`), `cli/evaluate_normals.py`
(`utils/utils_coders.py:73-84`) and `cli/evaluate_motion.py`
(`evaluate.py:12-22`) so real-data metric parity becomes a data drop, not
new code: the same command lines run unchanged on KITTI/NYU trees.
"""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


def _write_png(path, arr):
    from PIL import Image
    Image.fromarray(arr.astype(np.uint8)).save(path)


# ---------------------------------------------------------------------------
# evaluate_depth: images + img_list + gt npz -> Eigen 9-metric table
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_evaluate_depth_cli_e2e(tmp_path, capsys):
    from sndepth_tpu.cli import evaluate_depth

    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    paths = []
    for i in range(3):
        p = img_dir / f"{i:06d}.png"
        _write_png(p, rng.randint(0, 255, (96, 160, 3)))
        paths.append(str(p))
    img_list = tmp_path / "list.txt"
    img_list.write_text("\n".join(paths) + "\n")

    # GT at a different (native) resolution than the net, to exercise the
    # zoom-to-GT path; depths in a plausible KITTI range.
    gt = 1.0 + 60.0 * rng.rand(3, 96, 160).astype(np.float32)
    gt_file = tmp_path / "gt.npz"
    np.savez(gt_file, gt_depths=gt)

    out_dir = tmp_path / "out"
    evaluate_depth.main([
        "--gt_file", str(gt_file), "--img_list", str(img_list),
        "--img_height", "64", "--img_width", "96",
        "--output_dir", str(out_dir),
    ])
    captured = capsys.readouterr().out
    lines = [l for l in captured.strip().splitlines() if l.strip()]
    # Last line is the 9 mean metrics in the reference print format.
    vals = [float(v) for v in lines[-1].split(",")]
    assert len(vals) == 9
    assert all(np.isfinite(v) for v in vals)
    # a1 <= a2 <= a3 (threshold accuracies are nested) and in [0, 1].
    a1, a2, a3 = vals[6:9]
    assert 0.0 <= a1 <= a2 <= a3 <= 1.0
    preds = np.load(out_dir / "predictions.npy")
    assert preds.shape == (3, 64, 96) and np.isfinite(preds).all()

    # Second pass through --pred_file reuses the saved predictions and must
    # reproduce the same table (deterministic metric path).
    evaluate_depth.main([
        "--gt_file", str(gt_file),
        "--pred_file", str(out_dir / "predictions.npy"),
    ])
    lines2 = [l for l in capsys.readouterr().out.strip().splitlines()
              if l.strip()]
    vals2 = [float(v) for v in lines2[-1].split(",")]
    np.testing.assert_allclose(vals2, vals, rtol=1e-5)


# ---------------------------------------------------------------------------
# evaluate_normals: NYU-style *_rgb/_norm/_mask tree -> angular metric line
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_evaluate_normals_cli_e2e(tmp_path, capsys):
    from sndepth_tpu.cli import evaluate_normals

    rng = np.random.RandomState(1)
    split = tmp_path / "nyu" / "test"
    split.mkdir(parents=True)
    for i in range(2):
        _write_png(split / f"{i:04d}_rgb.png",
                   rng.randint(0, 255, (64, 96, 3)))
        n = rng.randn(64, 96, 3).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        _write_png(split / f"{i:04d}_norm.png",
                   np.round((n + 1.0) / 2.0 * 255.0))
        mask = (rng.rand(64, 96) > 0.2) * 255
        _write_png(split / f"{i:04d}_mask.png", mask)

    log_file = tmp_path / "normal_eval.txt"
    evaluate_normals.main([
        "--data_dir", str(tmp_path / "nyu"), "--split", "test",
        "--img_height", "64", "--img_width", "96",
        "--log_file", str(log_file),
    ])
    out = capsys.readouterr().out.strip().splitlines()
    assert out[-2].startswith("mean median rmse")
    vals = [float(v) for v in out[-1].split()]
    assert len(vals) == 8 and all(np.isfinite(v) for v in vals)
    mean, median, rmse = vals[:3]
    assert 0.0 <= median <= 180.0 and 0.0 <= mean <= 180.0
    assert rmse >= mean - 1e-5        # rmse dominates mean for angles >= 0
    a = vals[3:]                      # % under 5/7.5/11.25/22.5/30 deg
    assert all(0.0 <= x <= 100.0 for x in a)
    assert all(a[i] <= a[i + 1] + 1e-6 for i in range(4))  # nested
    assert log_file.exists() and "mean median rmse" in log_file.read_text()


# ---------------------------------------------------------------------------
# evaluate_motion: KITTIMotion val tree + checkpoint -> mIoU
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_evaluate_motion_cli_e2e(tmp_path, capsys):
    import jax

    from sndepth_tpu.cli import evaluate_motion
    from sndepth_tpu.train import checkpoint as ckpt_lib
    from sndepth_tpu.train import motion

    rng = np.random.RandomState(2)
    h, w = 64, 128
    for sub in ("image", "flow", "label"):
        (tmp_path / "data" / "val" / sub).mkdir(parents=True)
    for i in range(4):
        _write_png(tmp_path / "data" / "val" / "image" / f"{i:04d}.png",
                   rng.randint(0, 255, (h, w, 3)))
        _write_png(tmp_path / "data" / "val" / "flow" / f"{i:04d}.png",
                   rng.randint(0, 255, (h, w, 3)))
        label = np.zeros((h, w, 3), np.uint8)
        label[..., 0] = rng.randint(0, 3, (h, w)) * 100  # class in red*100
        _write_png(tmp_path / "data" / "val" / "label" / f"{i:04d}.png",
                   label)

    state = motion.init_motion_state(jax.random.PRNGKey(0), h, w)
    ckpt_dir = tmp_path / "ckpt"
    ckpt_lib.save_checkpoint(str(ckpt_dir), state, step=0)

    evaluate_motion.main([
        "--data_dir", str(tmp_path / "data"),
        "--ckpt_dir", str(ckpt_dir), "--batch_size", "2",
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert out.startswith("mIoU:")
    miou = float(out.split(":", 1)[1])
    assert 0.0 <= miou <= 1.0


def test_benchmark_cli_smoke():
    """cli/benchmark runs a family end-to-end and prints a JSON line."""
    import io
    import json
    from contextlib import redirect_stdout

    from sndepth_tpu.cli.benchmark import main

    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["--family", "motion", "--batch", "1", "--img_height", "32",
              "--img_width", "64", "--iters", "1"])
    rec = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rec["family"] == "motion" and rec["value"] > 0
