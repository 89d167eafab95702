"""Tests for the KITTI sequence dataset, batching, and prefetch."""

import os

import numpy as np
import pytest

from sndepth_tpu.data.kitti_sequence import (EvalSequenceDataset,
                                             SequenceDataset, batch_iterator,
                                             read_intrinsics,
                                             split_sequence_image)
from sndepth_tpu.data.prefetch import synthetic_batches, threaded_batches


def _write_kitti_tree(root, n=6, frame_w=416, h=140):
    from PIL import Image
    scene = os.path.join(root, "2011_09_26_drive_0001_sync_02")
    os.makedirs(scene, exist_ok=True)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(n):
        img = rng.randint(0, 255, (h, frame_w * 3, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(scene, f"{i:010d}.jpg"))
        with open(os.path.join(scene, f"{i:010d}_cam.txt"), "w") as f:
            f.write("241.67,0.,204.16,0.,246.28,59.0,0.,0.,1.\n")
        lines.append(f"2011_09_26_drive_0001_sync_02 {i:010d}")
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return root


def test_split_sequence_image_middle_target():
    views = np.zeros((4, 12, 3), np.uint8)
    views[:, 4:8] = 1   # middle frame
    views[:, 0:4] = 2
    views[:, 8:12] = 3
    tgt, src = split_sequence_image(views, 3, 4)
    assert (tgt == 1).all()
    assert src.shape == (4, 4, 6)
    assert (src[..., :3] == 2).all() and (src[..., 3:] == 3).all()


def test_read_intrinsics(tmp_path):
    p = tmp_path / "c_cam.txt"
    p.write_text("100.,0.,50.,0.,120.,40.,0.,0.,1.\n")
    k = read_intrinsics(str(p))
    assert k.shape == (3, 3)
    np.testing.assert_allclose(k[0, 0], 100.0)
    np.testing.assert_allclose(k[1, 2], 40.0)


def test_sequence_dataset_shapes_and_aug(tmp_path):
    root = _write_kitti_tree(str(tmp_path))
    ds = SequenceDataset(root, "train", 3, img_width=416, img_height=128)
    assert len(ds) == 6
    s = ds[0]
    assert s["tgt"].shape == (128, 416, 3)
    assert s["src"].shape == (128, 416, 6)
    assert s["intrinsics"].shape == (3, 3)
    # Augmentation scales intrinsics by >= 1.55
    assert s["intrinsics"][0, 0] >= 241.0 * 1.55 - 417  # cx shift can reduce? fx only scaled
    assert s["intrinsics"][0, 0] >= 241.67 * 1.54
    # Two fetches of the same index give different crops (random aug).
    s2 = ds[0]
    assert not np.array_equal(s["tgt"], s2["tgt"])


def test_batch_iterator_shapes(tmp_path):
    root = _write_kitti_tree(str(tmp_path))
    ds = SequenceDataset(root, "train", 3)
    batches = list(batch_iterator(ds, 2, shuffle=True, seed=0))
    assert len(batches) == 3
    b = batches[0]
    assert b["tgt"].shape == (2, 128, 416, 3)
    assert b["src"].shape == (2, 128, 416, 6)
    assert b["intrinsics"].shape == (2, 3, 3)


def test_eval_dataset_edge_clamping(tmp_path):
    from PIL import Image
    paths = []
    for i in range(3):
        p = tmp_path / f"{i:06d}_10.png"
        Image.fromarray(np.full((64, 200, 3), i * 40, np.uint8)).save(p)
        paths.append(str(p))
    ds = EvalSequenceDataset(paths, img_width=96, img_height=32)
    first = ds[0]
    # index 0: prev clamps to itself
    np.testing.assert_array_equal(first["src"][..., :3], first["tgt"])
    assert first["src"].shape == (32, 96, 6)


def test_threaded_batches_delivers():
    def make_iter():
        return iter(synthetic_batches(2, 32, 64, seed=1))
    got = []
    for i, b in enumerate(threaded_batches(make_iter, num_threads=2)):
        got.append(b)
        if i >= 4:
            break
    assert len(got) == 5
    assert got[0]["tgt"].shape == (2, 32, 64, 3)
