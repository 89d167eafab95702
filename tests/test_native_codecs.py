"""Native codec (sndepth_tpu/native) parity tests.

The C++ decoder must be byte-exact vs PIL/cv2 for PNG (lossless) in all
the pipeline's shapes: 8-bit RGB frames, 16-bit RGB KITTI flow, 16-bit
gray KITTI disparity; JPEG matches PIL (same system libjpeg). Skipped
when the toolchain/libs are missing (graceful-fallback contract).
"""

import numpy as np
import pytest

from sndepth_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native codecs unavailable")


def test_png8_rgb_exact(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (64, 96, 3), np.uint8)
    p = str(tmp_path / "a.png")
    Image.fromarray(img).save(p)
    out = native.decode(p)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, img)
    assert native.probe(p) == (64, 96, 3, 8)


def test_png16_flow_and_disp_roundtrip(tmp_path):
    from sndepth_tpu.data import frame_codecs as fc
    rng = np.random.RandomState(1)
    uv = (rng.rand(32, 48, 2).astype(np.float32) - 0.5) * 100
    valid = (rng.rand(32, 48) > 0.3).astype(np.float32)
    p = str(tmp_path / "flow.png")
    fc.write_flow_kitti(p, uv, valid)
    flow, v = fc.read_flow_kitti(p)   # native path when available
    np.testing.assert_allclose(flow, uv, atol=1.0 / 64)
    np.testing.assert_array_equal(v, valid)

    disp = rng.rand(32, 48).astype(np.float32) * 100
    pd = str(tmp_path / "disp.png")
    fc.write_disp_kitti(pd, disp)
    out = fc.read_disp_kitti(pd)
    np.testing.assert_allclose(out, disp, atol=1.0 / 256)


def test_jpeg_matches_pil(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (48, 64, 3), np.uint8)
    p = str(tmp_path / "a.jpg")
    Image.fromarray(img).save(p, quality=92)
    out = native.decode(p)
    ref = np.asarray(Image.open(p))
    # same system libjpeg -> byte-exact in practice; allow tiny slack for
    # a future libjpeg-turbo PIL wheel
    assert np.abs(out.astype(int) - ref.astype(int)).mean() < 0.5


def test_batch_decode_threaded_exact(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(3)
    paths, ref = [], []
    for i in range(16):
        img = rng.randint(0, 256, (40, 56, 3), np.uint8)
        p = str(tmp_path / f"m{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
        ref.append(img)
    out = native.decode_batch(paths, nthreads=8)
    np.testing.assert_array_equal(out, np.stack(ref))


def test_batch_decode_reports_failures(tmp_path):
    from PIL import Image
    img = np.zeros((8, 8, 3), np.uint8)
    p = str(tmp_path / "ok.png")
    Image.fromarray(img).save(p)
    with pytest.raises(IOError):
        native.decode_batch([p, str(tmp_path / "missing.png")])


def test_batch_decode_rejects_mixed_sizes(tmp_path):
    """A batch whose later images differ in dims must error cleanly (the
    decoder validates dims BEFORE writing into the shared buffer)."""
    from PIL import Image
    rng = np.random.RandomState(4)
    p1 = str(tmp_path / "a.png")
    p2 = str(tmp_path / "b.png")
    Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(p1)
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(p2)
    with pytest.raises(IOError):
        native.decode_batch([p1, p2])
