"""Geometry + dataset parity against the reference's own preprocessing."""

import numpy as np
import pytest

import jax.numpy as jnp

from calipsync_tpu.audio.windows import (batched_windows, pack_nhwc_np,
                                         window_nhwc_np, window_rows_np)
from calipsync_tpu.data.dataset import LipSyncDataset, batch_iterator
from calipsync_tpu.vision.geometry import (load_landmarks, train_pair_uint8)


def test_train_crop_matches_reference_process_img(reference_path,
                                                  synthetic_step1_dir):
    """Pixel-exact vs /root/reference/dataset/dataset.py::process_img."""
    import sys
    sys.path.insert(0, str(reference_path))
    import cv2
    from dataset.dataset import MyDataset

    d = synthetic_step1_dir
    img = cv2.imread(str(d / "full_body_img" / "0.jpg"))
    img_ex = cv2.imread(str(d / "full_body_img" / "3.jpg"))
    lp = str(d / "landmarks" / "0.lms")
    lp_ex = str(d / "landmarks" / "3.lms")

    # process_img never touches self -> call unbound with a dummy instance
    concat_t, real_t, real_ex_t, masked_t = MyDataset.process_img(
        object(), img.copy(), lp, img_ex.copy(), lp_ex)

    ref, masked, target = train_pair_uint8(
        img, load_landmarks(lp), img_ex, load_landmarks(lp_ex))

    np.testing.assert_array_equal(
        target.transpose(2, 0, 1).astype(np.float32) / 255.0, real_t.numpy())
    np.testing.assert_array_equal(
        masked.transpose(2, 0, 1).astype(np.float32) / 255.0,
        masked_t.numpy())
    np.testing.assert_array_equal(
        ref.transpose(2, 0, 1).astype(np.float32) / 255.0, real_ex_t.numpy())
    our_concat = np.concatenate([ref, masked], axis=-1)
    np.testing.assert_array_equal(
        our_concat.transpose(2, 0, 1).astype(np.float32) / 255.0,
        concat_t.numpy())


def test_audio_window_matches_reference(reference_path, synthetic_step1_dir):
    import sys
    sys.path.insert(0, str(reference_path))
    from dataset.dataset import MyDataset

    feats = np.load(synthetic_step1_dir / "aud_hu.npy")
    for idx in [0, 3, 7, len(feats) - 2]:
        ref_window = MyDataset.get_audio_features(object(), feats, idx)
        ref_nchw = ref_window.reshape(32, 32, 32).numpy()
        ours = window_nhwc_np(feats, idx)
        np.testing.assert_array_equal(ours, ref_nchw.transpose(1, 2, 0))


def test_batched_windows_matches_host_packing(synthetic_step1_dir):
    feats = np.load(synthetic_step1_dir / "aud_hu.npy")
    idxs = np.array([0, 1, 7, 20, len(feats) - 1], dtype=np.int32)
    dev = np.asarray(batched_windows(jnp.asarray(feats), jnp.asarray(idxs)))
    for i, idx in enumerate(idxs):
        np.testing.assert_allclose(dev[i], window_nhwc_np(feats, int(idx)),
                                   rtol=0, atol=0)


def test_dataset_and_iterator(synthetic_step1_dir):
    ds = LipSyncDataset(str(synthetic_step1_dir))
    assert len(ds) == 25  # audio rows - 1
    s = ds.sample(3, np.random.default_rng(0))
    assert s["ref"].shape == (160, 160, 3) and s["ref"].dtype == np.uint8
    assert s["masked"].shape == (160, 160, 3)
    assert s["target"].shape == (160, 160, 3)
    # masked region is black
    assert s["masked"][5:150, 5:155].max() == 0
    # the unmasked border is untouched target pixels
    np.testing.assert_array_equal(s["masked"][:5], s["target"][:5])

    batches = list(batch_iterator(ds, 8, np.random.default_rng(1),
                                  shuffle=True, num_workers=2))
    assert sum(b["index"].shape[0] for b in batches) == len(ds)
    assert batches[0]["ref"].shape == (8, 160, 160, 3)
    assert batches[0]["index"].dtype == np.int32

    # same seed -> identical epoch; different seed -> different order
    b2 = list(batch_iterator(ds, 8, np.random.default_rng(1),
                             shuffle=True, num_workers=2))
    np.testing.assert_array_equal(batches[0]["ref"], b2[0]["ref"])


def test_frame_index_clamp_beyond_frames(synthetic_step1_dir):
    """Audio rows exceed frame count; frame index clamps to the last frame
    (reference dataset.py:137)."""
    ds = LipSyncDataset(str(synthetic_step1_dir))
    s = ds.sample(len(ds) - 1, np.random.default_rng(2))  # idx 24 > 11 frames
    assert s["target"].shape == (160, 160, 3)


def test_prefetcher_close_stops_thread_and_generator():
    """close() joins the decode thread even when it is blocked on a full
    queue, and runs the wrapped generator's ``finally`` (the capture /
    pool release) before returning (ADVICE r2)."""
    import time

    from calipsync_tpu.data.dataset import Prefetcher

    released = []

    def gen():
        try:
            i = 0
            while True:     # unbounded producer: fills the queue
                yield i
                i += 1
        finally:
            released.append(True)

    pf = Prefetcher(gen(), depth=2)
    assert next(pf) == 0
    deadline = time.time() + 5.0    # let the thread block on a full put
    while pf._q.qsize() < 2 and time.time() < deadline:
        time.sleep(0.01)
    pf.close()
    assert not pf._thread.is_alive()
    assert released == [True]
    # idempotent; and a fully-consumed prefetcher closes cheaply too
    pf.close()


def test_prefetcher_close_after_exhaustion():
    from calipsync_tpu.data.dataset import Prefetcher

    with Prefetcher(iter([1, 2, 3]), depth=2) as pf:
        assert list(pf) == [1, 2, 3]
    assert not pf._thread.is_alive()


def test_save_landmarks_txt_matches_np_savetxt(tmp_path):
    """Byte-identical to np.savetxt for both pipeline formats ('%d' step1
    .lms, '%.18e' step3 positions), including non-integer coords and the
    arbitrary-format passthrough."""
    from calipsync_tpu.vision.geometry import save_landmarks_txt

    rng = np.random.default_rng(0)
    int_lms = rng.integers(-5, 2000, (98, 2)).astype(np.int32)
    frac_lms = int_lms.astype(np.float64) + rng.uniform(-0.5, 0.5, (98, 2))

    for fmt in ("%d", "%.18e", "%.6f"):
        for lms in (int_lms, frac_lms.astype(np.float32), frac_lms):
            a, b = tmp_path / "a.txt", tmp_path / "b.txt"
            save_landmarks_txt(str(a), lms, fmt=fmt)
            np.savetxt(str(b), lms, fmt=fmt)
            assert a.read_bytes() == b.read_bytes(), (fmt, lms.dtype)
