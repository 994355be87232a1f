"""FrameSynthesizer: sequencing, batching, compositing behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from calipsync_tpu.infer.synthesizer import (FrameSynthesizer,
                                             PingPongSequencer)
from calipsync_tpu.nn.unet import Generator


@pytest.fixture(scope="module")
def gen_variables():
    model = Generator()
    return model, jax.jit(model.init)(jax.random.key(0),
                                      jnp.zeros((1, 160, 160, 6)),
                                      jnp.zeros((1, 32, 32, 32)))


def test_pingpong_sequencer_bounds_and_determinism():
    total = 50
    seq = PingPongSequencer(total, np.random.default_rng(7))
    walk = seq.next(500)
    assert len(walk) == 500
    assert min(walk) >= 0 and max(walk) < total
    # steps are +-1 with reflection at the ends (motion continuity)
    diffs = np.abs(np.diff(walk))
    assert set(np.unique(diffs)).issubset({1})
    walk2 = PingPongSequencer(total, np.random.default_rng(7)).next(500)
    assert walk == walk2


def test_synthesizer_end_to_end(synthetic_step3_dir, gen_variables):
    model, variables = gen_variables
    synth = FrameSynthesizer(variables, str(synthetic_step3_dir),
                             model=model, batch_size=4, seed=0)
    assert synth.total_frames == 12

    feats = np.random.default_rng(1).standard_normal(
        (10, 2, 1024)).astype(np.float32)
    items = list(synth.iterate_synthesized_frames(feats))
    assert len(items) == 10
    assert [it["index"] for it in items] == list(range(10))
    for it in items:
        assert it["frame"].shape == (480, 480, 3)
        assert it["frame"].dtype == np.uint8
        assert 0 <= it["physical_index"] < 12

    # no-sync path returns untouched source frames
    synth2 = FrameSynthesizer(variables, str(synthetic_step3_dir),
                              model=model, batch_size=4, seed=0)
    raw = list(synth2.iterate_synthesized_frames(
        feats, is_generate_sync_frame=False))
    assert len(raw) == 10
    import cv2
    first_phys = raw[0]["physical_index"]
    src = cv2.imread(str(synthetic_step3_dir / "frames" /
                         f"{str(first_phys).zfill(6)}.jpg"))
    np.testing.assert_array_equal(raw[0]["frame"], src)


def test_resident_path_matches_streaming_path(synthetic_step3_dir,
                                              gen_variables):
    """Device-resident crop-store generate == per-batch upload generate."""
    model, variables = gen_variables
    feats = np.random.default_rng(5).standard_normal(
        (8, 2, 1024)).astype(np.float32)
    a = FrameSynthesizer(variables, str(synthetic_step3_dir), model=model,
                         batch_size=4, seed=11, preload=True)
    b = FrameSynthesizer(variables, str(synthetic_step3_dir), model=model,
                         batch_size=4, seed=11, preload=False)
    assert a._crops_dev is not None and b._crops_dev is None
    fa = [it["frame"] for it in a.iterate_synthesized_frames(feats)]
    fb = [it["frame"] for it in b.iterate_synthesized_frames(feats)]
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(x, y)


def test_host_cache_cap_keeps_resident_path(synthetic_step3_dir,
                                            gen_variables):
    """Round-1 cliff regression: a host LRU cache smaller than the clip
    must NOT disable the device-resident crop store, must stay bounded,
    and must produce identical frames to an uncapped run."""
    model, variables = gen_variables
    feats = np.random.default_rng(31).standard_normal(
        (10, 2, 1024)).astype(np.float32)
    capped = FrameSynthesizer(variables, str(synthetic_step3_dir),
                              model=model, batch_size=4, seed=11,
                              max_cached_frames=5)
    assert capped._crops_dev is not None  # resident path active
    assert len(capped._cache) <= 5
    full = FrameSynthesizer(variables, str(synthetic_step3_dir),
                            model=model, batch_size=4, seed=11)
    fa = [it["frame"] for it in capped.iterate_synthesized_frames(feats)]
    fb = [it["frame"] for it in full.iterate_synthesized_frames(feats)]
    assert len(capped._cache) <= 5 and len(full._cache) == 12
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(x, y)


def test_mesh_sharded_synthesis_matches_single_device(synthetic_step3_dir,
                                                      gen_variables):
    """Frame windows sharded over an 8-device mesh == single-device run."""
    from calipsync_tpu.core.mesh import make_mesh

    model, variables = gen_variables
    feats = np.random.default_rng(9).standard_normal(
        (12, 2, 1024)).astype(np.float32)
    single = FrameSynthesizer(variables, str(synthetic_step3_dir),
                              model=model, batch_size=8, seed=4)
    sharded = FrameSynthesizer(variables, str(synthetic_step3_dir),
                               model=model, batch_size=8, seed=4,
                               mesh=make_mesh())
    fa = [it["frame"] for it in single.iterate_synthesized_frames(feats)]
    fb = [it["frame"] for it in sharded.iterate_synthesized_frames(feats)]
    assert len(fa) == len(fb) == 12
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(x, y)


def test_xseg_mask_gates_compositing(synthetic_step3_dir, gen_variables,
                                     tmp_path):
    """A zero XSeg mask must suppress the paste entirely (combined mask =
    face_polygon * xseg, reference process_batch:327-343)."""
    import shutil

    import cv2

    model, variables = gen_variables
    masked_dir = tmp_path / "infer_data"
    shutil.copytree(synthetic_step3_dir, masked_dir)
    for f in (masked_dir / "frames").glob("*.jpg"):
        cv2.imwrite(str(masked_dir / "masks" / f.name),
                    np.zeros((168, 168), np.uint8))

    synth = FrameSynthesizer(variables, str(masked_dir), model=model,
                             batch_size=4, seed=0)
    feats = np.random.default_rng(0).standard_normal(
        (4, 2, 1024)).astype(np.float32)
    for it in synth.iterate_synthesized_frames(feats):
        src = cv2.imread(str(masked_dir / "frames" /
                             f"{str(it['physical_index']).zfill(6)}.jpg"))
        np.testing.assert_array_equal(it["frame"], src)


def test_wenet_batched_windows_shape():
    from calipsync_tpu.audio.windows import batched_windows

    feats = jnp.asarray(np.random.default_rng(0).standard_normal(
        (20, 8192)).astype(np.float32))
    out = batched_windows(feats, jnp.asarray([0, 5, 19]), mode="wenet")
    assert out.shape == (3, 16, 32, 256)
    # channels-last of the reference's (256,16,32) NCHW reshape: verify
    # the idx=5 window (rows [-3,13) -> 3 zero-pad rows + rows 0..12)
    nchw = np.zeros((16, 8192), np.float32)
    nchw[3:] = np.asarray(feats[0:13])
    nchw = nchw.reshape(256, 16, 32)
    np.testing.assert_allclose(np.asarray(out[1]),
                               nchw.transpose(1, 2, 0), rtol=0, atol=0)


def test_bf16_serving_fidelity_vs_fp32(synthetic_step3_dir, gen_variables):
    """The bf16 serving path stays visually lossless vs fp32 (>35 dB PSNR
    on composited frames; BASELINE parity is measured at fp32)."""
    import jax.numpy as jnp2

    from calipsync_tpu.eval import batch_psnr

    _, variables = gen_variables
    feats = np.random.default_rng(21).standard_normal(
        (6, 2, 1024)).astype(np.float32)
    f32 = FrameSynthesizer(variables, str(synthetic_step3_dir),
                           model=Generator(dtype=jnp2.float32),
                           batch_size=4, seed=2)
    bf16 = FrameSynthesizer(variables, str(synthetic_step3_dir),
                            model=Generator(dtype=jnp2.bfloat16),
                            batch_size=4, seed=2)
    fa = [it["frame"] for it in f32.iterate_synthesized_frames(feats)]
    fb = [it["frame"] for it in bf16.iterate_synthesized_frames(feats)]
    scores = batch_psnr(np.stack(fa), np.stack(fb))
    assert scores.min() > 35.0, scores


def test_composite_touches_only_face_region(synthetic_step3_dir,
                                            gen_variables):
    import cv2

    model, variables = gen_variables
    synth = FrameSynthesizer(variables, str(synthetic_step3_dir),
                             model=model, batch_size=2, seed=3)
    feats = np.random.default_rng(2).standard_normal(
        (4, 2, 1024)).astype(np.float32)
    items = list(synth.iterate_synthesized_frames(feats))
    for it in items[:2]:
        phys = str(it["physical_index"]).zfill(6)
        src = cv2.imread(str(synthetic_step3_dir / "frames" / f"{phys}.jpg"))
        lms = np.loadtxt(str(synthetic_step3_dir / "positions" /
                             f"{phys}.txt"))
        diff = np.any(it["frame"] != src, axis=-1)
        # changed pixels must lie inside the crop bbox
        ys, xs = np.where(diff)
        if len(ys):
            xmin, ymin = int(lms[1][0]), int(lms[52][1])
            xmax = int(lms[31][0])
            ymax = ymin + (xmax - xmin)
            assert ys.min() >= ymin and ys.max() < ymax
            assert xs.min() >= xmin and xs.max() < xmax


def test_yuv420_pack_matches_cv2_planes():
    """Device I420 pack == OpenCV's video-range BT.601 within fixed-point
    rounding (+-1 on Y; chroma vs the float 2x2-mean spec, also +-1)."""
    import cv2

    from calipsync_tpu.infer.synthesizer import yuv420_pack, yuv420_unpack

    rng = np.random.default_rng(0)
    crops = rng.integers(0, 256, (3, 160, 160, 3), np.uint8)
    packed = np.asarray(jax.jit(yuv420_pack)(
        jnp.asarray(crops, jnp.float32)))
    assert packed.shape == (3, 160 * 160 * 3 // 2)

    for i in range(3):
        ref = cv2.cvtColor(crops[i], cv2.COLOR_BGR2YUV_I420)
        ours_y = packed[i, :25600].reshape(160, 160)
        assert np.abs(ours_y.astype(int) - ref[:160].astype(int)).max() <= 1
        # chroma spec: video-range float U/V, 2x2 mean, rounded
        b, g, r = [crops[i][..., c].astype(np.float64) for c in range(3)]
        u = 128 + (-37.945 * r - 74.494 * g + 112.439 * b) / 256
        v = 128 + (112.439 * r - 94.154 * g - 18.285 * b) / 256
        for plane, full in ((packed[i, 25600:32000], u),
                            (packed[i, 32000:], v)):
            want = np.round(full.reshape(80, 2, 80, 2).mean(axis=(1, 3)))
            got = plane.reshape(80, 80).astype(np.float64)
            assert np.abs(got - want).max() <= 1
        # and the host unpack round-trips through cv2 cleanly
        back = yuv420_unpack(packed[i], 160)
        assert back.shape == (160, 160, 3)


def test_yuv420_streaming_matches_bgr_at_high_psnr(synthetic_step3_dir,
                                                   gen_variables):
    """The half-bandwidth yuv420 transfer path produces frames visually
    identical to the reference-exact bgr path (only chroma subsampling +
    rounding differ; every sink re-encodes 4:2:0 anyway)."""
    from calipsync_tpu.eval import batch_psnr

    model, variables = gen_variables
    feats = np.random.default_rng(5).standard_normal(
        (8, 2, 1024)).astype(np.float32)
    frames = {}
    for fmt in ("bgr", "yuv420"):
        synth = FrameSynthesizer(variables, str(synthetic_step3_dir),
                                 model=model, batch_size=4, seed=11,
                                 transfer_format=fmt)
        frames[fmt] = [it["frame"]
                       for it in synth.iterate_synthesized_frames(feats)]
    scores = batch_psnr(np.stack(frames["bgr"]), np.stack(frames["yuv420"]))
    assert scores.min() > 38.0, scores


def test_yuv420_streaming_nonresident_path(synthetic_step3_dir,
                                           gen_variables):
    """yuv420 also works on the non-resident (host-upload) generate path
    (preload=False), matching the resident path's frames exactly."""
    model, variables = gen_variables
    feats = np.random.default_rng(6).standard_normal(
        (4, 2, 1024)).astype(np.float32)
    frames = {}
    for preload in (True, False):
        synth = FrameSynthesizer(variables, str(synthetic_step3_dir),
                                 model=model, batch_size=4, seed=2,
                                 preload=preload, transfer_format="yuv420")
        frames[preload] = [it["frame"]
                           for it in synth.iterate_synthesized_frames(feats)]
    for a, b in zip(frames[True], frames[False]):
        np.testing.assert_array_equal(a, b)


def test_preload_max_bytes_valve(synthetic_step3_dir, gen_variables):
    """An oversized crop store degrades to the streaming path instead of
    exhausting HBM; output equals the resident path's exactly."""
    model, variables = gen_variables
    feats = np.random.default_rng(8).standard_normal(
        (4, 2, 1024)).astype(np.float32)
    res = FrameSynthesizer(variables, str(synthetic_step3_dir),
                           model=model, batch_size=4, seed=4)
    capped = FrameSynthesizer(variables, str(synthetic_step3_dir),
                              model=model, batch_size=4, seed=4,
                              preload_max_bytes=1024)  # force the valve
    assert res._crops_dev is not None
    assert capped._crops_dev is None
    a = [it["frame"] for it in res.iterate_synthesized_frames(feats)]
    b = [it["frame"] for it in capped.iterate_synthesized_frames(feats)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_iterate_row_range_slices_match_full(synthetic_step3_dir,
                                             gen_variables):
    """Feeding feature *slices* with an 8-row margin through
    ``row_range`` reproduces the single full-array call bit-exactly when
    span starts are multiples of batch_size (the pipelined offline
    manager's contract, pipelines/inference.py)."""
    model, variables = gen_variables
    feats = np.random.default_rng(11).standard_normal(
        (20, 2, 1024)).astype(np.float32)

    full_synth = FrameSynthesizer(variables, str(synthetic_step3_dir),
                                  model=model, batch_size=4, seed=3)
    full = list(full_synth.iterate_synthesized_frames(feats))

    synth = FrameSynthesizer(variables, str(synthetic_step3_dir),
                             model=model, batch_size=4, seed=3)
    got = []
    for lo, hi in [(0, 8), (8, 16), (16, 20)]:
        ctx_lo, ctx_hi = max(0, lo - 8), min(20, hi + 8)
        got.extend(synth.iterate_synthesized_frames(
            feats[ctx_lo:ctx_hi], lo,
            row_range=(lo - ctx_lo, hi - ctx_lo)))

    assert [it["index"] for it in got] == [it["index"] for it in full]
    assert ([it["physical_index"] for it in got]
            == [it["physical_index"] for it in full])
    for a, b in zip(got, full):
        np.testing.assert_array_equal(a["frame"], b["frame"])


class _StreamingStubHubert:
    """Fixed features, streamed in deliberately uneven blocks."""

    def __init__(self, feats, block_sizes):
        self.feats = feats
        self.block_sizes = block_sizes
        assert sum(block_sizes) == len(feats)

    def extract_from_file(self, path):
        return self.feats

    def extract_from_file_stream(self, path):
        import time

        i = 0
        for n in self.block_sizes:
            time.sleep(0.02)  # exercise the consumer's wait path
            yield self.feats[i:i + n]
            i += n


def test_pipelined_offline_manager_matches_sequential(synthetic_step3_dir,
                                                      gen_variables,
                                                      tmp_path):
    """The pipelined offline path (featurize || synthesize || encode)
    produces a video identical to the sequential reference flow."""
    import cv2

    from calipsync_tpu.audio.io import save_wav
    from calipsync_tpu.pipelines.inference import VideoStreamManager

    model, variables = gen_variables
    feats = np.random.default_rng(12).standard_normal(
        (20, 2, 1024)).astype(np.float32)
    wav = str(tmp_path / "in.wav")
    save_wav(wav, np.zeros(16000, np.float32), 16000)

    def decode(path):
        cap = cv2.VideoCapture(path)
        frames = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(f)
        cap.release()
        return frames

    outs = {}
    for name, pipelined in [("seq", False), ("pipe", True)]:
        synth = FrameSynthesizer(variables, str(synthetic_step3_dir),
                                 model=model, batch_size=4, seed=5)
        hub = _StreamingStubHubert(feats, (7, 9, 4))
        mgr = VideoStreamManager(synth, hub, fps=25, pipelined=pipelined,
                                 span_rows=8)
        out = str(tmp_path / f"{name}.mp4")
        result = mgr.process_single_file(wav, out)
        assert result["frames"] == 20
        outs[name] = decode(out)

    assert len(outs["seq"]) == len(outs["pipe"]) == 20
    for a, b in zip(outs["seq"], outs["pipe"]):
        np.testing.assert_array_equal(a, b)


def test_pipelined_manager_propagates_extractor_error(synthetic_step3_dir,
                                                      gen_variables,
                                                      tmp_path):
    """A featurizer failure mid-stream surfaces as RuntimeError instead
    of hanging the consumer or leaking the producer/writer threads."""
    from calipsync_tpu.audio.io import save_wav
    from calipsync_tpu.pipelines.inference import VideoStreamManager

    class _FailingHubert:
        def extract_from_file_stream(self, path):
            yield np.zeros((4, 2, 1024), np.float32)
            raise RuntimeError("link dropped")

    model, variables = gen_variables
    wav = str(tmp_path / "in.wav")
    save_wav(wav, np.zeros(8000, np.float32), 16000)
    synth = FrameSynthesizer(variables, str(synthetic_step3_dir),
                             model=model, batch_size=4, seed=0)
    mgr = VideoStreamManager(synth, _FailingHubert(), pipelined=True,
                             span_rows=8)
    with pytest.raises(RuntimeError, match="feature extraction failed"):
        mgr.process_single_file(wav, str(tmp_path / "out.mp4"))


def test_first_batch_size_output_identical(synthetic_step3_dir,
                                           gen_variables):
    """The small first-window head batch (first_batch_size, the
    streaming TTF lever) changes only the batch partition/padding —
    frames, order and physical walk are identical to the plain run
    (generation is pad-invariant per sample)."""
    model, variables = gen_variables
    feats = np.random.default_rng(3).standard_normal(
        (10, 2, 1024)).astype(np.float32)

    # Sweep seeds: the sequencer redraws its random segment at next()
    # call boundaries, so a head batch that shifted those boundaries
    # would change the walk for SOME seed even when one seed happens to
    # match (seed 1 diverged under the pre-fix partition).
    for seed in range(4):
        plain = FrameSynthesizer(variables, str(synthetic_step3_dir),
                                 model=model, batch_size=4, seed=seed)
        headed = FrameSynthesizer(variables, str(synthetic_step3_dir),
                                  model=model, batch_size=4, seed=seed,
                                  first_batch_size=3)
        a = list(plain.iterate_synthesized_frames(feats))
        b = list(headed.iterate_synthesized_frames(feats))
        assert len(a) == len(b) == 10
        for x, y in zip(a, b):
            assert x["index"] == y["index"]
            assert x["physical_index"] == y["physical_index"]
            np.testing.assert_array_equal(x["frame"], y["frame"])

    # degenerate configs disable themselves: head >= batch, negative
    assert FrameSynthesizer(variables, str(synthetic_step3_dir),
                            model=model, batch_size=4, seed=0,
                            first_batch_size=4).first_batch_size == 0
    assert FrameSynthesizer(variables, str(synthetic_step3_dir),
                            model=model, batch_size=4, seed=0,
                            first_batch_size=-1).first_batch_size == 0


def test_adaptive_transfer_format_matches_fixed(synthetic_step3_dir,
                                                gen_variables):
    """'adaptive' picks the format its measured-fps table says wins and
    its frames are byte-identical to the corresponding fixed-format run
    (the choice only swaps which packed executable ships the bytes)."""
    import time

    model, variables = gen_variables
    feats = np.random.default_rng(7).standard_normal(
        (8, 2, 1024)).astype(np.float32)

    fixed = {}
    for fmt in ("bgr", "yuv420"):
        s = FrameSynthesizer(variables, str(synthetic_step3_dir),
                             model=model, batch_size=4, seed=9,
                             transfer_format=fmt)
        fixed[fmt] = [it["frame"]
                      for it in s.iterate_synthesized_frames(feats)]

    for winner in ("yuv420", "bgr"):
        loser = "bgr" if winner == "yuv420" else "yuv420"
        synth = FrameSynthesizer(variables, str(synthetic_step3_dir),
                                 model=model, batch_size=4, seed=9,
                                 transfer_format="adaptive")
        # pre-seed both arms of the measured-fps table so the call
        # takes the argmax (no exploration: last_explore is fresh)
        synth._fmt_fps = {(winner, "small"): 500.0,
                          (loser, "small"): 100.0}
        synth._last_explore = time.time()
        got = [it["frame"]
               for it in synth.iterate_synthesized_frames(feats)]
        assert synth._active_format == winner
        for a, b in zip(got, fixed[winner]):
            np.testing.assert_array_equal(a, b)


def test_adaptive_bandit_bootstrap_and_feedback(synthetic_step3_dir,
                                                gen_variables):
    """With no measurements the first call runs the slow-tunnel-safe
    default (yuv420) and records its fps; the second call measures the
    other arm; later calls take the argmax. The head batch never incurs
    any probe — the choice is a table lookup."""
    model, variables = gen_variables
    feats = np.random.default_rng(7).standard_normal(
        (8, 2, 1024)).astype(np.float32)
    synth = FrameSynthesizer(variables, str(synthetic_step3_dir),
                             model=model, batch_size=4, seed=9,
                             transfer_format="adaptive",
                             first_batch_size=2)
    assert synth._active_format == "yuv420"
    list(synth.iterate_synthesized_frames(feats))
    assert ("yuv420", "small") in synth._fmt_fps
    assert ("bgr", "small") not in synth._fmt_fps
    list(synth.iterate_synthesized_frames(feats))   # measures bgr arm
    assert ("bgr", "small") in synth._fmt_fps
    list(synth.iterate_synthesized_frames(feats))   # argmax from here
    table = synth._fmt_fps
    best = max(("bgr", "yuv420"),
               key=lambda f: table[(f, "small")])
    assert synth._active_format == best

    # pinning (the bench helper contract): fixed format, no feedback
    before = dict(synth._fmt_fps)
    saved = (synth.transfer_format, synth._active_format)
    synth.transfer_format, synth._active_format = "bgr", "bgr"
    try:
        list(synth.iterate_synthesized_frames(feats))
    finally:
        synth.transfer_format, synth._active_format = saved
    assert synth._fmt_fps == before
