"""Streaming manager + players: queues, silence filler, pacing, file mux."""

import os
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from calipsync_tpu.infer.synthesizer import FrameSynthesizer
from calipsync_tpu.nn.unet import Generator
from calipsync_tpu.serve.players import FilePlayer, NullPlayer
from calipsync_tpu.serve.stream_manager import (AudioBatch,
                                                StreamingVideoManager)


class _FakeHubert:
    """Deterministic per-file features: n frames of constant rows."""

    def extract_from_file(self, path):
        from calipsync_tpu.audio.io import load_audio

        audio = load_audio(path, 16_000)
        n = max(1, len(audio) // 640)  # one row per 2 frames worth
        seed = abs(hash(os.path.basename(path))) % 1000
        rng = np.random.default_rng(seed)
        return rng.standard_normal((n, 2, 1024)).astype(np.float32)


@pytest.fixture(scope="module")
def synth(synthetic_step3_dir):
    model = Generator()
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 160, 160, 6)),
                                    jnp.zeros((1, 32, 32, 32)))
    return FrameSynthesizer(variables, str(synthetic_step3_dir),
                            model=model, batch_size=4, seed=0)


def _wav(tmp_path, name, seconds, sr=16_000):
    from calipsync_tpu.audio.io import save_wav

    path = str(tmp_path / name)
    t = np.linspace(0, seconds, int(sr * seconds), endpoint=False)
    save_wav(path, (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32),
             sr)
    return path


def test_add_audio_and_priority(tmp_path, synth):
    mgr = StreamingVideoManager(synth, _FakeHubert(), NullPlayer(),
                                buffer_threshold=5)
    n1 = mgr.add_audio_to_queue(_wav(tmp_path, "a.wav", 1.0))
    n2 = mgr.add_audio_to_queue(_wav(tmp_path, "b.wav", 0.5),
                                queue_name="danmu")
    lengths = mgr.get_queue_lengths()
    assert lengths["normal"] == n1 and lengths["danmu"] == n2

    batch, sync = mgr._collect_interrupt()
    # danmu drains first (priority)
    assert all(b.audio_path.endswith("b.wav") for b in batch)
    assert sync is True


def test_no_interrupt_pins_current_audio(tmp_path, synth):
    mgr = StreamingVideoManager(synth, _FakeHubert(), NullPlayer(),
                                buffer_threshold=5,
                                synthesis_window_seconds=0.2)
    a = _wav(tmp_path, "long.wav", 1.0)
    mgr.add_audio_to_queue(a)
    batch, _, current = mgr._collect_no_interrupt(None)
    assert current == a and len(batch) > 0
    # higher-priority audio arrives mid-file: must NOT preempt
    b = _wav(tmp_path, "urgent.wav", 0.3)
    mgr.add_audio_to_queue(b, queue_name="danmu")
    batch2, _, current2 = mgr._collect_no_interrupt(current)
    assert current2 == a
    assert all(x.audio_path == a for x in batch2)


def test_silence_filler_and_cohost_features(tmp_path, synth):
    mgr = StreamingVideoManager(synth, _FakeHubert(), NullPlayer(),
                                buffer_threshold=5)
    silence = mgr._silence_window()
    assert len(silence) > 0
    assert all(b.audio_path == mgr.silence_audio_path for b in silence)

    # co-host mode: all feature rows identical (silent), audio real
    n = mgr.add_audio_to_queue(_wav(tmp_path, "host.wav", 0.5),
                               use_silent_features=True)
    rows = [mgr.audio_queues["normal"].get().hubert_feature
            for _ in range(n)]
    for r in rows[1:]:
        np.testing.assert_array_equal(r, rows[0])


def test_stream_end_to_end_with_file_player(tmp_path, synth):
    out = str(tmp_path / "stream.mp4")
    player = FilePlayer(out, fps=25, sample_rate=24_000)
    mgr = StreamingVideoManager(synth, _FakeHubert(), player,
                                buffer_threshold=8,
                                synthesis_window_seconds=0.2)
    mgr.add_audio_to_queue(_wav(tmp_path, "clip.wav", 0.6))
    mgr.start_playing()
    deadline = time.time() + 90  # first call compiles the generate fn
    while time.time() < deadline and len(player.frames) < 10:
        time.sleep(0.1)
    mgr.stop_playing()
    assert len(player.frames) >= 10
    assert player.frames[0].shape == (480, 480, 3)
    assert all(a.shape == (24_000 // 25,) for a in player.audio)
    path = player.finalize()
    assert os.path.getsize(path) > 0


class _FakeSynth:
    """Manager-logic stand-in: yields one frame dict per feature row;
    optionally fails the first N calls (producer backoff path)."""

    def __init__(self, fail_first: int = 0):
        self.calls = 0
        self.fail_first = fail_first

    def iterate_synthesized_frames(self, features, start_frame_idx,
                                   is_generate_sync_frame=True):
        self.calls += 1
        if self.calls <= self.fail_first:
            raise RuntimeError("transient synth failure")
        for i in range(len(features)):
            yield {"frame": np.zeros((8, 8, 3), np.uint8),
                   "index": start_frame_idx + i}


def _const_wav(tmp_path, name, seconds, value, sr=16_000):
    """Constant-valued wav so emitted audio chunks identify their file."""
    from calipsync_tpu.audio.io import save_wav

    path = str(tmp_path / name)
    save_wav(path, np.full(int(sr * seconds), value, np.float32), sr)
    return path


def test_warmup_and_ttf_marks(tmp_path):
    """warmup() pre-featurizes silence + pre-runs a synthesis window
    WITHOUT uploading frames; after start_playing the producer records
    the first window's stage timestamps in ttf_marks."""
    seen = []
    player = NullPlayer(fps=100, on_frame=lambda it: seen.append(it))
    fake = _FakeSynth()
    mgr = StreamingVideoManager(fake, _FakeHubert(), player,
                                buffer_threshold=5,
                                synthesis_window_seconds=0.2)
    mgr.warmup()
    assert fake.calls == 1            # the warm window ran
    assert mgr._silence_batches is not None  # silence cache populated
    assert not seen                   # nothing uploaded during warmup
    mgr.start_playing()
    deadline = time.time() + 10
    while time.time() < deadline and len(seen) < 3:
        time.sleep(0.01)
    mgr.stop_playing()
    marks = mgr.ttf_marks
    assert {"producer_start", "collected", "synth_first",
            "uploaded"} <= set(marks)
    assert (marks["producer_start"] <= marks["collected"]
            <= marks["synth_first"] <= marks["uploaded"])


def test_producer_error_backoff_recovers(tmp_path):
    """Producer survives a synthesis exception: backs off, keeps streaming
    (reference infer_api.py:309-315)."""
    seen = []
    player = NullPlayer(fps=100, on_frame=lambda it: seen.append(it))
    mgr = StreamingVideoManager(_FakeSynth(fail_first=1), _FakeHubert(),
                                player, buffer_threshold=5,
                                synthesis_window_seconds=0.2,
                                error_backoff_s=0.05)
    mgr.add_audio_to_queue(_wav(tmp_path, "clip.wav", 0.5))
    mgr.start_playing()
    deadline = time.time() + 10
    while time.time() < deadline and len(seen) < 8:
        time.sleep(0.01)
    mgr.stop_playing()
    assert mgr.producer_errors >= 1
    assert len(seen) >= 8  # frames kept flowing after the failure


def test_interrupt_preemption_end_to_end(tmp_path):
    """In interrupt mode a danmu file preempts the in-flight normal file
    mid-stream, then the normal file resumes (reference :229-256)."""
    seen: list[float] = []  # mean of each emitted audio chunk

    def on_frame(it):
        a = it.get("audio")
        seen.append(float(np.mean(a)) if a is not None else 0.0)

    player = NullPlayer(fps=100, on_frame=on_frame)
    mgr = StreamingVideoManager(_FakeSynth(), _FakeHubert(), player,
                                buffer_threshold=4,
                                synthesis_window_seconds=0.2,
                                is_interrupt=True)
    normal = _const_wav(tmp_path, "normal.wav", 2.0, 0.25)
    danmu = _const_wav(tmp_path, "danmu.wav", 0.4, 0.75)
    mgr.add_audio_to_queue(normal)
    mgr.start_playing()
    deadline = time.time() + 10
    while time.time() < deadline and len(seen) < 5:
        time.sleep(0.005)
    mgr.add_audio_to_queue(danmu, queue_name="danmu")
    while time.time() < deadline and sum(1 for v in seen if v > 0.5) < 5:
        time.sleep(0.005)
    # after danmu drains the normal file must resume
    n_before = len(seen)
    while time.time() < deadline and not any(
            0.1 < v < 0.5 for v in seen[n_before:]):
        time.sleep(0.005)
    mgr.stop_playing()
    kinds = [("danmu" if v > 0.5 else "normal" if v > 0.1 else "silence")
             for v in seen]
    assert "danmu" in kinds and "normal" in kinds
    first_danmu = kinds.index("danmu")
    assert "normal" in kinds[:first_danmu]      # preempted mid-file
    assert "normal" in kinds[first_danmu:]      # and resumed after


def test_collect_interrupt_mixed_sync_flag_last_wins(tmp_path):
    """Window sync flag = the LAST popped item's flag, exactly as the
    reference does (infer_api.py:252-255 '使用最后一帧的同步标志')."""
    mgr = StreamingVideoManager(_FakeSynth(), _FakeHubert(), NullPlayer(),
                                buffer_threshold=5,
                                synthesis_window_seconds=1.0,
                                is_interrupt=True)
    row = np.zeros((2, 1024), np.float32)
    chunk = np.zeros(640, np.float32)
    out_chunk = np.zeros(960, np.float32)
    for flag in (True, True, True, False, False):
        mgr.audio_queues["normal"].put(
            AudioBatch(row, chunk, out_chunk, "mixed.wav", flag))
    batch, sync = mgr._collect_interrupt()
    assert len(batch) == 5
    assert sync is False


class _SimClock:
    """Deterministic virtual clock for drift-free pacing proofs."""

    def __init__(self):
        self.now = 0.0

    def time(self) -> float:
        return self.now

    def sleep(self, dt: float) -> None:
        self.now += max(dt, 0.0)


def test_audio_pegged_clock_zero_drift_60s():
    """A simulated 60 s session with jittered per-frame chunk sizes shows
    ZERO A/V drift: emission is pegged to cumulative audio samples
    (reference player_main.py:156-174), not to per-frame periods (which
    would drift by the jitter sum)."""
    clock = _SimClock()
    times: list[float] = []
    p = NullPlayer(fps=25, sample_rate=24_000,
                   on_frame=lambda it: times.append(clock.now),
                   time_fn=clock.time, sleep_fn=clock.sleep)
    # 1500 frames = 60 s; alternate 941/979-sample chunks (mean 960)
    sizes = [941 if i % 2 == 0 else 979 for i in range(1500)]
    for i, n in enumerate(sizes):
        p.upload_frame({"frame": np.zeros((2, 2, 3), np.uint8), "index": i,
                        "audio": np.zeros(n, np.float32)})
    p.start_playing()
    deadline = time.time() + 20
    while time.time() < deadline and len(times) < 1500:
        time.sleep(0.005)
    drift = p.av_drift()
    p.stop_playing()
    assert len(times) == 1500
    expect = np.concatenate([[0.0], np.cumsum(sizes)[:-1] / 24_000.0])
    np.testing.assert_allclose(times, expect, atol=1e-6)
    # sampled right after the last render, the last chunk is still
    # "playing": |drift| is bounded by that one chunk, no accumulation
    assert abs(drift) <= max(sizes) / 24_000.0 + 1e-6
    assert p.samples_played == sum(sizes)


def test_clock_falls_back_to_fps_without_audio():
    """Frames with no audio advance the clock by one silent frame's worth
    (the reference callback emits zeros when starved)."""
    clock = _SimClock()
    times: list[float] = []
    p = NullPlayer(fps=50, sample_rate=24_000,
                   on_frame=lambda it: times.append(clock.now),
                   time_fn=clock.time, sleep_fn=clock.sleep)
    for i in range(100):
        p.upload_frame({"frame": np.zeros((2, 2, 3), np.uint8), "index": i})
    p.start_playing()
    deadline = time.time() + 10
    while time.time() < deadline and len(times) < 100:
        time.sleep(0.005)
    p.stop_playing()
    np.testing.assert_allclose(times, np.arange(100) / 50.0, atol=1e-6)


def test_starvation_reanchors_instead_of_bursting():
    """After queue starvation the player re-anchors its epoch: frames that
    arrive late play paced at fps, not in a burst to 'catch up'."""
    times: list[float] = []
    p = NullPlayer(fps=50, on_frame=lambda it: times.append(time.monotonic()))
    p.start_playing()
    for i in range(2):
        p.upload_frame({"frame": np.zeros((2, 2, 3), np.uint8), "index": i})
    time.sleep(0.4)  # starve well past the 2 queued frames
    for i in range(2, 5):
        p.upload_frame({"frame": np.zeros((2, 2, 3), np.uint8), "index": i})
    deadline = time.time() + 5
    while time.time() < deadline and len(times) < 5:
        time.sleep(0.005)
    p.stop_playing()
    assert len(times) == 5
    # the 3 post-starvation frames are paced (~20 ms), not instantaneous
    assert times[3] - times[2] >= 0.015
    assert times[4] - times[3] >= 0.015


def test_window_player_headless_gate(monkeypatch):
    from calipsync_tpu.serve.players import WindowPlayer

    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    p = WindowPlayer()
    with pytest.raises(RuntimeError, match="display"):
        p.start_playing()
    assert not p.running


def test_player_pacing():
    seen = []
    p = NullPlayer(fps=50, on_frame=lambda it: seen.append(time.monotonic()))
    p.start_playing()
    for i in range(10):
        p.upload_frame({"frame": np.zeros((4, 4, 3), np.uint8), "index": i})
    deadline = time.time() + 5
    while time.time() < deadline and len(seen) < 10:
        time.sleep(0.01)
    p.stop_playing()
    assert len(seen) == 10
    # paced at ~20ms intervals, not instantaneous
    assert (seen[-1] - seen[0]) >= 0.12


def test_virtualcam_v4l2_format_struct_and_gate(tmp_path):
    """The VIDIOC_S_FMT payload has the 64-bit videodev2.h layout, and a
    missing loopback device fails fast with guidance."""
    import struct

    from calipsync_tpu.serve.players import (V4L2_PIX_FMT_BGR24,
                                             VIDIOC_S_FMT,
                                             VirtualCamPlayer,
                                             v4l2_output_format)

    buf = v4l2_output_format(640, 480)
    assert len(buf) == 208
    assert struct.unpack_from("I", buf, 0)[0] == 2      # VIDEO_OUTPUT
    w, h, fmt, field, bpl, size = struct.unpack_from("6I", buf, 8)
    assert (w, h) == (640, 480)
    assert fmt == V4L2_PIX_FMT_BGR24 == 0x33524742      # 'BGR3' fourcc
    assert field == 1 and bpl == 640 * 3 and size == 640 * 480 * 3
    assert VIDIOC_S_FMT == 0xC0D05605                   # _IOWR('V',5,208)

    p = VirtualCamPlayer(device=str(tmp_path / "video99"))
    with pytest.raises(RuntimeError, match="v4l2loopback"):
        p.start_playing()
    assert not p.running


def test_sample_rate_mismatch_fails_loudly(tmp_path):
    """The audio-pegged player clock divides by the PLAYER's sample rate;
    a manager/player rate mismatch would silently change playback speed,
    so construction must reject it."""
    with pytest.raises(ValueError, match="sample_rate"):
        StreamingVideoManager(_FakeSynth(), _FakeHubert(),
                              NullPlayer(sample_rate=24_000),
                              output_sample_rate=48_000)


def test_stop_playing_twice_with_stuck_render_stays_unsafe():
    """Regression: a stop_playing whose join times out (pacing thread
    blocked inside a render, e.g. RTMP write to a stalled ffmpeg) must
    not let a SECOND stop_playing report the thread as stopped — that is
    the signal RTMPPlayer/VirtualCamPlayer use to decide it is safe to
    close fds the render may still be writing to."""
    import threading

    gate = threading.Event()
    entered = threading.Event()

    def block(_item):
        entered.set()
        gate.wait(timeout=30)

    p = NullPlayer(fps=1000, on_frame=block)
    p.upload_frame({"frame": None, "audio": None, "index": 0})
    p.start_playing()
    assert entered.wait(timeout=5)

    p.stop_playing()             # join times out: thread stuck in render
    assert p._stopped is False
    p.stop_playing()             # must NOT flip to True while it lives
    assert p._stopped is False

    gate.set()
    thread = p._thread
    assert thread is not None
    thread.join(timeout=5)
    p.stop_playing()
    assert p._stopped is True
