"""Box-level mp4 remuxer tests (media/mp4.py).

Covers the ffmpeg-less single-file A/V delivery path the reference gets
from `ffmpeg -c:v copy` (reference inference.py:108-110): video samples
must survive the remux bit-exact, the PCM track must round-trip
losslessly, and cv2 must still decode the result.
"""

import os

import cv2
import numpy as np
import pytest

from calipsync_tpu.media.mp4 import (has_pcm_audio, mux_pcm_audio,
                                     parse_track, read_pcm_audio)


@pytest.fixture()
def video_path(tmp_path):
    """A tiny cv2-written (video-only) mp4: 12 frames of moving blocks."""
    path = str(tmp_path / "in.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                         (64, 48))
    rng = np.random.default_rng(0)
    for i in range(12):
        frame = np.zeros((48, 64, 3), np.uint8)
        frame[:, (i * 5) % 60:(i * 5) % 60 + 4] = rng.integers(
            0, 255, 3, dtype=np.uint8)
        vw.write(frame)
    vw.release()
    return path


def _decode_all(path):
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return frames


def test_mux_video_samples_bit_exact(video_path, tmp_path):
    audio = np.sin(np.linspace(0, 440 * 2 * np.pi, 16_000 * 12 // 25,
                               dtype=np.float32)) * 0.5
    out = str(tmp_path / "out.mp4")
    mux_pcm_audio(video_path, audio, 16_000, out)

    src, src_buf = parse_track(video_path, b"vide")
    dst, dst_buf = parse_track(out, b"vide")
    assert dst.sample_sizes == src.sample_sizes
    assert dst.timescale == src.timescale
    assert dst.stts == src.stts
    assert dst.stsd == src.stsd
    for (so, ss), (do, ds) in zip(
            zip(src.sample_offsets, src.sample_sizes),
            zip(dst.sample_offsets, dst.sample_sizes)):
        assert src_buf[so:so + ss] == dst_buf[do:do + ds]


def test_mux_cv2_still_decodes(video_path, tmp_path):
    audio = np.zeros(16_000, np.float32)
    out = str(tmp_path / "out.mp4")
    mux_pcm_audio(video_path, audio, 16_000, out)
    src_frames = _decode_all(video_path)
    dst_frames = _decode_all(out)
    assert len(dst_frames) == len(src_frames) == 12
    for a, b in zip(src_frames, dst_frames):
        np.testing.assert_array_equal(a, b)


def test_pcm_round_trip(video_path, tmp_path):
    rng = np.random.default_rng(1)
    audio = rng.uniform(-0.9, 0.9, 24_000).astype(np.float32)
    out = str(tmp_path / "out.mp4")
    mux_pcm_audio(video_path, audio, 24_000, out)
    assert has_pcm_audio(out)
    assert not has_pcm_audio(video_path)
    rate, back = read_pcm_audio(out)
    assert rate == 24_000
    # encode quantizes at *32767, decode divides by 32768: bound is one
    # quantization step plus the scale mismatch (|x|*1/32768^2)
    np.testing.assert_allclose(back, audio, atol=2.0 / 32768)


def test_pcm_stereo_int16_passthrough(video_path, tmp_path):
    rng = np.random.default_rng(2)
    audio = rng.integers(-30000, 30000, (8_000, 2)).astype(np.int16)
    out = str(tmp_path / "out.mov")
    mux_pcm_audio(video_path, audio, 16_000, out)
    rate, back = read_pcm_audio(out)
    assert rate == 16_000
    expect = audio.astype(np.float32).mean(axis=1) / 32768.0
    np.testing.assert_allclose(back, expect, atol=1e-6)


def test_mux_audio_single_file_without_ffmpeg(video_path, tmp_path,
                                              monkeypatch):
    """audio.io.mux_audio must deliver ONE playable file on ffmpeg-less
    hosts via the box-level remux (no .wav side-car)."""
    from calipsync_tpu.audio import io as aio
    from scipy.io import wavfile

    monkeypatch.setattr(aio, "have_ffmpeg", lambda: False)
    wav = str(tmp_path / "a.wav")
    wavfile.write(wav, 16_000, np.zeros(16_000, np.float32))
    out = str(tmp_path / "muxed.mp4")
    side_car = aio.mux_audio(video_path, wav, out)
    assert side_car is None
    assert not os.path.exists(out + ".wav")
    assert has_pcm_audio(out)
    assert len(_decode_all(out)) == 12


def test_extract_wav_native_from_pcm_mp4(video_path, tmp_path, monkeypatch):
    """step1's audio extraction works without ffmpeg on our own outputs."""
    from calipsync_tpu.audio import io as aio
    from scipy.io import wavfile

    monkeypatch.setattr(aio, "have_ffmpeg", lambda: False)
    t = np.linspace(0, 1, 24_000, endpoint=False)
    audio = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    av = str(tmp_path / "av.mp4")
    mux_pcm_audio(video_path, audio, 24_000, av)

    wav = str(tmp_path / "x.wav")
    aio.extract_wav(av, wav, sample_rate=16_000)
    sr, data = wavfile.read(wav)
    assert sr == 16_000
    ref = aio.resample(audio, 24_000, 16_000)
    np.testing.assert_allclose(data, ref, atol=2.0 / 32767)

    # load_audio hits the same native path for PCM-in-mp4
    loaded = aio.load_audio(av, 24_000)
    np.testing.assert_allclose(loaded, audio, atol=1.5 / 32767)


def test_mux_audio_side_car_fallback_on_corrupt_container(tmp_path,
                                                          monkeypatch):
    """A container that dies mid-box (struct.error, not just ValueError)
    must still reach the documented wav side-car last resort."""
    import struct as _struct

    from calipsync_tpu.audio import io as aio
    from scipy.io import wavfile

    monkeypatch.setattr(aio, "have_ffmpeg", lambda: False)
    bad = str(tmp_path / "truncated.mp4")
    with open(bad, "wb") as f:  # size==1 promises a largesize that's cut
        f.write(_struct.pack(">I4s", 1, b"ftyp") + b"\x00\x00")
    wav = str(tmp_path / "a.wav")
    wavfile.write(wav, 16_000, np.zeros(8_000, np.float32))
    out = str(tmp_path / "out.mp4")
    side_car = aio.mux_audio(bad, wav, out)
    assert side_car == out + ".wav"
    assert os.path.exists(side_car) and os.path.exists(out)


def test_mux_rejects_unrepresentable_sample_rate(video_path, tmp_path):
    with pytest.raises(ValueError, match="64 kHz"):
        mux_pcm_audio(video_path, np.zeros(1000, np.float32), 96_000,
                      str(tmp_path / "x.mp4"))


def test_video_only_input_raises_without_ffmpeg(video_path, monkeypatch):
    from calipsync_tpu.audio import io as aio

    monkeypatch.setattr(aio, "have_ffmpeg", lambda: False)
    with pytest.raises(RuntimeError, match="PCM"):
        aio.extract_wav(video_path, "/tmp/never.wav")
    with pytest.raises(ValueError):
        read_pcm_audio(video_path)
