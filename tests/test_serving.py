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
