"""Real-time streaming soak on the actual chip.

Runs the full StreamingVideoManager loop (HuBERT featurize -> priority
queues -> synthesis windows -> audio-pegged player) for SOAK_SECONDS of
wall clock with audio files dropped in periodically, then reports:

  frames played vs expected at 25 fps, final A/V drift from the player's
  pegged clock, producer errors, and queue health.

This is the live counterpart of the simulated-clock zero-drift test
(tests/test_serving.py): same invariant, real time, real device.

Env: SOAK_SECONDS (default 60), SOAK_BATCH (default 32).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


class _ToyHubert:
    """Deterministic features at the real cadence (2 rows per frame pair),
    standing in for the 315M model so the soak isolates serving timing."""

    def extract_from_file(self, path):
        from calipsync_tpu.audio.io import load_audio

        audio = load_audio(path, 16_000)
        n = max(1, len(audio) // 640)
        rng = np.random.default_rng(abs(hash(os.path.basename(path)))
                                    % 2**31)
        return rng.standard_normal((n, 2, 1024)).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_synthetic_speaker

    from calipsync_tpu.audio.io import save_wav
    from calipsync_tpu.core.cache import enable_compile_cache
    from calipsync_tpu.infer.synthesizer import FrameSynthesizer
    from calipsync_tpu.nn.unet import Generator
    from calipsync_tpu.serve.players import NullPlayer
    from calipsync_tpu.serve.stream_manager import StreamingVideoManager

    enable_compile_cache()
    seconds = float(os.environ.get("SOAK_SECONDS", "60"))
    batch = int(os.environ.get("SOAK_BATCH", "32"))

    model = Generator(dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 160, 160, 6)),
                                    jnp.zeros((1, 32, 32, 32)))

    played = []
    with tempfile.TemporaryDirectory() as tmp:
        assets = make_synthetic_speaker(tmp, res=480)
        synth = FrameSynthesizer(variables, assets, model=model,
                                 batch_size=batch, seed=0,
                                 transfer_format="yuv420")
        player = NullPlayer(fps=25, sample_rate=24_000,
                            on_frame=lambda it: played.append(
                                time.monotonic()))
        mgr = StreamingVideoManager(synth, _ToyHubert(), player,
                                    buffer_threshold=25,
                                    synthesis_window_seconds=1.0)

        def tone(name, dur, freq):
            p = os.path.join(tmp, name)
            t = np.linspace(0, dur, int(16_000 * dur), endpoint=False)
            save_wav(p, (0.3 * np.sin(2 * np.pi * freq * t)).astype(
                np.float32), 16_000)
            return p

        clips = [tone(f"clip{i}.wav", 4.0, 150 + 40 * i)
                 for i in range(4)]
        # compile the window-sized executable BEFORE the clock starts
        # (cold compile is minutes over this toolchain)
        warm = np.zeros((25, 2, 1024), np.float32)
        for _ in synth.iterate_synthesized_frames(warm):
            pass
        mgr.start_playing()
        t0 = time.monotonic()
        i = 0
        while time.monotonic() - t0 < seconds:
            if i < 1000 and (time.monotonic() - t0) > i * 7.0:
                mgr.add_audio_to_queue(clips[i % len(clips)],
                                       queue_name="danmu" if i % 3 == 2
                                       else "normal")
                i += 1
            time.sleep(0.25)
        drift = player.av_drift()
        samples = player.samples_played
        mgr.stop_playing()
        elapsed = time.monotonic() - t0

    # warm-up (first window compiles) eats into the frame budget; compare
    # post-first-frame rates
    n = len(played)
    if n == 0:
        print(json.dumps({"wall_s": round(elapsed, 2),
                          "frames_played": 0,
                          "note": "cold compile exceeded the soak window; "
                                  "re-run with the warm cache"}))
        return
    paced = (played[-1] - played[0]) / max(n - 1, 1)
    print(json.dumps({
        "wall_s": round(elapsed, 2),
        "frames_played": n,
        "first_frame_after_s": round(played[0] - t0, 2),
        "mean_frame_period_s": round(paced, 5),
        "expected_period_s": 0.04,
        "audio_seconds_played": round(samples / 24_000.0, 2),
        "av_drift_s": round(drift, 4),
        "producer_errors": mgr.producer_errors,
    }))


if __name__ == "__main__":
    main()
