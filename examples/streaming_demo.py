"""Real-time streaming demo: priority queues, silence filler, co-host mode.

Runs without external weights; the FilePlayer collects the paced stream
into an mp4 so the run is observable headlessly:

    python examples/streaming_demo.py --out /tmp/stream.mp4

Swap FilePlayer for WindowPlayer (GUI) or RTMPPlayer (push) in production.
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # repo root (bench + package imports)

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/calipsync_stream.mp4")
    p.add_argument("--play-seconds", type=float, default=4.0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from calipsync_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    from bench import make_synthetic_speaker
    from calipsync_tpu.audio.hubert_pipeline import HubertFeatureExtractor
    from calipsync_tpu.audio.io import save_wav
    from calipsync_tpu.infer.synthesizer import FrameSynthesizer
    from calipsync_tpu.metrics import global_metrics
    from calipsync_tpu.nn.hubert import HubertConfig, HubertModel
    from calipsync_tpu.nn.unet import Generator
    from calipsync_tpu.serve.players import FilePlayer
    from calipsync_tpu.serve.stream_manager import StreamingVideoManager

    model = Generator(dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 160, 160, 6)),
                                    jnp.zeros((1, 32, 32, 32)))
    hcfg = HubertConfig(hidden_size=1024, num_hidden_layers=2,
                        num_attention_heads=8, intermediate_size=512,
                        conv_dim=(64,) * 3, conv_kernel=(10, 3, 2),
                        conv_stride=(5, 4, 4))
    hub_vars = jax.jit(HubertModel(hcfg).init)(jax.random.key(1),
                                               jnp.zeros((1, 4000)))
    hubert = HubertFeatureExtractor(hub_vars, hcfg)

    with tempfile.TemporaryDirectory() as tmp:
        assets = make_synthetic_speaker(tmp, n_frames=40, res=360)
        synth = FrameSynthesizer(variables, assets, model=model,
                                 batch_size=8, seed=0)
        player = FilePlayer(args.out, realtime=True, fps=25,
                            sample_rate=24_000)
        mgr = StreamingVideoManager(synth, hubert, player,
                                    buffer_threshold=25,
                                    synthesis_window_seconds=1.0)

        def tone(name, seconds, freq):
            path = os.path.join(tmp, name)
            t = np.linspace(0, seconds, int(16000 * seconds),
                            endpoint=False)
            save_wav(path, (0.4 * np.sin(2 * np.pi * freq * t)).astype(
                np.float32), 16000)
            return path

        mgr.start_playing()  # silence filler keeps the avatar idling
        # first window includes the jit compile — wait for frames to flow
        deadline = time.time() + 600
        while time.time() < deadline and not player.frames:
            time.sleep(0.2)
        mgr.add_audio_to_queue(tone("reply.wav", 1.5, 220))
        time.sleep(0.5)
        # high-priority interjection; with is_interrupt=False it waits for
        # the current audio to finish
        mgr.add_audio_to_queue(tone("alert.wav", 0.8, 440),
                               queue_name="danmu")
        time.sleep(args.play_seconds)
        mgr.stop_playing()
        path = player.finalize()
        print(f"streamed {len(player.frames)} frames -> {path}")
        print("metrics:", global_metrics().snapshot()["counters"])


if __name__ == "__main__":
    main()
