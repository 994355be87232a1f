"""Offline inference demo: synthetic speaker -> lip-synced mp4.

Runs end-to-end without any external weights (random-initialized models,
synthetic speaker assets) — exercises the exact production code path:

    python examples/offline_demo.py --out /tmp/demo.mp4 [--seconds 2]

With real artifacts, swap the random init for the importers (see README
"Usage") — everything else is identical.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # repo root (bench + package imports)

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/calipsync_demo.mp4")
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from calipsync_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    from bench import make_synthetic_speaker
    from calipsync_tpu.audio.hubert_pipeline import HubertFeatureExtractor
    from calipsync_tpu.audio.io import save_wav
    from calipsync_tpu.infer.synthesizer import FrameSynthesizer
    from calipsync_tpu.nn.hubert import HubertConfig, HubertModel
    from calipsync_tpu.nn.unet import Generator
    from calipsync_tpu.pipelines.inference import VideoStreamManager

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    print(f"devices: {jax.devices()}")

    model = Generator(dtype=dtype)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 160, 160, 6)),
                                    jnp.zeros((1, 32, 32, 32)))

    # tiny random HuBERT stand-in (use load_hf_checkpoint with the real
    # facebook/hubert-large-ls960-ft directory in production)
    hcfg = HubertConfig(hidden_size=1024, num_hidden_layers=2,
                        num_attention_heads=8, intermediate_size=512,
                        conv_dim=(64,) * 3, conv_kernel=(10, 3, 2),
                        conv_stride=(5, 4, 4))
    hub_vars = jax.jit(HubertModel(hcfg).init)(jax.random.key(1),
                                               jnp.zeros((1, 4000)))
    hubert = HubertFeatureExtractor(hub_vars, hcfg)

    with tempfile.TemporaryDirectory() as tmp:
        assets = make_synthetic_speaker(tmp, n_frames=40, res=360)
        wav = os.path.join(tmp, "drive.wav")
        t = np.linspace(0, args.seconds, int(16000 * args.seconds),
                        endpoint=False)
        save_wav(wav, (0.4 * np.sin(2 * np.pi * 200 * t)).astype(
            np.float32), 16000)

        synth = FrameSynthesizer(variables, assets, model=model,
                                 batch_size=args.batch, seed=0)
        mgr = VideoStreamManager(synth, hubert, fps=25)
        result = mgr.process_single_file(wav, args.out)
        print(f"wrote {result['frames']} frames -> {args.out}"
              + (f" (+ audio side-car {result['audio_side_car']})"
                 if result.get("audio_side_car") else ""))


if __name__ == "__main__":
    main()
