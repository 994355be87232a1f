"""Offline (file-to-file) inference A/B: sequential vs pipelined manager.

Measures end-to-end wall time of VideoStreamManager.process_single_file
on the real TPU with the REAL 24-layer HuBERT featurizer (random weights
— compute cost is weight-independent), frame synthesis on a synthetic
speaker, and cv2 mp4 encoding. The pipelined path overlaps the three
stages (pipelines/inference.py); the sequential path is the reference
flow (featurize everything, then synthesize+encode).

Env: OFF_SECONDS (audio length, default 60), OFF_RES (default 480),
OFF_BATCH (default 128), OFF_REPS (default 2, alternating).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_synthetic_speaker
    from calipsync_tpu.audio.io import save_wav
    from calipsync_tpu.audio.hubert_pipeline import (HubertConfig,
                                                     HubertFeatureExtractor)
    from calipsync_tpu.core.cache import enable_compile_cache
    from calipsync_tpu.infer.synthesizer import FrameSynthesizer
    from calipsync_tpu.nn.hubert import HubertModel
    from calipsync_tpu.nn.unet import Generator
    from calipsync_tpu.pipelines.inference import VideoStreamManager

    enable_compile_cache()
    seconds = int(os.environ.get("OFF_SECONDS", "60"))
    res = int(os.environ.get("OFF_RES", "480"))
    batch = int(os.environ.get("OFF_BATCH", "128"))
    reps = int(os.environ.get("OFF_REPS", "2"))

    model = Generator(dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 160, 160, 6)),
                                    jnp.zeros((1, 32, 32, 32)))

    hcfg = HubertConfig.large()
    hmodel = HubertModel(hcfg, dtype=jnp.bfloat16)
    hvars = jax.jit(hmodel.init)(jax.random.key(1),
                                 jnp.zeros((1, 32000), jnp.float32))
    extractor = HubertFeatureExtractor(hvars, hcfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    wav_data = (rng.standard_normal(seconds * 16000) * 0.1).astype(
        np.float32)

    out = {"seconds": seconds, "res": res, "batch": batch,
           "sequential_s": [], "pipelined_s": [],
           "ttff_sequential_s": [], "ttff_pipelined_s": []}
    with tempfile.TemporaryDirectory() as tmp:
        data_dir = make_synthetic_speaker(tmp, res=res)
        wav = os.path.join(tmp, "in.wav")
        save_wav(wav, wav_data, 16000)

        def run(pipelined: bool, out_name: str, record: bool) -> float:
            synth = FrameSynthesizer(variables, data_dir, model=model,
                                     batch_size=batch, seed=0,
                                     transfer_format="yuv420")
            mgr = VideoStreamManager(synth, extractor,
                                     pipelined=pipelined)
            t0 = time.time()
            r = mgr.process_single_file(wav, os.path.join(tmp, out_name))
            dt = time.time() - t0
            out["frames"] = r["frames"]
            if record:  # time-to-first-synthesized-frame (VERDICT r3 #4)
                key = "ttff_pipelined_s" if pipelined \
                    else "ttff_sequential_s"
                out[key].append(r["ttff_s"])
            return round(dt, 2)

        run(False, "warm.mp4", False)  # compile/warm hubert + generator
        run(True, "warm2.mp4", False)
        for _ in range(reps):  # interleaved: tunnel drift hits both
            out["sequential_s"].append(run(False, "seq.mp4", True))
            out["pipelined_s"].append(run(True, "pipe.mp4", True))

    seq = float(np.median(out["sequential_s"]))
    pipe = float(np.median(out["pipelined_s"]))
    out["median_sequential_s"] = seq
    out["median_pipelined_s"] = pipe
    out["speedup"] = round(seq / pipe, 2)
    out["pipelined_fps"] = round(out["frames"] / pipe, 1)
    out["median_ttff_sequential_s"] = float(
        np.median(out["ttff_sequential_s"]))
    out["median_ttff_pipelined_s"] = float(
        np.median(out["ttff_pipelined_s"]))
    out["ttff_speedup"] = round(out["median_ttff_sequential_s"] /
                                out["median_ttff_pipelined_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
