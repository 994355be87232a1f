"""Bound the step1 long-audio feature divergence (VERDICT r4 #5).

The reference one-passes the FULL 1-5 min training clip through HuBERT
(reference utils/hubert_extractor.py:67-77 via
step1_data_preprocess.py:191-192); this repo's ``extract_auto``
switches to the overlap-chunked path past one 20 s chunk
(audio/hubert_pipeline.py:272-281) because a 5-min one-pass is a
22,500-token quadratic attention. Documented, but the divergence had
never been measured. This tool measures it two ways:

1. **Feature-level**: per-row cosine similarity and max-abs delta
   between ``extract`` (one-pass, reference-exact semantics) and
   ``extract_features`` (chunked) on 60-300 s clips.
2. **Downstream**: two step1 datasets identical except for which
   feature path produced ``aud_hu.npy``; train the generator the same
   number of steps on each (same init, same batch order) and compare
   the loss trajectories.

Caveat recorded in the artifact: no pretrained HuBERT weights exist in
this image, so the encoder is randomly initialized — the measurement
bounds the *numerical* divergence of the chunking scheme (overlap
rollback, boundary context truncation) through a real 24-layer
transformer, not the phonetic drift of the trained model. The chunk
scheme's boundary behavior (kernel-stride overlap) is
weight-independent; attention-context truncation is weight-dependent
and this bound is indicative, not final.

Writes HUBERT_DELTA_r05.json (env HUBERT_DELTA_OUT overrides).
Env: DELTA_LENGTHS (default "60,120,300"), DELTA_TRAIN_SECONDS (60),
DELTA_TRAIN_EPOCHS (3), DELTA_DTYPE (float32 — fp32 isolates chunking
from bf16 rounding; bfloat16 measures the serving stack).
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from clone_proof import (FixedLipDetector,  # noqa: E402
                         make_talking_video, speech_like_audio)


def row_metrics(a: np.ndarray, b: np.ndarray) -> dict:
    """Per-(T/2,2,1024)-row agreement between two feature arrays."""
    n = min(len(a), len(b))
    a = a[:n].reshape(n, -1).astype(np.float64)
    b = b[:n].reshape(n, -1).astype(np.float64)
    dots = np.einsum("ij,ij->i", a, b)
    cos = dots / np.maximum(np.linalg.norm(a, axis=1)
                            * np.linalg.norm(b, axis=1), 1e-12)
    absdiff = np.abs(a - b)
    denom = np.maximum(np.abs(a), np.abs(b)).max()
    return {
        "rows": int(n),
        "cos_sim_min": float(cos.min()),
        "cos_sim_mean": float(cos.mean()),
        "rows_below_cos_999": int((cos < 0.999).sum()),
        "max_abs_delta": float(absdiff.max()),
        "max_rel_delta": float(absdiff.max() / max(denom, 1e-12)),
        "mean_abs_delta": float(absdiff.mean()),
    }


def main():
    import jax
    import jax.numpy as jnp

    from calipsync_tpu.audio.hubert_pipeline import HubertFeatureExtractor
    from calipsync_tpu.config import (ModelConfig, PipelineConfig,
                                      TrainConfig)
    from calipsync_tpu.core.cache import enable_compile_cache
    from calipsync_tpu.nn.hubert import HubertConfig, HubertModel

    enable_compile_cache()
    lengths = [int(s) for s in os.environ.get(
        "DELTA_LENGTHS", "60,120,300").split(",")]
    train_seconds = float(os.environ.get("DELTA_TRAIN_SECONDS", "60"))
    train_epochs = int(os.environ.get("DELTA_TRAIN_EPOCHS", "3"))
    dtype_name = os.environ.get("DELTA_DTYPE", "float32")
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]

    hcfg = HubertConfig.large()
    hmodel = HubertModel(hcfg, dtype=dtype)
    hvars = jax.jit(hmodel.init)(jax.random.key(1),
                                 jnp.zeros((1, 32000), jnp.float32))
    extractor = HubertFeatureExtractor(hvars, hcfg, dtype=dtype)

    out = {"platform": jax.devices()[0].platform,
           "hubert_dtype": dtype_name,
           "weights": "random-init (no pretrained HuBERT in-image; "
                      "see module docstring caveat)",
           "feature_delta": []}

    # ---- 1. feature-level delta, one-pass vs chunked ----------------
    for secs in lengths:
        audio = speech_like_audio(secs, seed=123 + secs)
        t0 = time.time()
        try:
            one = extractor.extract(audio)
        except Exception as e:  # e.g. HBM OOM on the quadratic attention
            out["feature_delta"].append({
                "seconds": secs,
                "one_pass_error": f"{type(e).__name__}: {e}"[:300]})
            print(f"one-pass failed at {secs}s: {e}", flush=True)
            continue
        t_one = time.time() - t0
        t0 = time.time()
        chunked = extractor.extract_features(audio)
        t_chunk = time.time() - t0
        m = row_metrics(one, chunked)
        m.update({"seconds": secs,
                  "one_pass_wall_s": round(t_one, 2),
                  "chunked_wall_s": round(t_chunk, 2),
                  "tokens_one_pass": int(secs * 50)})
        out["feature_delta"].append(m)
        print(json.dumps(m), flush=True)

    # ---- 2. downstream: identical training, features swapped --------
    from calipsync_tpu.pipelines.step1_preprocess import TrainPreprocessor
    from calipsync_tpu.pipelines.step2_train import train_digital_model

    res = 480
    with tempfile.TemporaryDirectory() as tmp:
        video = os.path.join(tmp, "train.mp4")
        make_talking_video(video, res, train_seconds, seed=0)
        lip = FixedLipDetector(res)
        data_one = os.path.join(tmp, "speaker_onepass")
        TrainPreprocessor(lip, extractor,
                          long_audio="one_pass").process_video(
            video, data_one)
        data_chunk = os.path.join(tmp, "speaker_chunked")
        # frames/landmarks are identical (same video, same detector) —
        # copy and regenerate ONLY the features via the chunked path
        shutil.copytree(data_one, data_chunk)
        from calipsync_tpu.audio.io import load_audio

        wav = load_audio(os.path.join(data_chunk, "aud.wav"), 16_000)
        np.save(os.path.join(data_chunk, "aud_hu.npy"),
                extractor.extract_features(wav))

        losses = {}
        for tag, ddir in (("one_pass", data_one),
                          ("chunked", data_chunk)):
            cfg = PipelineConfig(
                model=ModelConfig(dtype="float32"),
                train=TrainConfig(batch_size=16, epochs=train_epochs))
            save_dir = os.path.join(tmp, f"ckpt_{tag}")
            hist = []
            train_digital_model(ddir, save_dir, cfg=cfg,
                                log_every=1,
                                loss_history=hist)
            losses[tag] = hist

        n = min(len(losses["one_pass"]), len(losses["chunked"]))
        a = np.asarray(losses["one_pass"][:n], np.float64)
        b = np.asarray(losses["chunked"][:n], np.float64)
        out["downstream"] = {
            "steps": int(n),
            "epochs": train_epochs,
            "final_loss_one_pass": float(a[-1]),
            "final_loss_chunked": float(b[-1]),
            "final_abs_delta": float(abs(a[-1] - b[-1])),
            "max_abs_delta": float(np.abs(a - b).max()),
            "mean_abs_delta": float(np.abs(a - b).mean()),
            "loss_scale_mean": float(a.mean()),
        }

    path = os.environ.get("HUBERT_DELTA_OUT", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "HUBERT_DELTA_r05.json"))
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
