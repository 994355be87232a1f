"""Full clone-pipeline proof on the real TPU (VERDICT r3 item 2).

Runs the orchestrated product — step1 -> step2 (train) -> step3 -> offline
inference — on a synthetic one-minute talking-head clip through the
LIBRARY surface (pipelines/all_pipeline.clone_video_local, the rebuild of
/root/reference/all_pipeline.py:34-120), and records:

  - per-stage wall time + cold-start-to-avatar total,
  - HELD-OUT mouth-rect PSNR: generation quality on a separate clip of
    the same speaker (frames and audio the model never trained on),
  - eval.sync_metrics LSE-C/D of the produced video, scored by a SyncNet
    trained on this speaker's step1 data (train/syncnet_trainer.py) —
    random-weight SyncNet scores would be meaningless; in-domain-trained
    scores show the produced video carries the audio/mouth correlation.
    The original held-out clip is scored by the same SyncNet as the
    calibration ceiling.

The clip is synthetic because the reference's example video is stripped
from its snapshot (SURVEY.md section 6): a fixed face whose mouth opening
tracks the audio envelope — a learnable audio->mouth mapping. The lip
detector is the deterministic fixed-geometry stub (no pretrained detector
weights exist in this image; the detector path is parity-tested
elsewhere); HuBERT is the real 24-layer JAX model (random weights — real
compute, and its features of real audio still vary with the audio).

Writes CLONE_r04.json (or CLONE_OUT env) and prints it.

Env: CLONE_SECONDS (train clip length, default 60), CLONE_HOLD_SECONDS
(default 8), CLONE_RES (default 480), CLONE_EPOCHS (default 20),
CLONE_BATCH (default 16), CLONE_SYNC_EPOCHS (default 5).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

FPS = 25
SR = 16_000


def make_landmarks(res: int) -> np.ndarray:
    """Constant 110-point landmark set for the fixed synthetic face
    (geometry mirrors bench.make_synthetic_speaker / tests conftest)."""
    h = w = res
    xmin = w // 4
    width = w // 3
    ymin = h // 2
    cx, cy = xmin + width // 2, ymin + width // 2
    lms = np.zeros((110, 2), np.int64)
    theta = np.linspace(0, 2 * np.pi, 33, endpoint=False)
    lms[:33, 0] = (cx + 0.45 * width * np.cos(theta)).astype(np.int64)
    lms[:33, 1] = (cy + 0.45 * width * np.sin(theta)).astype(np.int64)
    rng = np.random.default_rng(7)
    lms[33:] = rng.integers(xmin, xmin + width, (77, 2))
    lms[1] = (xmin, cy)
    lms[31] = (xmin + width, cy)
    lms[52] = (cx, ymin)
    return lms


class FixedLipDetector:
    """Deterministic landmarks for the fixed synthetic face."""

    def __init__(self, res: int):
        self.lms = make_landmarks(res).astype(np.int32)

    def detect_landmarks(self, images):
        return [[self.lms.copy()] for _ in images]


def speech_like_audio(seconds: float, seed: int) -> np.ndarray:
    """Amplitude-modulated harmonic tone with random syllable envelope:
    enough spectral/temporal structure that HuBERT features track it."""
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    t = np.arange(n) / SR
    f0 = 140.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t + rng.uniform(0, 6))
    carrier = (np.sin(2 * np.pi * f0 * t)
               + 0.5 * np.sin(2 * np.pi * 2 * f0 * t)
               + 0.25 * np.sin(2 * np.pi * 3 * f0 * t))
    # syllable envelope: smoothed random gate at ~3 Hz
    n_seg = max(2, int(seconds * 3))
    gates = rng.uniform(0.05, 1.0, n_seg)
    env = np.interp(np.linspace(0, n_seg - 1, n), np.arange(n_seg), gates)
    return (0.25 * env * carrier).astype(np.float32)


def mouth_open_per_frame(audio: np.ndarray, n_frames: int) -> np.ndarray:
    """Per-frame mouth openness in [0,1] from the audio RMS envelope."""
    spf = SR // FPS
    opens = np.zeros(n_frames, np.float32)
    for i in range(n_frames):
        seg = audio[i * spf:(i + 1) * spf]
        opens[i] = np.sqrt(np.mean(seg ** 2)) if len(seg) else 0.0
    m = opens.max()
    return opens / m if m > 0 else opens


def make_talking_video(path: str, res: int, seconds: float,
                       seed: int) -> str:
    """Fixed-face clip whose mouth ellipse height tracks the audio
    envelope; returns the side-car wav path."""
    import cv2

    from calipsync_tpu.audio.io import save_wav

    audio = speech_like_audio(seconds, seed)
    wav_path = os.path.splitext(path)[0] + ".wav"
    save_wav(wav_path, audio, SR)

    n_frames = int(seconds * FPS)
    opens = mouth_open_per_frame(audio, n_frames)
    h = w = res
    xmin, width, ymin = w // 4, w // 3, h // 2
    cx, cy = xmin + width // 2, ymin + width // 2

    yy = np.linspace(40, 200, h, dtype=np.float32)[:, None]
    xx = np.linspace(0, 55, w, dtype=np.float32)[None, :]
    ch = yy + xx
    base = np.stack([ch, np.broadcast_to(yy * 0.8 + 30, ch.shape),
                     np.broadcast_to(230 - xx, ch.shape)], -1)
    rng = np.random.default_rng(seed)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), FPS,
                         (w, h))
    try:
        for i in range(n_frames):
            img = np.clip(base + rng.normal(0, 4, (h, w, 3)), 0,
                          255).astype(np.uint8)
            cv2.ellipse(img, (cx, cy), (width // 2, int(width * 0.6)),
                        0, 0, 360, (150, 170, 210), -1)
            # eyes (static) — visual anchors inside the crop
            for ex in (cx - width // 5, cx + width // 5):
                cv2.circle(img, (ex, cy - width // 5), width // 14,
                           (60, 50, 40), -1)
            # mouth: height follows the audio envelope
            mh = max(2, int(width * (0.02 + 0.12 * opens[i])))
            cv2.ellipse(img, (cx, cy + width // 4), (width // 5, mh),
                        0, 0, 360, (60, 60, 150), -1)
            cv2.ellipse(img, (cx, cy + width // 4),
                        (width // 5, max(1, mh // 3)),
                        0, 0, 360, (30, 25, 70), -1)
            vw.write(img)
    finally:
        vw.release()
    return wav_path


def crop_mouth(img: np.ndarray, lms: np.ndarray) -> np.ndarray:
    """Reference train-crop geometry (dataset/dataset.py:83-98) ->
    (160,160,3) uint8."""
    import cv2

    from calipsync_tpu.vision.geometry import mouth_bbox_train

    x0, y0, x1, y1 = mouth_bbox_train(lms)
    crop = cv2.resize(img[y0:y1, x0:x1], (168, 168),
                      interpolation=cv2.INTER_LINEAR)
    return np.ascontiguousarray(crop[4:164, 4:164])


def main():
    import jax
    import jax.numpy as jnp

    from calipsync_tpu.audio.hubert_pipeline import HubertFeatureExtractor
    from calipsync_tpu.audio.windows import batched_windows
    from calipsync_tpu.config import (CropConfig, InferConfig, MeshConfig,
                                      ModelConfig, PipelineConfig,
                                      TrainConfig)
    from calipsync_tpu.core import checkpoint as ckpt
    from calipsync_tpu.core.cache import enable_compile_cache
    from calipsync_tpu.eval import psnr, sync_metrics
    from calipsync_tpu.infer.synthesizer import FrameSynthesizer
    from calipsync_tpu.nn.hubert import HubertConfig, HubertModel
    from calipsync_tpu.nn.syncnet import SyncNet
    from calipsync_tpu.pipelines.all_pipeline import (
        clean_intermediate_data, clone_video_local)
    from calipsync_tpu.pipelines.inference import VideoStreamManager
    from calipsync_tpu.pipelines.step1_preprocess import TrainPreprocessor
    from calipsync_tpu.train.syncnet_trainer import train_sync_net
    from calipsync_tpu.train.trainer import build_model

    enable_compile_cache()
    seconds = float(os.environ.get("CLONE_SECONDS", "60"))
    hold_seconds = float(os.environ.get("CLONE_HOLD_SECONDS", "8"))
    res = int(os.environ.get("CLONE_RES", "480"))
    epochs = int(os.environ.get("CLONE_EPOCHS", "20"))
    batch = int(os.environ.get("CLONE_BATCH", "16"))
    sync_epochs = int(os.environ.get("CLONE_SYNC_EPOCHS", "5"))

    cfg = PipelineConfig(
        model=ModelConfig(),
        train=TrainConfig(batch_size=batch, epochs=epochs),
        infer=InferConfig(),
        mesh=MeshConfig())
    crop = CropConfig()

    out = {"seconds": seconds, "hold_seconds": hold_seconds, "res": res,
           "epochs": epochs, "batch": batch,
           "platform": jax.devices()[0].platform}

    hcfg = HubertConfig.large()
    hmodel = HubertModel(hcfg, dtype=jnp.bfloat16)
    hvars = jax.jit(hmodel.init)(jax.random.key(1),
                                 jnp.zeros((1, 32000), jnp.float32))
    extractor = HubertFeatureExtractor(hvars, hcfg, dtype=jnp.bfloat16)
    lip = FixedLipDetector(res)

    with tempfile.TemporaryDirectory() as tmp:
        train_video = os.path.join(tmp, "train.mp4")
        make_talking_video(train_video, res, seconds, seed=0)
        hold_video = os.path.join(tmp, "hold.mp4")
        hold_wav = make_talking_video(hold_video, res, hold_seconds,
                                      seed=99)

        # ---- the product flow: clone (step1 -> train -> step3) ----
        timings: dict = {}
        weights_path, model_id = clone_video_local(
            train_video, tmp, lip, extractor, cfg=cfg, cleanup=False,
            timings=timings)
        out["clone_timings"] = timings
        model_dir = os.path.join(tmp, model_id)

        # ---- held-out generation PSNR (frames + audio never trained) --
        hold_dir = os.path.join(tmp, "holdout_data")
        TrainPreprocessor(lip, extractor, crop=crop).process_video(
            hold_video, hold_dir)

        from calipsync_tpu.data.dataset import ResidentLipSyncDataset

        model = build_model(cfg.model, axis_name=None)
        ds = ResidentLipSyncDataset(hold_dir)
        feats_dev = jnp.asarray(ds.audio_feats)
        y0, y1 = crop.mask_y, crop.mask_y + crop.mask_h
        x0, x1 = crop.mask_x, crop.mask_x + crop.mask_w
        size = crop.size

        @jax.jit
        def eval_fn(variables, store, idx, fidx, ex):
            real_u8 = jnp.take(store, fidx, axis=0).reshape(
                -1, size, size, 3)
            ref_u8 = jnp.take(store, ex, axis=0).reshape(-1, size, size, 3)
            real = real_u8.astype(jnp.float32) / 255.0
            masked = real.at[:, y0:y1, x0:x1, :].set(0.0)
            imgs = jnp.concatenate(
                [ref_u8.astype(jnp.float32) / 255.0, masked], axis=-1)
            audio = batched_windows(feats_dev, idx, mode=model.mode)
            pred = model.apply(variables, imgs, audio, train=False)
            return pred.astype(jnp.float32), real

        n_eval = min(len(ds) - 1, 128)
        e_idx = np.arange(n_eval, dtype=np.int32)
        e_fidx = np.minimum(e_idx, ds.n_frames - 1).astype(np.int32)
        e_ex = ((e_fidx + 31) % ds.n_frames).astype(np.int32)
        rect = np.zeros((size, size), bool)
        rect[y0:y1, x0:x1] = True

        def measure(variables):
            pred, real = eval_fn(variables, ds.store_dev,
                                 jnp.asarray(e_idx), jnp.asarray(e_fidx),
                                 jnp.asarray(e_ex))
            p = np.clip(np.asarray(pred), 0.0, 1.0)
            r = np.asarray(real)
            return {"psnr_full": round(psnr(p, r, 1.0), 2),
                    "psnr_mouth_rect": round(
                        psnr(p[:, rect], r[:, rect], 1.0), 2)}

        from calipsync_tpu.cli import load_generator_variables

        # weights_path is the step_N dir itself; the loader wants the
        # checkpoint root (it resolves the latest step_*), as cmd_infer
        # passes it
        trained = load_generator_variables(
            os.path.dirname(weights_path), cfg)
        init_vars = jax.jit(model.init)(  # the pre-training baseline
            jax.random.key(cfg.train.seed),
            jnp.zeros((1, 160, 160, 6)), jnp.zeros((1, 32, 32, 32)))
        out["holdout_before"] = measure(init_vars)
        out["holdout_after"] = measure(trained)
        out["holdout_mouth_rect_gain_db"] = round(
            out["holdout_after"]["psnr_mouth_rect"]
            - out["holdout_before"]["psnr_mouth_rect"], 2)

        # ---- offline inference on the held-out audio ----
        infer_dir = os.path.join(model_dir, "infer_data")
        synth = FrameSynthesizer(trained, infer_dir, model=model,
                                 batch_size=cfg.infer.batch_size,
                                 crop=crop, seed=0,
                                 transfer_format=cfg.infer.transfer_format)
        mgr = VideoStreamManager(synth, extractor, fps=FPS)
        out_mp4 = os.path.join(tmp, "avatar.mp4")
        t0 = time.time()
        r = mgr.process_single_file(hold_wav, out_mp4)
        infer_s = time.time() - t0
        out["infer"] = {"frames": r["frames"],
                        "wall_s": round(infer_s, 2),
                        "fps": round(r["frames"] / infer_s, 1),
                        "ttff_s": r["ttff_s"]}
        out["cold_start_to_avatar_s"] = round(
            timings["total_s"] + infer_s, 2)
        # second pass: the same call with the jit programs warm — the
        # steady-state serving rate a production process sees (the first
        # pass above pays the one-time per-shape compiles; the persistent
        # cache makes later processes start warm too)
        t0 = time.time()
        r2 = mgr.process_single_file(hold_wav, out_mp4)
        warm_s = time.time() - t0
        out["infer_warm"] = {"frames": r2["frames"],
                             "wall_s": round(warm_s, 2),
                             "fps": round(r2["frames"] / warm_s, 1),
                             "ttff_s": r2["ttff_s"]}

        # ---- speaker-trained SyncNet -> LSE-C/D of the produced video --
        sync_dir = os.path.join(tmp, "syncnet")
        last = None
        for last in train_sync_net(sync_dir, model_dir, mode="hubert",
                                   batch_size=batch, epochs=sync_epochs):
            pass
        out["syncnet"] = {"epochs": sync_epochs,
                          "final_epoch_loss": round(float(last[4]), 4)}
        snet = SyncNet(mode="hubert")
        svars = jax.jit(snet.init)(jax.random.key(0),
                                   jnp.zeros((1, 160, 160, 3)),
                                   jnp.zeros((1, 32, 32, 32)))
        svars = ckpt.restore_checkpoint(os.path.join(sync_dir, "best"),
                                        svars)

        import cv2

        def video_crops(path):
            cap = cv2.VideoCapture(path)
            crops = []
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                crops.append(crop_mouth(frame, lip.lms))
            cap.release()
            return np.stack(crops)

        hold_feats = extractor.extract_from_file(hold_wav)
        produced = video_crops(out_mp4)
        n = min(len(produced), len(hold_feats))
        out["sync_produced"] = sync_metrics(
            svars, produced[:n], hold_feats[:n])
        original = video_crops(hold_video)
        n0 = min(len(original), len(hold_feats))
        out["sync_original_ceiling"] = sync_metrics(
            svars, original[:n0], hold_feats[:n0])

        clean_intermediate_data(model_dir)  # product cleanup proven too

    path = os.environ.get("CLONE_OUT", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CLONE_r04.json"))
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
