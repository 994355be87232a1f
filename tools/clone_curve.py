"""Clone quality curve: train-length x precision sweep (VERDICT r4 #4).

Answers three questions the round-4 clone proof left open:

1. **Where is the epochs knee?** CLONE_r04 trained 20 epochs fp32 with
   no curve showing whether that is saturated or far short.
2. **Does the bf16 recipe transfer to the product flow?**
   TRAIN_r04_bf16 proved bf16 reaches >= fp32 quality 1.82x faster on
   a synthetic fixture; here it must hold on the clone pipeline's own
   data and metrics.
3. **What explains the 0.9695-vs-0.99998 sync similarity gap?** The
   curve separates undertraining (similarity still rising with
   epochs) from a generation/fixture ceiling (similarity saturates
   below the original-video ceiling while mouth PSNR keeps rising).

Method: step1 runs ONCE; each sweep point trains from the same step1
output with its own (epochs, dtype); one speaker-trained SyncNet —
trained once on the shared step1 data — scores every point's produced
video (a fixed scorer keeps points comparable). Finally the
recommended recipe runs the REAL product flow (clone_video_local,
fresh step1/step3) for an honest cold-start-to-avatar number.

Writes CLONE_r05.json (CLONE_OUT env overrides).

Env: CURVE_SECONDS (default 60), CURVE_HOLD_SECONDS (8), CURVE_RES
(480), CURVE_BATCH (16), CURVE_SYNC_EPOCHS (5),
CURVE_POINTS (default "bfloat16:5,bfloat16:10,bfloat16:20,
bfloat16:40,float32:20"), CURVE_RECOMMEND (default "bfloat16:20").
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from clone_proof import (FPS, FixedLipDetector, crop_mouth,  # noqa: E402
                         make_talking_video)

DEFAULT_POINTS = ("bfloat16:5,bfloat16:10,bfloat16:20,bfloat16:40,"
                  "float32:20")


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
    from calipsync_tpu.data.dataset import ResidentLipSyncDataset
    from calipsync_tpu.eval import psnr, sync_metrics
    from calipsync_tpu.infer.synthesizer import FrameSynthesizer
    from calipsync_tpu.nn.hubert import HubertConfig, HubertModel
    from calipsync_tpu.nn.syncnet import SyncNet
    from calipsync_tpu.pipelines.all_pipeline import clone_video_local
    from calipsync_tpu.pipelines.inference import VideoStreamManager
    from calipsync_tpu.pipelines.step1_preprocess import TrainPreprocessor
    from calipsync_tpu.pipelines.step2_train import train_digital_model
    from calipsync_tpu.pipelines.step3_prepare import InferPreprocessor
    from calipsync_tpu.train.syncnet_trainer import train_sync_net
    from calipsync_tpu.train.trainer import build_model
    from calipsync_tpu.cli import load_generator_variables

    enable_compile_cache()
    seconds = float(os.environ.get("CURVE_SECONDS", "60"))
    hold_seconds = float(os.environ.get("CURVE_HOLD_SECONDS", "8"))
    res = int(os.environ.get("CURVE_RES", "480"))
    batch = int(os.environ.get("CURVE_BATCH", "16"))
    sync_epochs = int(os.environ.get("CURVE_SYNC_EPOCHS", "5"))
    points_env = os.environ.get("CURVE_POINTS", DEFAULT_POINTS)
    # CURVE_POINTS="" skips the sweep (recommended-recipe-only rerun)
    points = [(d, int(e)) for d, e in
              (p.split(":") for p in points_env.split(",") if p)]
    rec_dtype, rec_epochs = os.environ.get(
        "CURVE_RECOMMEND", "bfloat16:20").split(":")
    rec_epochs = int(rec_epochs)

    crop = CropConfig()
    out = {"seconds": seconds, "hold_seconds": hold_seconds, "res": res,
           "batch": batch, "platform": jax.devices()[0].platform,
           "points": []}

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

        # ---- shared step1 (train data) + step3 (serving assets) ------
        data_dir = os.path.join(tmp, "speaker")
        t0 = time.time()
        TrainPreprocessor(lip, extractor, crop=crop).process_video(
            train_video, data_dir)
        out["step1_s"] = round(time.time() - t0, 2)
        infer_root = os.path.join(tmp, "infer_assets")
        t0 = time.time()
        InferPreprocessor(lip).process_video(train_video, infer_root)
        out["step3_s"] = round(time.time() - t0, 2)
        infer_dir = os.path.join(infer_root, "infer_data")
        hold_dir = os.path.join(tmp, "holdout_data")
        TrainPreprocessor(lip, extractor, crop=crop).process_video(
            hold_video, hold_dir)

        # ---- the fixed scorer: one speaker-trained SyncNet -----------
        sync_dir = os.path.join(tmp, "syncnet")
        t0 = time.time()
        for _ in train_sync_net(sync_dir, data_dir, mode="hubert",
                                batch_size=batch, epochs=sync_epochs):
            pass
        out["syncnet_train_s"] = round(time.time() - t0, 2)
        snet = SyncNet(mode="hubert")
        svars = jax.jit(snet.init)(jax.random.key(0),
                                   jnp.zeros((1, 160, 160, 3)),
                                   jnp.zeros((1, 32, 32, 32)))
        svars = ckpt.restore_checkpoint(os.path.join(sync_dir, "best"),
                                        svars)
        hold_feats = extractor.extract_from_file(hold_wav)

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

        original = video_crops(hold_video)
        n0 = min(len(original), len(hold_feats))
        out["sync_original_ceiling"] = sync_metrics(
            svars, original[:n0], hold_feats[:n0])

        # ---- held-out PSNR evaluator (fp32 apply for every point:
        # params are always fp32; only the TRAINING compute dtype
        # varies across the sweep) ------------------------------------
        eval_model = build_model(ModelConfig(dtype="float32"),
                                 axis_name=None)
        ds = ResidentLipSyncDataset(hold_dir)
        feats_dev = jnp.asarray(ds.audio_feats)
        y0, y1 = crop.mask_y, crop.mask_y + crop.mask_h
        x0, x1 = crop.mask_x, crop.mask_x + crop.mask_w
        size = crop.size

        @jax.jit
        def eval_fn(variables, store, idx, fidx, ex):
            real_u8 = jnp.take(store, fidx, axis=0).reshape(
                -1, size, size, 3)
            ref_u8 = jnp.take(store, ex, axis=0).reshape(
                -1, size, size, 3)
            real = real_u8.astype(jnp.float32) / 255.0
            masked = real.at[:, y0:y1, x0:x1, :].set(0.0)
            imgs = jnp.concatenate(
                [ref_u8.astype(jnp.float32) / 255.0, masked], axis=-1)
            audio = batched_windows(feats_dev, idx, mode=eval_model.mode)
            pred = eval_model.apply(variables, imgs, audio, train=False)
            return pred.astype(jnp.float32), real

        n_eval = min(len(ds) - 1, 128)
        e_idx = np.arange(n_eval, dtype=np.int32)
        e_fidx = np.minimum(e_idx, ds.n_frames - 1).astype(np.int32)
        e_ex = ((e_fidx + 31) % ds.n_frames).astype(np.int32)
        rect = np.zeros((size, size), bool)
        rect[y0:y1, x0:x1] = True

        def measure_psnr(variables):
            pred, real = eval_fn(variables, ds.store_dev,
                                 jnp.asarray(e_idx), jnp.asarray(e_fidx),
                                 jnp.asarray(e_ex))
            p = np.clip(np.asarray(pred), 0.0, 1.0)
            r = np.asarray(real)
            return {"psnr_full": round(psnr(p, r, 1.0), 2),
                    "psnr_mouth_rect": round(
                        psnr(p[:, rect], r[:, rect], 1.0), 2)}

        init_vars = jax.jit(eval_model.init)(
            jax.random.key(0), jnp.zeros((1, 160, 160, 6)),
            jnp.zeros((1, 32, 32, 32)))
        out["holdout_before"] = measure_psnr(init_vars)

        # ---- the sweep ----------------------------------------------
        for dtype, epochs in points:
            tag = f"{dtype}_{epochs}ep"
            cfg = PipelineConfig(
                model=ModelConfig(dtype=dtype),
                train=TrainConfig(batch_size=batch, epochs=epochs),
                infer=InferConfig(), mesh=MeshConfig())
            save_dir = os.path.join(tmp, f"ckpt_{tag}")
            t0 = time.time()
            weights_path = train_digital_model(data_dir, save_dir,
                                               cfg=cfg)
            train_s = time.time() - t0
            trained = load_generator_variables(
                os.path.dirname(weights_path), cfg)

            synth = FrameSynthesizer(trained, infer_dir,
                                     model=eval_model,
                                     batch_size=cfg.infer.batch_size,
                                     crop=crop, seed=0,
                                     transfer_format="yuv420")
            mgr = VideoStreamManager(synth, extractor, fps=FPS)
            out_mp4 = os.path.join(tmp, f"avatar_{tag}.mp4")
            t0 = time.time()
            r = mgr.process_single_file(hold_wav, out_mp4)
            infer_s = time.time() - t0
            produced = video_crops(out_mp4)
            n = min(len(produced), len(hold_feats))
            point = {
                "dtype": dtype, "epochs": epochs,
                "train_wall_s": round(train_s, 2),
                "infer_wall_s": round(infer_s, 2),
                "holdout": measure_psnr(trained),
                "sync_produced": sync_metrics(svars, produced[:n],
                                              hold_feats[:n]),
            }
            point["mouth_rect_gain_db"] = round(
                point["holdout"]["psnr_mouth_rect"]
                - out["holdout_before"]["psnr_mouth_rect"], 2)
            out["points"].append(point)
            print(json.dumps(point), flush=True)

        # ---- gap diagnosis: similarity vs epochs trend ---------------
        sims = [(p["epochs"], p["sync_produced"]["sim_best"])
                for p in out["points"] if p["dtype"] == "bfloat16"]
        sims.sort()
        if len(sims) >= 2:
            rising = sims[-1][1] - sims[0][1]
            out["sync_gap_diagnosis"] = {
                "bf16_similarity_by_epochs": sims,
                "delta_first_to_last": round(rising, 4),
                "verdict": ("undertraining: similarity still rising"
                            if rising > 0.01 else
                            "generation/fixture ceiling: similarity "
                            "saturates below the original-video "
                            "ceiling while mouth PSNR rises"),
            }

        # ---- the recommended recipe through the REAL product flow ----
        rec_cfg = PipelineConfig(
            model=ModelConfig(dtype=rec_dtype),
            train=TrainConfig(batch_size=batch, epochs=rec_epochs),
            infer=InferConfig(), mesh=MeshConfig())
        timings: dict = {}
        t0 = time.time()
        weights_path, model_id = clone_video_local(
            train_video, tmp, lip, extractor, cfg=rec_cfg,
            cleanup=False, timings=timings)
        trained = load_generator_variables(
            os.path.dirname(weights_path), rec_cfg)
        model_dir = os.path.join(tmp, model_id)
        synth = FrameSynthesizer(trained,
                                 os.path.join(model_dir, "infer_data"),
                                 model=eval_model,
                                 batch_size=rec_cfg.infer.batch_size,
                                 crop=crop, seed=0,
                                 transfer_format="yuv420")
        mgr = VideoStreamManager(synth, extractor, fps=FPS)
        out_mp4 = os.path.join(tmp, "avatar_product.mp4")
        t1 = time.time()
        r = mgr.process_single_file(hold_wav, out_mp4)
        infer_s = time.time() - t1
        produced = video_crops(out_mp4)
        n = min(len(produced), len(hold_feats))
        out["recommended"] = {
            "dtype": rec_dtype, "epochs": rec_epochs,
            "clone_timings": timings,
            "cold_start_to_avatar_s": round(
                timings["total_s"] + infer_s, 2),
            "holdout": measure_psnr(trained),
            "sync_produced": sync_metrics(svars, produced[:n],
                                          hold_feats[:n]),
        }
        out["recommended"]["mouth_rect_gain_db"] = round(
            out["recommended"]["holdout"]["psnr_mouth_rect"]
            - out["holdout_before"]["psnr_mouth_rect"], 2)

    path = os.environ.get("CLONE_OUT", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CLONE_r05.json"))
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
