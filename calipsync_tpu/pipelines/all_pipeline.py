"""End-to-end clone orchestrator: video -> finetuned per-speaker model.

Rebuild of /root/reference/all_pipeline.py:11-120: step1 (training data) ->
step2 (finetune) -> step3 (inference assets) -> cleanup of intermediates,
under a uuid model directory. Returns (checkpoint path, model id).
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from typing import Optional

from calipsync_tpu.config import PipelineConfig


def clean_intermediate_data(model_dir: str) -> None:
    """Remove training-only intermediates, keep weights + infer assets
    (reference :11-32)."""
    for d in ("full_body_img", "landmarks", "faces"):
        p = os.path.join(model_dir, d)
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
    for f in ("aud.wav", "aud_hu.npy"):
        p = os.path.join(model_dir, f)
        if os.path.isfile(p):
            os.remove(p)


def clone_video_local(video_path: str, output_base_dir: str,
                      lip_detector, hubert_extractor,
                      vgg_path: Optional[str] = None,
                      unet_checkpoint: Optional[str] = None,
                      cfg: PipelineConfig = PipelineConfig(),
                      cleanup: bool = True,
                      xseg_model_path: Optional[str] = None,
                      timings: Optional[dict] = None
                      ) -> tuple[str, str]:
    """Full clone flow. Returns (weights_path, model_id).

    xseg_model_path: optional xseg.onnx — step3 then writes per-frame
    compositing masks (reference all_pipeline.py takes the same path and
    ships the generator disabled).

    timings: optional dict filled with per-stage wall seconds
    ({'step1_s','step2_s','step3_s','total_s'}) — the cold-start-to-avatar
    accounting tools/clone_proof.py records."""
    from calipsync_tpu.pipelines.step1_preprocess import TrainPreprocessor
    from calipsync_tpu.pipelines.step2_train import train_digital_model
    from calipsync_tpu.pipelines.step3_prepare import InferPreprocessor

    model_id = str(uuid.uuid4())
    model_dir = os.path.join(output_base_dir, model_id)
    os.makedirs(model_dir, exist_ok=True)
    t_start = t0 = time.perf_counter()

    def mark(key):
        nonlocal t0
        now = time.perf_counter()
        if timings is not None:
            timings[key] = round(now - t0, 2)
        t0 = now

    step1 = TrainPreprocessor(lip_detector, hubert_extractor,
                              crop=cfg.crop)
    step1.process_video(video_path, model_dir)
    mark("step1_s")

    weights_dir = os.path.join(model_dir, "weights")
    weights_path = train_digital_model(model_dir, weights_dir,
                                       vgg_path=vgg_path,
                                       unet_checkpoint=unet_checkpoint,
                                       cfg=cfg)
    mark("step2_s")

    mask_gen = None
    if xseg_model_path:
        from calipsync_tpu.vision.xseg import XSegMaskGenerator

        mask_gen = XSegMaskGenerator(model_path=xseg_model_path)
    step3 = InferPreprocessor(lip_detector, mask_generator=mask_gen)
    step3.process_video(video_path, model_dir)
    mark("step3_s")

    if cleanup:
        clean_intermediate_data(model_dir)
    if timings is not None:
        timings["total_s"] = round(time.perf_counter() - t_start, 2)
    return weights_path, model_id
