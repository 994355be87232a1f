"""Preprocessing throughput: S3FD detect + PFLD landmarks on real frames.

Measures the step1/step3 perception path (the reference is decode+detect
bound on CPU; here detection runs batched under jit on the TPU) in
frames/s over a synthetic speaker, including JPEG decode on the host.

Env: PRE_BATCH (default 16), PRE_FRAMES (default 128), PRE_RES (720).
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
    import cv2
    import jax
    import jax.numpy as jnp

    from bench import make_synthetic_speaker

    from calipsync_tpu.core.cache import enable_compile_cache
    from calipsync_tpu.nn.pfld import PFLDGhostOne, fold_mobileone_params
    from calipsync_tpu.nn.s3fd import S3FDBackbone, S3FDDetector
    from calipsync_tpu.vision.lip_detector import LipDetector

    enable_compile_cache()
    batch = int(os.environ.get("PRE_BATCH", "16"))
    n_frames = int(os.environ.get("PRE_FRAMES", "128"))
    res = int(os.environ.get("PRE_RES", "720"))

    s3fd_vars = jax.jit(S3FDBackbone().init)(
        jax.random.key(0), jnp.zeros((1, 256, 256, 3)))
    pfld_train = jax.jit(PFLDGhostOne().init)(
        jax.random.key(1), jnp.zeros((1, 192, 192, 3)))
    pfld_vars = fold_mobileone_params(pfld_train)
    lip = LipDetector(pfld_vars, np.zeros((220,), np.float32),
                      S3FDDetector(s3fd_vars, scale=0.25))

    from calipsync_tpu.pipelines.step3_prepare import InferPreprocessor

    with tempfile.TemporaryDirectory() as tmp:
        d = make_synthetic_speaker(tmp, n_frames=n_frames, res=1280,
                                   res_w=res)
        # real mp4 so the bench drives the PRODUCTION process_video loop
        # (decode-ahead prefetch + batched detection)
        video = os.path.join(tmp, "speaker.mp4")
        vw = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                             (res, 1280))
        for i in range(n_frames):
            vw.write(cv2.imread(os.path.join(
                d, "frames", f"{str(i).zfill(6)}.jpg")))
        vw.release()

        pre = InferPreprocessor(lip, batch_size=batch)
        out_dir = os.path.join(tmp, "warm")
        pre.process_video(video, out_dir)  # warm compile

        t0 = time.time()
        result = pre.process_video(video, os.path.join(tmp, "out"))
        dt = time.time() - t0
    print(json.dumps({"preprocess_fps": round(n_frames / dt, 1),
                      "processed": result["processed_frames"],
                      "n_frames": n_frames,
                      "res": f"1280x{res}", "batch": batch}))


if __name__ == "__main__":
    main()
