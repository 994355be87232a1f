"""End-to-end lip-sync throughput benchmark (one TPU chip).

Measures the full serving path — disk frame load, host crop/mask prep,
jitted generator forward, paste-back compositing — over a synthetic speaker
directory, and prints one JSON line:

    {"metric": "lipsync_fps_per_chip", "value": N, "unit": "frames/s",
     "vs_baseline": N / 250}

Baseline: the driver target of 250 fps/chip (10x real-time at 25 fps,
BASELINE.md). Env knobs: BENCH_BATCH (default 32), BENCH_DTYPE
(bfloat16|float32, default bfloat16), BENCH_FRAMES (default 1024),
BENCH_RES (source video resolution, default 480).
"""

import json
import os
import tempfile
import time

import numpy as np


def make_synthetic_speaker(root: str, n_frames: int = 40,
                           res: int = 480) -> str:
    import cv2

    infer = os.path.join(root, "infer_data")
    for d in ("frames", "positions", "lips_jpg", "masks"):
        os.makedirs(os.path.join(infer, d), exist_ok=True)
    rng = np.random.default_rng(42)
    for i in range(n_frames):
        img = rng.integers(0, 256, (res, res, 3)).astype(np.uint8)
        n = str(i).zfill(6)
        cv2.imwrite(os.path.join(infer, "frames", f"{n}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        lms = np.zeros((110, 2), np.int64)
        xmin = res // 4 + int(rng.integers(-8, 8))
        width = res // 3 + int(rng.integers(-10, 10))
        ymin = res // 2 + int(rng.integers(-8, 8))
        cx, cy = xmin + width // 2, ymin + width // 2
        theta = np.linspace(0, 2 * np.pi, 33, endpoint=False)
        lms[:33, 0] = (cx + 0.45 * width * np.cos(theta)).astype(np.int64)
        lms[:33, 1] = (cy + 0.45 * width * np.sin(theta)).astype(np.int64)
        lms[33:] = rng.integers(xmin, xmin + width, (77, 2))
        lms[1] = (xmin, cy)
        lms[31] = (xmin + width, cy)
        lms[52] = (cx, ymin)
        np.savetxt(os.path.join(infer, "positions", f"{n}.txt"), lms)
    return infer


def main() -> None:
    import jax
    import jax.numpy as jnp

    from calipsync_tpu.core.cache import enable_compile_cache
    from calipsync_tpu.infer.synthesizer import FrameSynthesizer
    from calipsync_tpu.nn.unet import Generator

    enable_compile_cache()

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        os.environ.get("BENCH_DTYPE", "bfloat16")]
    n_features = int(os.environ.get("BENCH_FRAMES", "1024"))
    res = int(os.environ.get("BENCH_RES", "480"))

    model = Generator(dtype=dtype)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 160, 160, 6)),
                                    jnp.zeros((1, 32, 32, 32)))

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((n_features, 2, 1024)).astype(np.float32)

    with tempfile.TemporaryDirectory() as tmp:
        data_dir = make_synthetic_speaker(tmp, res=res)
        depth = int(os.environ.get("BENCH_DEPTH", "6"))
        synth = FrameSynthesizer(variables, data_dir, model=model,
                                 batch_size=batch, seed=0,
                                 pipeline_depth=depth)

        # warmup: compile + executable load + frame caches, on exactly the
        # measured shapes (two passes — the first execution after a compile
        # is slow on this runtime)
        for _ in range(2):
            for _ in synth.iterate_synthesized_frames(feats):
                pass

        t0 = time.time()
        n = 0
        for _ in synth.iterate_synthesized_frames(feats):
            n += 1
        dt = time.time() - t0

    fps = n / dt
    print(json.dumps({"metric": "lipsync_fps_per_chip",
                      "value": round(fps, 2), "unit": "frames/s",
                      "vs_baseline": round(fps / 250.0, 3)}))


if __name__ == "__main__":
    main()
