"""Concurrent-stream capacity on the real TPU.

Drives MultiStreamSynthesizer with N streams of 1-second (25-frame)
windows per tick — the streaming manager's cadence — and reports the
aggregate fps and how many realtime (25 fps) streams one chip sustains,
for both transfer formats.

Env: MS_BATCH (default 128), MS_STREAMS (default 16), MS_TICKS (8),
MS_RES (480).
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

    from calipsync_tpu.core.cache import enable_compile_cache
    from calipsync_tpu.nn.unet import Generator
    from calipsync_tpu.serve.multi_stream import MultiStreamSynthesizer

    enable_compile_cache()
    batch = int(os.environ.get("MS_BATCH", "128"))
    n_streams = int(os.environ.get("MS_STREAMS", "16"))
    ticks = int(os.environ.get("MS_TICKS", "8"))
    res = int(os.environ.get("MS_RES", "480"))
    window = 25  # 1 s of frames per stream per tick

    model = Generator(dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 160, 160, 6)),
                                    jnp.zeros((1, 32, 32, 32)))
    rng = np.random.default_rng(0)
    out = {"n_streams": n_streams, "window_frames": window,
           "batch": batch}

    with tempfile.TemporaryDirectory() as tmp:
        data_dir = make_synthetic_speaker(tmp, res=res)
        for fmt in ("yuv420", "bgr"):
            ms = MultiStreamSynthesizer(variables, [data_dir],
                                        model=model, batch_size=batch,
                                        transfer_format=fmt)
            for i in range(n_streams):
                ms.add_stream(f"s{i}", speaker=0, seed=i)
            reqs = {f"s{i}": rng.standard_normal(
                        (window, 2, 1024)).astype(np.float32)
                    for i in range(n_streams)}
            ms.synthesize_windows(reqs)  # compile + warm
            t0 = time.time()
            frames = 0
            for _ in range(ticks):
                res_t = ms.synthesize_windows(reqs)
                frames += sum(len(v) for v in res_t.values())
            dt = time.time() - t0
            fps = frames / dt
            out[f"{fmt}_aggregate_fps"] = round(fps, 1)
            out[f"{fmt}_realtime_streams"] = round(fps / 25.0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
