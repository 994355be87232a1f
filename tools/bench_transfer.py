"""Interleaved A/B of transfer formats on the real TPU.

The tunnel's bandwidth drifts minute to minute, so back-to-back single
measurements of 'bgr' vs 'yuv420' mostly measure the tunnel's mood.
This alternates short passes A,B,A,B,... and reports per-format medians,
plus a raw d2h bandwidth probe for context.
"""

import json
import os
import statistics
import sys
import tempfile
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import make_synthetic_speaker

    from calipsync_tpu.core.cache import enable_compile_cache
    from calipsync_tpu.infer.synthesizer import FrameSynthesizer
    from calipsync_tpu.nn.unet import Generator

    enable_compile_cache()
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    n_features = int(os.environ.get("BENCH_FRAMES", "512"))
    rounds = int(os.environ.get("AB_ROUNDS", "5"))

    model = Generator(dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 160, 160, 6)),
                                    jnp.zeros((1, 32, 32, 32)))
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((n_features, 2, 1024)).astype(np.float32)

    # raw d2h probe: a jitted identity producing a FRESH device array per
    # rep (np.asarray on the same jax.Array is cached after the first
    # fetch and would measure nothing)
    def d2h_probe(nbytes, reps=4):
        arr = jax.device_put(np.zeros((nbytes,), np.uint8))
        bump = jax.jit(lambda x: x + 1)
        np.asarray(bump(arr))
        t0 = time.time()
        for _ in range(reps):
            np.asarray(bump(arr))
        return nbytes * reps / (time.time() - t0) / 1e6

    with tempfile.TemporaryDirectory() as tmp:
        data_dir = make_synthetic_speaker(tmp, res=480)
        synths = {
            fmt: FrameSynthesizer(variables, data_dir, model=model,
                                  batch_size=batch, seed=0,
                                  pipeline_depth=6, transfer_format=fmt)
            for fmt in ("bgr", "yuv420")}
        for s in synths.values():  # compile + warm both first
            for _ in s.iterate_synthesized_frames(feats):
                pass
        results = {fmt: [] for fmt in synths}
        for r in range(rounds):
            for fmt, s in synths.items():
                t0 = time.time()
                n = sum(1 for _ in s.iterate_synthesized_frames(feats))
                results[fmt].append(n / (time.time() - t0))
            print(json.dumps({"round": r,
                              **{f: round(results[f][-1], 1)
                                 for f in results}}))
        out = {f"{fmt}_fps_median": round(statistics.median(v), 2)
               for fmt, v in results.items()}
        out["d2h_MBps_10MB"] = round(d2h_probe(10 << 20), 1)
        out["d2h_MBps_5MB"] = round(d2h_probe(5 << 20), 1)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
