"""Training throughput A/B on the real TPU: resident vs host data path.

Builds a synthetic step1 speaker (full-body frames + landmarks + feature
rows), then measures steady-state samples/s of the DP train step fed by
(a) the device-resident crop store (index vectors only) and
(b) the host batch_iterator (JPEG decode + crop per sample, prefetch 2).

Env: TRAIN_BATCH (default 16), TRAIN_STEPS (default 30), TRAIN_FRAMES
(default 250), TRAIN_RES (default 720), TRAIN_VGG=0 to drop the
perceptual term.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_step1_assets(root: str, n_frames: int, res: int) -> str:
    from bench import make_synthetic_speaker  # structured, jpeg-friendly

    infer = make_synthetic_speaker(root, n_frames=n_frames, res=res)
    # re-lay as step1 output: full_body_img/{i}.jpg + landmarks/{i}.lms
    out = os.path.join(root, "step1")
    os.makedirs(os.path.join(out, "full_body_img"), exist_ok=True)
    os.makedirs(os.path.join(out, "landmarks"), exist_ok=True)
    for i in range(n_frames):
        n = str(i).zfill(6)
        os.replace(os.path.join(infer, "frames", f"{n}.jpg"),
                   os.path.join(out, "full_body_img", f"{i}.jpg"))
        lms = np.loadtxt(os.path.join(infer, "positions", f"{n}.txt"))
        np.savetxt(os.path.join(out, "landmarks", f"{i}.lms"), lms)
    feats = np.random.default_rng(0).standard_normal(
        (n_frames, 2, 1024)).astype(np.float32)
    np.save(os.path.join(out, "aud_hu.npy"), feats)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from calipsync_tpu.config import ModelConfig, TrainConfig
    from calipsync_tpu.core.cache import enable_compile_cache
    from calipsync_tpu.core.mesh import make_mesh, replicate, shard_batch
    from calipsync_tpu.data.dataset import (LipSyncDataset, Prefetcher,
                                            ResidentLipSyncDataset,
                                            batch_iterator)
    from calipsync_tpu.nn.vgg import VGG19Features
    from calipsync_tpu.profiling import device_sync
    from calipsync_tpu.train.trainer import (adam, build_model,
                                             create_train_state,
                                             make_resident_train_step,
                                             make_train_step)

    enable_compile_cache()
    batch = int(os.environ.get("TRAIN_BATCH", "16"))
    steps = int(os.environ.get("TRAIN_STEPS", "30"))
    n_frames = int(os.environ.get("TRAIN_FRAMES", "250"))
    res = int(os.environ.get("TRAIN_RES", "720"))
    use_vgg = os.environ.get("TRAIN_VGG", "1") == "1"
    dtype = os.environ.get("TRAIN_DTYPE", "float32")

    mesh = make_mesh()
    model_cfg = ModelConfig(dtype=dtype)
    train_cfg = TrainConfig(batch_size=batch)
    model = build_model(model_cfg, axis_name="data")
    tx = adam(train_cfg)
    vgg_vars = replicate(jax.jit(VGG19Features().init)(
        jax.random.key(1), jnp.zeros((1, 160, 160, 3))), mesh)

    out = {"batch": batch, "steps": steps, "n_frames": n_frames,
           "res": res, "vgg": use_vgg, "dtype": dtype}
    with tempfile.TemporaryDirectory() as tmp:
        data_dir = make_step1_assets(tmp, n_frames, res)

        # --- resident path ---
        res_ds = ResidentLipSyncDataset(data_dir, mesh=mesh)
        feats = replicate(jnp.asarray(res_ds.audio_feats), mesh)
        fn = make_resident_train_step(model, tx, mesh, train_cfg,
                                      use_perceptual=use_vgg)
        state = replicate(create_train_state(
            model, tx, jax.random.key(0)), mesh)
        rng = np.random.default_rng(0)

        def res_batches():
            while True:
                yield from res_ds.epoch_indices(batch, rng)

        it = res_batches()
        idx, fidx, ex = next(it)
        state, m = fn(state, res_ds.store_dev, jnp.asarray(idx),
                      jnp.asarray(fidx), jnp.asarray(ex), feats, vgg_vars)
        device_sync(m["loss"])  # compile + warm
        t0 = time.time()
        for _ in range(steps):
            idx, fidx, ex = next(it)
            state, m = fn(state, res_ds.store_dev, jnp.asarray(idx),
                          jnp.asarray(fidx), jnp.asarray(ex), feats,
                          vgg_vars)
        device_sync(m["loss"])
        out["resident_samples_per_s"] = round(
            steps * batch / (time.time() - t0), 1)

        # --- host path ---
        host_ds = LipSyncDataset(data_dir)
        fn = make_train_step(model, tx, mesh, train_cfg,
                             use_perceptual=use_vgg)
        state = replicate(create_train_state(
            model, tx, jax.random.key(0)), mesh)
        rng = np.random.default_rng(0)

        def host_batches():
            while True:
                yield from batch_iterator(host_ds, batch, rng,
                                          drop_last=True)

        pre = Prefetcher(host_batches(), depth=2,
                         put_fn=lambda b: shard_batch(b, mesh))
        state, m = fn(state, next(pre), feats, vgg_vars)
        device_sync(m["loss"])
        t0 = time.time()
        for _ in range(steps):
            state, m = fn(state, next(pre), feats, vgg_vars)
        device_sync(m["loss"])
        out["host_samples_per_s"] = round(
            steps * batch / (time.time() - t0), 1)

    out["speedup"] = round(out["resident_samples_per_s"]
                           / max(out["host_samples_per_s"], 1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
