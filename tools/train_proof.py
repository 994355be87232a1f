"""Learning proof on the real TPU: overfit a synthetic speaker, record PSNR.

The reference demonstrably trains usable models (step2_train_unet.py:38-138);
our suite only asserts loss decreases over a few steps. This tool closes the
gap with an artifact: train the generator several hundred steps on the
device-resident path, then measure generation PSNR against the target crops
on a fixed eval set, before vs after.

The masked input hands the model every pixel OUTSIDE the mouth rectangle, so
the quantity that proves learning is PSNR INSIDE the rect (the region the
model must synthesize from audio + reference). We record full-crop and
in-rect PSNR at init and after training, plus throughput.

Writes TRAIN_r03.json at the repo root (or TRAIN_OUT env) and prints it.

Env: TRAIN_STEPS (default 500), TRAIN_BATCH (default 32), TRAIN_FRAMES
(default 250), TRAIN_RES (default 720), TRAIN_EVAL (default 64 samples).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def main():
    import jax
    import jax.numpy as jnp

    from calipsync_tpu.audio.windows import batched_windows
    from calipsync_tpu.config import CropConfig, ModelConfig, TrainConfig
    from calipsync_tpu.core.cache import enable_compile_cache
    from calipsync_tpu.core.mesh import make_mesh, replicate
    from calipsync_tpu.data.dataset import ResidentLipSyncDataset
    from calipsync_tpu.nn.vgg import VGG19Features
    from calipsync_tpu.profiling import device_sync
    from calipsync_tpu.train.trainer import (adam, build_model,
                                             create_train_state,
                                             make_resident_multi_step)
    from tools.bench_train import make_step1_assets

    enable_compile_cache()
    steps = int(os.environ.get("TRAIN_STEPS", "500"))
    batch = int(os.environ.get("TRAIN_BATCH", "32"))
    n_frames = int(os.environ.get("TRAIN_FRAMES", "250"))
    res = int(os.environ.get("TRAIN_RES", "720"))
    n_eval = int(os.environ.get("TRAIN_EVAL", "64"))
    dtype = os.environ.get("TRAIN_DTYPE", "float32")

    mesh = make_mesh()
    crop = CropConfig()
    model_cfg = ModelConfig(dtype=dtype)
    train_cfg = TrainConfig(batch_size=batch)
    model = build_model(model_cfg, axis_name="data")
    tx = adam(train_cfg)
    vgg_vars = replicate(jax.jit(VGG19Features().init)(
        jax.random.key(1), jnp.zeros((1, 160, 160, 3))), mesh)

    y0, y1 = crop.mask_y, crop.mask_y + crop.mask_h
    x0, x1 = crop.mask_x, crop.mask_x + crop.mask_w
    size = crop.size

    @jax.jit
    def eval_fn(variables, store, idx, fidx, ex, audio_feats):
        """Mirror of the resident step's input build + train=False fwd."""
        real_u8 = jnp.take(store, fidx, axis=0).reshape(-1, size, size, 3)
        ref_u8 = jnp.take(store, ex, axis=0).reshape(-1, size, size, 3)
        real = real_u8.astype(jnp.float32) / 255.0
        masked = real.at[:, y0:y1, x0:x1, :].set(0.0)
        imgs = jnp.concatenate([ref_u8.astype(jnp.float32) / 255.0, masked],
                               axis=-1)
        audio = batched_windows(audio_feats, idx, mode=model.mode)
        pred = model.apply(variables, imgs, audio, train=False)
        return pred.astype(jnp.float32), real

    with tempfile.TemporaryDirectory() as tmp:
        data_dir = make_step1_assets(tmp, n_frames, res)
        ds = ResidentLipSyncDataset(data_dir, mesh=mesh)
        feats = replicate(jnp.asarray(ds.audio_feats), mesh)
        fn = make_resident_multi_step(model, tx, mesh, train_cfg)
        state = replicate(create_train_state(model, tx, jax.random.key(0)),
                          mesh)

        # fixed eval set: deterministic idx/fidx/ex so before/after compare
        # the same generation task
        e_idx = np.arange(n_eval, dtype=np.int32) % (len(ds) - 1)
        e_fidx = np.minimum(e_idx, ds.n_frames - 1).astype(np.int32)
        e_ex = ((e_fidx + 7) % ds.n_frames).astype(np.int32)

        def measure(st):
            variables = {"params": st.params, "batch_stats": st.batch_stats}
            pred, real = eval_fn(variables, ds.store_dev,
                                 jnp.asarray(e_idx), jnp.asarray(e_fidx),
                                 jnp.asarray(e_ex), feats)
            p = np.clip(np.asarray(pred), 0.0, 1.0)
            r = np.asarray(real)
            m = np.zeros((size, size), bool)
            m[y0:y1, x0:x1] = True
            return {
                "psnr_full": round(psnr(p, r), 2),
                "psnr_mouth_rect": round(psnr(p[:, m], r[:, m]), 2),
                "psnr_outside_rect": round(psnr(p[:, ~m], r[:, ~m]), 2),
            }

        before = measure(state)

        rng = np.random.default_rng(0)

        def batches():
            while True:
                yield from ds.epoch_indices(batch, rng)

        it = batches()
        k = min(25, steps)
        n_blocks = max(steps // k, 1)
        steps = n_blocks * k
        blocks = np.stack([np.stack(next(it))
                           for _ in range(n_blocks * k)])
        blocks = blocks.reshape(n_blocks, k, 3, batch)

        # block 0 compiles + runs (untimed); remaining blocks are timed
        # steady-state: one dispatch per k steps.
        state, m = fn(state, ds.store_dev, jnp.asarray(blocks[0, :, 0]),
                      jnp.asarray(blocks[0, :, 1]),
                      jnp.asarray(blocks[0, :, 2]), feats, vgg_vars)
        device_sync(m["loss"])
        loss_first = float(m["loss"][0])
        loss_last = float(m["loss"][-1])
        t0 = time.time()
        for b in range(1, n_blocks):
            state, m = fn(state, ds.store_dev,
                          jnp.asarray(blocks[b, :, 0]),
                          jnp.asarray(blocks[b, :, 1]),
                          jnp.asarray(blocks[b, :, 2]), feats, vgg_vars)
        device_sync(m["loss"])
        dt = max(time.time() - t0, 1e-9)
        loss_last = float(m["loss"][-1])
        timed_samples = (n_blocks - 1) * k * batch

        after = measure(state)

    out = {
        "steps": steps, "batch": batch, "n_frames": n_frames, "res": res,
        "n_eval": n_eval, "dtype": dtype,
        "loss_first": round(loss_first, 4), "loss_last": round(loss_last, 4),
        "before": before, "after": after,
        "mouth_rect_gain_db": round(after["psnr_mouth_rect"]
                                    - before["psnr_mouth_rect"], 2),
        "samples_per_s": round(timed_samples / dt, 1),
        "platform": jax.devices()[0].platform,
    }
    path = os.environ.get("TRAIN_OUT", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TRAIN_r03.json"))
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
