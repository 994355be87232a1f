"""Torch-trained vs TPU-trained A/B on identical data (VERDICT r4 #7).

The composed SERVING path is pixel-proven against the reference
(PARITY_r02.json) and the train step is equality-tested stage-wise —
but no artifact compared the training loops as PRODUCTS: same data,
same init, same batch order -> do the loss trajectories and the
resulting generators agree? This tool runs both:

- **torch side**: the reference's training recipe re-executed with its
  own UNet class (imported read-only from /root/reference/module/unet.py)
  — Adam(lr=1e-3), L1 + 0.1 x MSE on VGG conv3_3 features, train-mode
  BN (reference step2_train_unet.py:38-138). torchvision is absent, so
  the VGG trunk is rebuilt as the same configuration-E Sequential
  [conv..conv3_3] the reference slices, with shared random weights.
- **jax side**: this repo's make_train_step on a 1-device mesh, fed
  the SAME cached sample arrays in the same order, starting from the
  SAME init (two-way bridge core/weights_export.export_generator, the
  torch model loads it strict=True), with the same random VGG via
  import_vgg19_features.

Reports per-step loss trajectories, their max/mean absolute deltas,
and a held-out generation comparison: PSNR of each framework's output
vs ground truth plus cross-PSNR between the two outputs.

CPU-torch budget-bounded: ~100-200 steps at batch 2 (VERDICT's
"hundreds of steps, not 20 epochs"). Writes TRAIN_AB_r05.json
(TRAIN_AB_OUT env overrides).

Env: AB_SECONDS (clip length, default 20), AB_STEPS (default 120),
AB_BATCH (default 2), AB_RES (default 480).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from clone_proof import (FixedLipDetector,  # noqa: E402
                         make_talking_video)

REFERENCE = "/root/reference"


def audio_window(feats: np.ndarray, idx: int) -> np.ndarray:
    """Reference get_audio_features (dataset/dataset.py:39-56): rows
    [idx-8, idx+8) of (T, 2, 1024), zero-padded at the edges, reshaped
    to (32, 32, 32)."""
    t = feats.shape[0]
    lo, hi = idx - 8, idx + 8
    pad_l, pad_r = max(0, -lo), max(0, hi - t)
    win = feats[max(0, lo):min(t, hi)]
    if pad_l or pad_r:
        win = np.pad(win, ((pad_l, pad_r), (0, 0), (0, 0)))
    return win.reshape(32, 32, 32).astype(np.float32)


def build_torch_vgg_trunk(seed: int):
    """Configuration-E prefix [conv1_1 .. conv3_3] as the reference's
    PerceptualLoss slices it (pre-activation conv3_3 tap), randomly
    initialized; returns (module, features.*-style state_dict)."""
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    cfg = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
           (10, 128, 256), (12, 256, 256), (14, 256, 256)]
    layers = []
    for idx, cin, cout in cfg:
        while len(layers) < idx:
            # fill with the ReLU/MaxPool the walk skipped
            layers.append(nn.MaxPool2d(2) if len(layers) in (4, 9)
                          else nn.ReLU(inplace=False))
        layers.append(nn.Conv2d(cin, cout, 3, padding=1))
    trunk = nn.Sequential(*layers)  # ends at features[14] == conv3_3
    # (the reference's contentFunc breaks after adding layer 14 — the
    # conv3_3 Conv2d itself, pre-activation; step2_train_unet.py:13-24)
    sd = {f"features.{i}.{k}": v.detach().clone()
          for i, m in enumerate(trunk) if isinstance(m, nn.Conv2d)
          for k, v in m.state_dict().items()}
    return trunk.eval(), sd


def main():
    import torch

    import jax
    import jax.numpy as jnp

    from calipsync_tpu.audio.hubert_pipeline import HubertFeatureExtractor
    from calipsync_tpu.config import ModelConfig, TrainConfig
    from calipsync_tpu.core.cache import enable_compile_cache
    from calipsync_tpu.core.mesh import make_mesh, replicate, shard_batch
    from calipsync_tpu.core.weights_export import export_generator
    from calipsync_tpu.data.dataset import LipSyncDataset
    from calipsync_tpu.eval import psnr
    from calipsync_tpu.nn.hubert import HubertConfig, HubertModel
    from calipsync_tpu.nn.vgg import import_vgg19_features
    from calipsync_tpu.pipelines.step1_preprocess import TrainPreprocessor
    from calipsync_tpu.train.trainer import (adam, build_model,
                                             create_train_state,
                                             make_train_step)

    enable_compile_cache()
    seconds = float(os.environ.get("AB_SECONDS", "20"))
    steps = int(os.environ.get("AB_STEPS", "120"))
    batch = int(os.environ.get("AB_BATCH", "2"))
    res = int(os.environ.get("AB_RES", "480"))

    sys.path.insert(0, REFERENCE)
    from module.unet import Model as RefModel  # read-only import

    out = {"seconds": seconds, "steps": steps, "batch": batch,
           "platform": jax.devices()[0].platform}

    # ---- shared data: one synthetic speaker, one step1 pass ---------
    hcfg = HubertConfig.large()
    hmodel = HubertModel(hcfg, dtype=jnp.bfloat16)
    hvars = jax.jit(hmodel.init)(jax.random.key(1),
                                 jnp.zeros((1, 32000), jnp.float32))
    extractor = HubertFeatureExtractor(hvars, hcfg, dtype=jnp.bfloat16)

    with tempfile.TemporaryDirectory() as tmp:
        video = os.path.join(tmp, "train.mp4")
        make_talking_video(video, res, seconds, seed=0)
        data_dir = os.path.join(tmp, "speaker")
        TrainPreprocessor(FixedLipDetector(res), extractor).process_video(
            video, data_dir)

        ds = LipSyncDataset(data_dir)
        feats = ds.audio_feats  # (T, 2, 1024) fp32

        # pre-draw every sample ONCE; both frameworks consume the same
        # uint8 arrays in the same order (the reference's DataLoader
        # shuffles with torch RNG, ours with numpy — fixing the draw
        # here removes sampling noise from the comparison)
        rng = np.random.default_rng(7)
        order = []
        n = len(ds)
        for s in range(steps):
            idxs = rng.choice(n, size=batch, replace=False)
            order.append([ds.sample(int(i), rng) for i in idxs])

        n_hold = 8
        hold = [ds.sample(int(i), np.random.default_rng(1000 + i))
                for i in np.linspace(0, n - 1, n_hold).astype(int)]

        # ---- shared init + shared random VGG ------------------------
        model = build_model(ModelConfig(dtype="float32"), axis_name=None)
        train_cfg = TrainConfig(batch_size=batch, lr=1e-3,
                                perceptual_weight=0.1,
                                sync_batchnorm=False)
        tx = adam(train_cfg)
        state = create_train_state(model, tx, jax.random.key(0))
        init_sd = export_generator(
            {"params": state.params, "batch_stats": state.batch_stats},
            mode="hubert")
        vgg_trunk, vgg_sd = build_torch_vgg_trunk(seed=3)
        vgg_vars = import_vgg19_features(
            {k: v.numpy() for k, v in vgg_sd.items()})

        # ---- torch side: the reference recipe -----------------------
        tmodel = RefModel(6, "hubert")
        tmodel.load_state_dict(
            {k: torch.from_numpy(np.asarray(v)) for k, v in
             init_sd.items()}, strict=True)
        tmodel.train()
        opt = torch.optim.Adam(tmodel.parameters(), lr=1e-3)
        l1 = torch.nn.L1Loss()
        mse = torch.nn.MSELoss()
        for p in vgg_trunk.parameters():
            p.requires_grad_(False)

        def to_torch_batch(samples):
            imgs = np.stack([np.concatenate(
                [s["ref"], s["masked"]], axis=-1) for s in samples])
            tgt = np.stack([s["target"] for s in samples])
            aud = np.stack([audio_window(feats, int(s["index"]))
                            for s in samples])
            imgs = torch.from_numpy(
                imgs.transpose(0, 3, 1, 2).astype(np.float32) / 255.0)
            tgt = torch.from_numpy(
                tgt.transpose(0, 3, 1, 2).astype(np.float32) / 255.0)
            return imgs, tgt, torch.from_numpy(aud)

        torch_losses = []
        t0 = time.time()
        for samples in order:
            imgs, tgt, aud = to_torch_batch(samples)
            preds = tmodel(imgs, aud)
            with torch.no_grad():
                feat_tgt = vgg_trunk(tgt)
            loss = l1(preds, tgt) + 0.1 * mse(vgg_trunk(preds), feat_tgt)
            opt.zero_grad(set_to_none=True)
            loss.backward()
            opt.step()
            torch_losses.append(float(loss.item()))
        out["torch_wall_s"] = round(time.time() - t0, 2)

        # ---- jax side: this repo's step, same batches ---------------
        mesh = make_mesh(data=1)
        step_fn = make_train_step(model, tx, mesh, train_cfg)
        state = replicate(state, mesh)
        vgg_rep = replicate(vgg_vars, mesh)
        feats_dev = jnp.asarray(feats)

        def to_jax_batch(samples):
            return shard_batch({
                "ref": np.stack([s["ref"] for s in samples]),
                "masked": np.stack([s["masked"] for s in samples]),
                "target": np.stack([s["target"] for s in samples]),
                "index": np.asarray([s["index"] for s in samples],
                                    np.int32)}, mesh)

        jax_losses = []
        t0 = time.time()
        for samples in order:
            state, metrics = step_fn(state, to_jax_batch(samples),
                                     feats_dev, vgg_rep)
            jax_losses.append(float(metrics["loss"]))
        out["jax_wall_s"] = round(time.time() - t0, 2)

        a = np.asarray(torch_losses)
        b = np.asarray(jax_losses)
        d = np.abs(a - b)
        out["trajectory"] = {
            "steps": steps,
            "torch_first_last": [round(float(a[0]), 6),
                                 round(float(a[-1]), 6)],
            "jax_first_last": [round(float(b[0]), 6),
                               round(float(b[-1]), 6)],
            "max_abs_delta": float(d.max()),
            "mean_abs_delta": float(d.mean()),
            "mean_loss": float(a.mean()),
            "max_rel_delta": float((d / np.maximum(a, 1e-9)).max()),
            "first10_max_abs_delta": float(d[:10].max()),
        }
        out["torch_losses"] = [round(float(x), 6) for x in a]
        out["jax_losses"] = [round(float(x), 6) for x in b]

        # ---- held-out generation comparison -------------------------
        tmodel.eval()
        himgs = np.stack([np.concatenate([s["ref"], s["masked"]], -1)
                          for s in hold])
        htgt = np.stack([s["target"] for s in hold]).astype(
            np.float32) / 255.0
        haud = np.stack([audio_window(feats, int(s["index"]))
                         for s in hold])
        with torch.no_grad():
            tpred = tmodel(
                torch.from_numpy(himgs.transpose(0, 3, 1, 2).astype(
                    np.float32) / 255.0),
                torch.from_numpy(haud)).numpy().transpose(0, 2, 3, 1)
        params_host = jax.device_get(
            jax.tree.map(lambda x: x, state.params))
        stats_host = jax.device_get(state.batch_stats)
        # the reference window layout is channels-FIRST (torch); our
        # model takes it channels-last — same convention as the export
        # parity test (tests/test_weights_export.py:79-89)
        jpred = np.asarray(model.apply(
            {"params": params_host, "batch_stats": stats_host},
            jnp.asarray(himgs.astype(np.float32) / 255.0),
            jnp.asarray(haud.transpose(0, 2, 3, 1)), train=False))
        out["holdout"] = {
            "n": n_hold,
            "psnr_torch_vs_gt": round(psnr(tpred, htgt, 1.0), 2),
            "psnr_jax_vs_gt": round(psnr(jpred, htgt, 1.0), 2),
            "psnr_cross": round(psnr(jpred, tpred, 1.0), 2),
        }

    path = os.environ.get("TRAIN_AB_OUT", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TRAIN_AB_r05.json"))
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
        f.write("\n")
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("torch_losses", "jax_losses")}))


if __name__ == "__main__":
    main()
