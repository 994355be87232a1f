"""SyncNet trainer: cosine-BCE contrastive training over step1 data.

Rebuild of /root/reference/module/syncnet.py:364-414 as a jitted JAX loop:
per-epoch checkpointing with the reference's best-loss bookkeeping — save
best when epoch loss improves; after 3 non-improving epochs ("3 strikes")
swap the current weights in as the new best (:396-413). Yields per-batch
progress tuples like the reference's generator-style trainer.
"""

from __future__ import annotations

import os
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from calipsync_tpu.audio.windows import batched_windows
from calipsync_tpu.core import checkpoint as ckpt
from calipsync_tpu.nn.syncnet import SyncNet, cosine_bce_loss
from calipsync_tpu.vision.geometry import load_landmarks, mouth_bbox_train


class SyncNetDataset:
    """Positive (face, audio-window) pairs over a step1 directory
    (reference syncnet.py:15-108; labels are all ones as there)."""

    def __init__(self, dataset_dir: str, mode: str = "hubert"):
        import cv2

        img_dir = os.path.join(dataset_dir, "full_body_img")
        n = len([f for f in os.listdir(img_dir) if f.endswith(".jpg")])
        self.img_paths = [os.path.join(img_dir, f"{i}.jpg")
                          for i in range(n)]
        self.lms_paths = [os.path.join(dataset_dir, "landmarks", f"{i}.lms")
                          for i in range(n)]
        feat = "aud_hu.npy" if mode == "hubert" else "aud_wenet.npy"
        self.audio_feats = np.load(
            os.path.join(dataset_dir, feat)).astype(np.float32)
        self.mode = mode
        self._cv2 = cv2

    def __len__(self) -> int:
        return self.audio_feats.shape[0] - 1

    def face(self, idx: int) -> np.ndarray:
        cv2 = self._cv2
        fidx = min(idx, len(self.img_paths) - 1)
        img = cv2.imread(self.img_paths[fidx])
        lms = load_landmarks(self.lms_paths[fidx])
        x0, y0, x1, y1 = mouth_bbox_train(lms)
        crop = cv2.resize(img[y0:y1, x0:x1], (168, 168),
                          interpolation=cv2.INTER_LINEAR)
        return np.ascontiguousarray(crop[4:164, 4:164])

    def batch(self, idxs: np.ndarray) -> dict:
        faces = np.stack([self.face(int(i)) for i in idxs])
        return {"face": faces, "index": idxs.astype(np.int32)}


def train_sync_net(save_dir: str, dataset_dir: str, mode: str = "hubert",
                   batch_size: int = 16, lr: float = 1e-3,
                   epochs: int = 40, base_last_model: Optional[str] = None,
                   seed: int = 0) -> Iterator[tuple]:
    """Generator yielding (batch_idx, total, epoch, epochs, loss, best,
    elapsed_s) per batch — the reference's train_sync_net is likewise a
    per-batch progress generator (module/syncnet.py:364-414)."""
    os.makedirs(save_dir, exist_ok=True)
    model = SyncNet(mode=mode)
    ds = SyncNetDataset(dataset_dir, mode)
    feats = jnp.asarray(ds.audio_feats)

    audio_shape = ((1, 32, 32, 32) if mode == "hubert"
                   else (1, 16, 32, 256))
    variables = jax.jit(model.init)(jax.random.key(seed),
                                    jnp.zeros((1, 160, 160, 3)),
                                    jnp.zeros(audio_shape))
    if base_last_model and os.path.isdir(base_last_model):
        variables = ckpt.restore_checkpoint(base_last_model, variables)

    tx = optax.adam(lr)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, face_u8, idx):
        audio = batched_windows(feats, idx, mode=mode)
        face = face_u8.astype(jnp.float32) / 255.0
        y = jnp.ones((face.shape[0],), jnp.float32)

        def loss_fn(p):
            (a, f), upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, face, audio,
                train=True, mutable=["batch_stats"])
            return cosine_bce_loss(a, f, y), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats, opt_state,
                loss)

    params = variables["params"]
    batch_stats = variables["batch_stats"]
    rng = np.random.default_rng(seed)
    best_loss = float("inf")
    strikes = 0
    n_batches = -(-len(ds) // batch_size)

    for e in range(epochs):
        start = time.time()
        order = rng.permutation(len(ds))
        epoch_loss = 0.0
        for bi in range(n_batches):
            idxs = order[bi * batch_size:(bi + 1) * batch_size]
            batch = ds.batch(idxs)
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state,
                jnp.asarray(batch["face"]), jnp.asarray(batch["index"]))
            epoch_loss += float(loss)
            if bi == n_batches - 1:
                tree = {"params": params, "batch_stats": batch_stats}
                if epoch_loss <= best_loss:
                    strikes = 0
                    best_loss = epoch_loss
                    ckpt.save_checkpoint(
                        os.path.join(save_dir, "best"), e + 1, tree)
                else:
                    strikes += 1
                if strikes >= 3:  # reference's 3-strikes swap (:405-411)
                    ckpt.save_checkpoint(
                        os.path.join(save_dir, "best"), e + 1, tree)
                    best_loss = epoch_loss
                    strikes = 0
                ckpt.save_checkpoint(
                    os.path.join(save_dir, "last"), e + 1, tree)
            yield (bi, n_batches, e, epochs, epoch_loss, best_loss,
                   time.time() - start)
