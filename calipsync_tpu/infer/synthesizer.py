"""FrameSynthesizer: batched lip-sync frame generation + paste-back.

TPU-native rebuild of the reference serving core
(/root/reference/image_infer_v1/tools/frame_synthesizer/infer_api.py:12-456):

  - "Motion generalization" ping-pong walk over physical frames (random
    5-15%-of-total segments, direction flips at clip ends) with an explicit
    numpy Generator instead of global random state.
  - Threaded batch frame loading (frames/positions/masks from the step3
    layout) overlapped with TPU compute via a one-batch pipeline.
  - The UNet forward runs jitted at a fixed batch size (short tails are
    padded) — one compiled shape for the whole stream; normalization,
    6-channel concat, audio-window gather and uint8 quantization all happen
    on device.
  - Paste-back compositing (fillPoly face polygon -> area-proportional
    dilate -> optional XSeg-mask blend -> alpha composite) is uint8 host
    work, pixel-matching the reference.

Per-stage wall timers and an end-of-run FPS line mirror the reference's
time_stats instrumentation.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from calipsync_tpu.audio.windows import batched_windows
from calipsync_tpu.config import CropConfig
from calipsync_tpu.nn.unet import Generator
from calipsync_tpu.vision.geometry import (CropParams, mouth_bbox_infer)


def make_generate_fn(model: Generator):
    """Jitted end-to-end device step: uint8 crops -> uint8 mouth frames.

    fn(variables, ref_u8 (B,160,160,3), masked_u8 (B,160,160,3),
       audio_feats (T,2,1024), indices (B,)) -> (B,160,160,3) uint8
    """
    @jax.jit
    def fn(variables, ref_u8, masked_u8, audio_feats, indices):
        dtype = model.dtype or jnp.float32
        imgs = jnp.concatenate([ref_u8, masked_u8], axis=-1)
        imgs = imgs.astype(dtype) / 255.0
        audio = batched_windows(audio_feats, indices).astype(dtype)
        pred = model.apply(variables, imgs, audio, train=False)
        # reference quantization: float*255 -> uint8 C-cast (truncation)
        return (pred * 255.0).astype(jnp.uint8)

    return fn


class PingPongSequencer:
    """Physical-frame walk (reference _generate_frame_sequence:147-190)."""

    def __init__(self, total_frames: int, rng: np.random.Generator,
                 min_pct: int = 5, max_pct: int = 15):
        self.total_frames = total_frames
        self.rng = rng
        self.min_pct = min_pct
        self.max_pct = max_pct
        self.direction: Optional[int] = None
        self.target = 0
        self.processed = 0
        self.position = 0

    def next(self, needed: int) -> list[int]:
        seq: list[int] = []
        if self.processed >= self.target or self.direction is None:
            pct = int(self.rng.integers(self.min_pct, self.max_pct + 1))
            self.target = self.total_frames * pct // 100
            self.direction = int(self.rng.choice([1, -1]))
            self.processed = 0
        while len(seq) < needed:
            seq.append(self.position)
            self.position += self.direction
            if self.position >= self.total_frames:
                self.position = self.total_frames - 2
                self.direction = -1
            elif self.position < 0:
                self.position = 1
                self.direction = 1
        self.processed += len(seq)
        return seq


class FrameSynthesizer:
    def __init__(self, variables: dict, data_dir: str,
                 model: Optional[Generator] = None, batch_size: int = 8,
                 crop: CropConfig = CropConfig(),
                 seed: Optional[int] = None):
        """
        Args:
          variables: generator {'params','batch_stats'} (imported or trained)
          data_dir: step3 ``infer_data`` directory (frames/positions/masks)
          model: Generator module (default: bf16-free fp32 hubert model)
          batch_size: device batch; tails are padded to it
        """
        self.data_dir = data_dir
        self.batch_size = batch_size
        self.crop = crop
        self.frames_dir = os.path.join(data_dir, "frames")
        self.positions_dir = os.path.join(data_dir, "positions")
        self.masks_dir = os.path.join(data_dir, "masks")
        self.total_frames = len([f for f in os.listdir(self.frames_dir)
                                 if f.endswith(".jpg")])
        self.model = model or Generator()
        self.variables = variables
        self._generate = make_generate_fn(self.model)
        self.executor = ThreadPoolExecutor(max_workers=batch_size)
        self.sequencer = PingPongSequencer(
            self.total_frames, np.random.default_rng(seed))
        self.last_logical_index = -1

    # ---------------- data loading ----------------

    def _load_single_frame(self, frame_idx: int):
        n = str(frame_idx % self.total_frames).zfill(6)
        img = cv2.imread(os.path.join(self.frames_dir, f"{n}.jpg"))
        lms = np.loadtxt(os.path.join(self.positions_dir, f"{n}.txt"))
        mask_path = os.path.join(self.masks_dir, f"{n}.jpg")
        mask = None
        if os.path.exists(mask_path):
            m = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
            if m is not None:
                mask = m.astype(np.float32) / 255.0
        return img, lms, mask

    def _load_batch_frames(self, frame_indices):
        futures = [self.executor.submit(self._load_single_frame, i)
                   for i in frame_indices]
        imgs, lms, masks = [], [], []
        for f in futures:
            i, l, m = f.result()
            imgs.append(i)
            lms.append(l)
            masks.append(m)
        return imgs, lms, masks

    # ---------------- synthesis ----------------

    def _prepare_inputs(self, batch_images, batch_landmarks):
        """Host crop/mask prep. Returns (ref_u8, masked_u8, frame_meta)."""
        cfg = self.crop
        n = len(batch_images)
        ref_u8 = np.zeros((self.batch_size, cfg.size, cfg.size, 3), np.uint8)
        masked_u8 = np.zeros_like(ref_u8)
        meta = []
        for i in range(n):
            img = batch_images[i]
            lms = batch_landmarks[i]
            h, w = img.shape[:2]
            p = mouth_bbox_infer(lms, h, w)
            crop_img = cv2.resize(img[p.ymin:p.ymax, p.xmin:p.xmax],
                                  (cfg.resize, cfg.resize))
            m = cfg.margin
            real = crop_img[m:cfg.resize - m, m:cfg.resize - m]
            ref_u8[i] = real
            masked = real.copy()
            masked[cfg.mask_y:cfg.mask_y + cfg.mask_h,
                   cfg.mask_x:cfg.mask_x + cfg.mask_w] = 0
            masked_u8[i] = masked
            meta.append({"img": img, "lms": lms, "params": p,
                         "crop168": crop_img})
        return ref_u8, masked_u8, meta

    def _paste_back(self, pred_u8: np.ndarray, meta: dict) -> np.ndarray:
        """Composite one generated mouth into its full frame (reference
        process_batch:263-349, pixel-exact incl. the uint8 truncation)."""
        cfg = self.crop
        img = meta["img"]
        lms = meta["lms"]
        p: CropParams = meta["params"]
        crop_img = meta["crop168"].copy()
        mask = meta.get("xseg_mask")

        m = cfg.margin
        crop_img[m:cfg.resize - m, m:cfg.resize - m] = pred_u8
        crop_img = cv2.resize(crop_img, (p.width, p.width))

        face_mask = np.zeros((p.ymax - p.ymin, p.xmax - p.xmin), np.uint8)
        pts = np.asarray(lms[:33], dtype=np.float64).copy()
        pts[:, 0] -= p.xmin
        pts[:, 1] -= p.ymin
        pts[:, 0] *= p.width / (p.xmax - p.xmin)
        pts[:, 1] *= p.width / (p.ymax - p.ymin)
        cv2.fillPoly(face_mask, [pts.astype(np.int32)], 255)

        area = np.sum(face_mask > 0)
        radius = np.sqrt(area / np.pi)
        expand = max(1, int(radius * 0.15))
        kernel = np.ones((expand * 2 + 1, expand * 2 + 1), np.uint8)
        face_mask = cv2.dilate(face_mask, kernel, iterations=1)

        fm3 = np.repeat((face_mask / 255.0)[..., None], 3, axis=2)

        target = img[p.ymin:p.ymax, p.xmin:p.xmax]
        if crop_img.shape != target.shape:
            return img  # reference's shape-mismatch fallback (:317-324)
        if mask is not None:
            rm = cv2.resize(mask, (crop_img.shape[1], crop_img.shape[0]))
            fm3 = fm3 * np.repeat(rm[..., None], 3, axis=2)
        result = crop_img * fm3 + target * (1.0 - fm3)
        img[p.ymin:p.ymax, p.xmin:p.xmax] = result  # uint8 trunc-cast
        return img

    def process_batch(self, batch_images, batch_landmarks, batch_masks,
                      feature_indices, audio_feats_dev) -> list[np.ndarray]:
        """One device batch end-to-end; returns full composited frames."""
        try:
            n = len(batch_images)
            ref_u8, masked_u8, meta = self._prepare_inputs(
                batch_images, batch_landmarks)
            for md, xm in zip(meta, batch_masks):
                md["xseg_mask"] = xm
            idx = np.zeros((self.batch_size,), np.int32)
            idx[:n] = feature_indices
            preds = self._generate(self.variables, jnp.asarray(ref_u8),
                                   jnp.asarray(masked_u8), audio_feats_dev,
                                   jnp.asarray(idx))
            preds = np.asarray(preds[:n])
            out = []
            for i in range(n):
                try:
                    out.append(self._paste_back(preds[i], meta[i]))
                except Exception:
                    out.append(batch_images[i])  # per-frame fallback
            return out
        except Exception as e:  # batch-level fallback (reference :352-357)
            print(f"frame batch processing failed: {e}")
            return batch_images

    def iterate_synthesized_frames(
            self, features: np.ndarray, start_frame_idx: int = 0,
            is_generate_sync_frame: bool = True) -> Iterator[Dict]:
        """Yield {'frame','index','physical_index'} dicts for each output
        frame driven by the HuBERT features (reference :359-451)."""
        self.last_logical_index = start_frame_idx - 1
        stats = {"load_frame": 0.0, "get_audio": 0.0, "process_batch": 0.0}
        total = len(features)
        feats_dev = jnp.asarray(np.ascontiguousarray(features,
                                                     dtype=np.float32))
        try:
            for start in range(0, total, self.batch_size):
                end = min(start + self.batch_size, total)
                seq = self.sequencer.next(end - start)

                t0 = time.time()
                imgs, lms, masks = self._load_batch_frames(seq)
                stats["load_frame"] += time.time() - t0

                if not is_generate_sync_frame:
                    for i, orig in enumerate(imgs):
                        self.last_logical_index += 1
                        yield {"frame": orig,
                               "index": self.last_logical_index,
                               "physical_index": seq[i]}
                    continue

                t0 = time.time()
                frames = self.process_batch(imgs, lms, masks,
                                            list(range(start, end)),
                                            feats_dev)
                stats["process_batch"] += time.time() - t0

                for i, frame in enumerate(frames):
                    self.last_logical_index += 1
                    yield {"frame": frame,
                           "index": self.last_logical_index,
                           "physical_index": seq[i]}
        finally:
            t = sum(stats.values())
            if t > 0:
                print(f"synthesis: {total / t:.2f} fps "
                      f"(load {stats['load_frame']:.2f}s, "
                      f"generate+paste {stats['process_batch']:.2f}s)")

    def __del__(self):
        if hasattr(self, "executor"):
            self.executor.shutdown(wait=False)
