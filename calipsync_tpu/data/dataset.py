"""Training dataset over step1 preprocessor output.

Equivalent of the reference's MyDataset (/root/reference/dataset/dataset.py)
re-designed for a TPU input pipeline:

  - Host workers only decode JPEGs and produce uint8 160x160 crops
    (reference, masked, target) via the exact geometry in
    calipsync_tpu/vision/geometry.py. No float math on host.
  - Audio windows are NOT materialized per sample: the full (T, 2, 1024)
    HuBERT feature array lives on device once, and the train step gathers
    each sample's +-8 window on device (audio/windows.batched_windows).
    Per step the host ships 3 uint8 crops + one int32 index per sample.
  - The random reference frame is drawn from all indices != idx with an
    explicit numpy Generator (reproducible PRNG threading; reference uses
    global np.random at dataset/dataset.py:141-146).

Layout consumed (produced by pipelines/step1_preprocess.py, identical to the
reference's): ``{dir}/full_body_img/{i}.jpg``, ``{dir}/landmarks/{i}.lms``,
``{dir}/aud_hu.npy`` (or ``aud_wenet.npy``).
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import queue
import threading
from typing import Iterator

import cv2
import numpy as np

from calipsync_tpu.config import CropConfig
from calipsync_tpu.vision.geometry import load_landmarks, train_pair_uint8


class LipSyncDataset:
    """Index-addressable view of a step1 output directory."""

    def __init__(self, data_dir: str, mode: str = "hubert",
                 crop: CropConfig = CropConfig()):
        self.data_dir = data_dir
        self.mode = mode
        self.crop = crop
        img_dir = os.path.join(data_dir, "full_body_img")
        n_frames = len([f for f in os.listdir(img_dir) if f.endswith(".jpg")])
        self.img_paths = [os.path.join(img_dir, f"{i}.jpg")
                          for i in range(n_frames)]
        self.lms_paths = [os.path.join(data_dir, "landmarks", f"{i}.lms")
                          for i in range(n_frames)]
        feat_file = "aud_hu.npy" if mode == "hubert" else "aud_wenet.npy"
        self.audio_feats = np.load(
            os.path.join(data_dir, feat_file)).astype(np.float32)

    def __len__(self) -> int:
        # reference: one sample per audio row minus one (dataset.py:37)
        return self.audio_feats.shape[0] - 1

    def _frame_idx(self, idx: int) -> int:
        return min(idx, len(self.img_paths) - 1)

    def sample(self, idx: int, rng: np.random.Generator) -> dict:
        """One training sample: uint8 crops + audio row index."""
        fidx = self._frame_idx(idx)
        ex = int(rng.integers(0, len(self) - 1))
        if ex >= idx:  # uniform over {0..len-2} \ {idx}, matching setdiff1d
            ex += 1
        ex = self._frame_idx(ex)

        img = cv2.imread(self.img_paths[fidx])
        img_ex = cv2.imread(self.img_paths[ex])
        lms = load_landmarks(self.lms_paths[fidx])
        lms_ex = load_landmarks(self.lms_paths[ex])
        ref, masked, target = train_pair_uint8(img, lms, img_ex, lms_ex,
                                               self.crop)
        return {"ref": ref, "masked": masked, "target": target,
                "index": np.int32(idx)}


def batch_iterator(dataset: LipSyncDataset, batch_size: int,
                   rng: np.random.Generator, shuffle: bool = True,
                   drop_last: bool = False,
                   num_workers: int = 4) -> Iterator[dict]:
    """One epoch of stacked-numpy batches, decoded by a thread pool."""
    order = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(order)
    # Pre-draw per-sample RNGs so worker scheduling can't change the stream.
    seeds = rng.integers(0, 2**63 - 1, size=len(order))

    with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
        for start in range(0, len(order), batch_size):
            idxs = order[start:start + batch_size]
            if drop_last and len(idxs) < batch_size:
                return
            futs = [pool.submit(dataset.sample, int(i),
                                np.random.default_rng(int(s)))
                    for i, s in zip(idxs, seeds[start:start + len(idxs)])]
            samples = [f.result() for f in futs]
            yield {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class Prefetcher:
    """Background-thread batch prefetch with a bounded queue.

    Decouples host decode from device compute so the TPU step never waits on
    JPEG decode (the reference is decode-bound; SURVEY.md section 7 (5)).
    Device transfer happens in the consumer via a caller-supplied put_fn
    (e.g. mesh.shard_batch) so sharding stays explicit.
    """

    def __init__(self, it: Iterator[dict], depth: int = 2,
                 put_fn=None):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._put_fn = put_fn
        self._stop = threading.Event()
        self._it = it
        self._thread = threading.Thread(target=self._run, args=(it,),
                                        daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        """Bounded put that gives up when close() is requested, so the
        thread can never leak blocked on a full queue."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                pass
        return False

    def _run(self, it):
        try:
            for item in it:
                if self._stop.is_set():
                    return
                if self._put_fn is not None:
                    item = self._put_fn(item)
                if not self._put(item):
                    return
            self._put(None)
        except BaseException as e:  # surface worker errors to consumer
            self._put(e)

    def close(self) -> None:
        """Stop the prefetch thread and wait for it to exit.

        Call this BEFORE releasing a resource the wrapped iterator reads
        from (e.g. a cv2.VideoCapture owned by a generator) — otherwise
        the daemon thread may still be inside the read when the resource
        dies, or leak blocked on the bounded queue (ADVICE r2)."""
        self._stop.set()
        while self._thread.is_alive():
            try:  # drain so a blocked put can observe the stop flag
                self._q.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=0.05)
        # The thread has exited: safe to close a generator so its
        # ``finally`` (capture release, pool shutdown) runs now.
        close_it = getattr(self._it, "close", None)
        if close_it is not None:
            try:
                close_it()
            except Exception:
                pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item


class ResidentLipSyncDataset:
    """Device-resident training data: the whole speaker in HBM.

    The training pair decomposes into per-frame DETERMINISTIC crops —
    ref = crop160(random ex), masked = rect-zeroed crop160(idx),
    target = crop160(idx) — so each frame is decoded exactly ONCE, its
    160x160 crop stored flat (76.8 KB/frame; a 5-minute speaker is
    ~0.6 GB) in device HBM, and a train step receives only three int32
    index vectors. Masking and /255 normalization fuse into the jitted
    step (train/trainer.make_resident_train_step). This removes the
    host JPEG-decode bottleneck the reference has (SURVEY.md section 7
    hard part (5): "the TPU never starves") — the streaming
    LipSyncDataset remains for datasets larger than HBM.

    Sampling semantics are IDENTICAL to LipSyncDataset.sample: one
    sample per audio row minus one, frame index clamped to the frame
    count, ex uniform over {0..len-2} shifted past idx (the reference's
    setdiff1d draw, dataset/dataset.py:141-146).
    """

    def __init__(self, data_dir: str, mode: str = "hubert",
                 crop: CropConfig = CropConfig(), mesh=None,
                 num_workers: int = 4):
        from calipsync_tpu.vision.geometry import (center_160,
                                                    crop_resize_168,
                                                    mouth_bbox_train)

        base = LipSyncDataset(data_dir, mode, crop)
        self.audio_feats = base.audio_feats
        self._len = len(base)
        self.n_frames = len(base.img_paths)

        def crop160(i: int) -> np.ndarray:
            img = cv2.imread(base.img_paths[i])
            lms = load_landmarks(base.lms_paths[i])
            x0, y0, x1, y1 = mouth_bbox_train(lms)
            return center_160(crop_resize_168(img, y0, y1, x0, x1, crop),
                              crop).reshape(-1)

        with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
            store = np.stack(list(pool.map(crop160, range(self.n_frames))))
        import jax

        if mesh is not None:
            from calipsync_tpu.core.mesh import replicate

            self.store_dev = replicate(store, mesh)
        else:
            self.store_dev = jax.device_put(store)

    def __len__(self) -> int:
        return self._len

    def epoch_indices(self, batch_size: int, rng: np.random.Generator,
                      shuffle: bool = True, drop_last: bool = True
                      ) -> Iterator[tuple]:
        """Yield (index, fidx, ex) int32 arrays per batch — audio row,
        clamped frame index, and the random reference frame, drawn with
        the same per-sample streams as batch_iterator."""
        order = np.arange(len(self))
        if shuffle:
            rng.shuffle(order)
        seeds = rng.integers(0, 2**63 - 1, size=len(order))
        last_frame = self.n_frames - 1
        for start in range(0, len(order), batch_size):
            idxs = order[start:start + batch_size]
            if drop_last and len(idxs) < batch_size:
                return
            fidx = np.minimum(idxs, last_frame)
            ex = np.empty_like(idxs)
            for j, (i, s) in enumerate(
                    zip(idxs, seeds[start:start + len(idxs)])):
                r = np.random.default_rng(int(s))
                e = int(r.integers(0, len(self) - 1))
                if e >= i:
                    e += 1
                ex[j] = min(e, last_frame)
            yield (idxs.astype(np.int32), fidx.astype(np.int32),
                   ex.astype(np.int32))
