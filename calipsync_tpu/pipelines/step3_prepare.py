"""Step 3: video -> inference assets.

Rebuild of /root/reference/step3_prepare_infer_data.py:9-196. Output layout
consumed by infer/synthesizer.py:

    {out}/sample.jpg
    {out}/infer_data/frames/{i:06d}.jpg     (JPEG q95 full frames)
    {out}/infer_data/positions/{i:06d}.txt  (landmarks, float text)
    {out}/infer_data/lips_jpg/{i:06d}.jpg   (168x168 mouth crops)
    {out}/infer_data/masks/                 (XSeg masks; generation is a
        hook — the reference ships it disabled, :18,64)
    {out}/srt/                              (ASR slicing hook, disabled)
"""

from __future__ import annotations

import os

import cv2
import numpy as np


class InferPreprocessor:
    def __init__(self, lip_detector, batch_size: int = 32,
                 mask_generator=None, write_workers: int = 4,
                 pipeline_detect: bool = True):
        """mask_generator: optional callable (frame, landmarks) -> (168,168)
        float mask — the XSeg hook (reference generate_mask:28-89).
        pipeline_detect: run detection one batch ahead on its own thread
        (False = sequential, for A/B measurement)."""
        self.lip_detector = lip_detector
        self.batch_size = batch_size
        self.mask_generator = mask_generator
        self.write_workers = write_workers
        self.pipeline_detect = pipeline_detect

    def _process_batch(self, frames, indices, infer_dir: str,
                       pool=None) -> None:
        landmarks_list = self.lip_detector.detect_landmarks(frames)
        self._write_batch(landmarks_list, frames, indices, infer_dir,
                          pool=pool)

    def _write_batch(self, landmarks_list, frames, indices,
                     infer_dir: str, pool=None) -> None:
        from calipsync_tpu.vision.geometry import save_landmarks_txt

        def write(fn, *args):
            if pool is not None:
                pool.submit(fn, *args)
            else:
                fn(*args)

        for lms, idx, frame in zip(landmarks_list, indices, frames):
            if lms is None or len(lms) == 0:
                continue
            n = str(idx).zfill(6)
            write(cv2.imwrite, os.path.join(infer_dir, "frames",
                                            f"{n}.jpg"),
                  frame, [cv2.IMWRITE_JPEG_QUALITY, 95])
            save_landmarks_txt(os.path.join(infer_dir, "positions",
                                            f"{n}.txt"), lms[0])
            lm = lms[0]
            xmin, ymin = int(lm[1][0]), int(lm[52][1])
            xmax = int(lm[31][0])
            width = xmax - xmin
            mouth = frame[ymin:ymin + width, xmin:xmax]
            if mouth.size > 0:
                write(cv2.imwrite,
                      os.path.join(infer_dir, "lips_jpg", f"{n}.jpg"),
                      cv2.resize(mouth, (168, 168)))
            if self.mask_generator is not None:
                mask = self.mask_generator(frame, lm)
                write(cv2.imwrite,
                      os.path.join(infer_dir, "masks", f"{n}.jpg"),
                      (np.clip(mask, 0, 1) * 255).astype(np.uint8))

    def process_video(self, video_path: str, output_dir: str) -> dict:
        # detect_stride carry is only valid within one frame stream
        # (plug-in detectors without stride state need no reset)
        getattr(self.lip_detector, "reset_stride", lambda: None)()
        os.makedirs(output_dir, exist_ok=True)
        srt_dir = os.path.join(output_dir, "srt")
        os.makedirs(srt_dir, exist_ok=True)
        infer_dir = os.path.join(output_dir, "infer_data")
        for d in ("frames", "positions", "lips_jpg", "masks"):
            os.makedirs(os.path.join(infer_dir, d), exist_ok=True)

        cap = cv2.VideoCapture(video_path)
        ok, first = cap.read()
        if ok:
            cv2.imwrite(os.path.join(output_dir, "sample.jpg"), first)
        cap.release()

        cap = cv2.VideoCapture(video_path)

        def batches():
            buf, idxs, i = [], [], 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                buf.append(frame)
                idxs.append(i)
                i += 1
                if len(buf) >= self.batch_size:
                    yield buf, idxs
                    buf, idxs = [], []
            if buf:
                yield buf, idxs

        from calipsync_tpu.data.dataset import Prefetcher

        from concurrent.futures import ThreadPoolExecutor

        from collections import deque

        n = 0
        pf = Prefetcher(batches(), depth=2)
        # write_workers=0 -> inline writes (no pool)
        pool = (ThreadPoolExecutor(max_workers=self.write_workers)
                if self.write_workers > 0 else None)
        # Detection runs one batch ahead on its own thread: the device
        # dispatches + transfer waits of batch k+1 overlap the host-side
        # JPEG/landmark writes of batch k (everything hot in both stages
        # — cv2, the tunnel wait — releases the GIL). Depth 1 is enough:
        # detection is the long pole and stays continuously busy.
        det_ex = ThreadPoolExecutor(max_workers=1)
        inflight: deque = deque()
        try:
            # decode-ahead thread overlaps cv2 reads with detection;
            # JPEG encodes go to a writer pool (cv2 releases the GIL)
            for buf, idxs in pf:
                if not self.pipeline_detect:
                    self._process_batch(buf, idxs, infer_dir, pool=pool)
                    n = idxs[-1] + 1
                    continue
                inflight.append(
                    (det_ex.submit(self.lip_detector.detect_landmarks,
                                   buf), buf, idxs))
                if len(inflight) >= 2:
                    fut, b, ix = inflight.popleft()
                    self._write_batch(fut.result(), b, ix, infer_dir,
                                      pool=pool)
                    n = ix[-1] + 1
            while inflight:
                fut, b, ix = inflight.popleft()
                self._write_batch(fut.result(), b, ix, infer_dir,
                                  pool=pool)
                n = ix[-1] + 1
        finally:
            pf.close()    # stop the decode thread BEFORE killing cap
            cap.release()
            det_ex.shutdown(wait=True)
            if pool is not None:
                pool.shutdown(wait=True)
        return {"infer_dir": infer_dir, "srt_dir": srt_dir,
                "processed_frames": n}
