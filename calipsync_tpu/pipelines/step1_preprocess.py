"""Step 1: video -> training data directory.

Rebuild of /root/reference/step1_data_preprocess.py:14-251. Outputs the same
layout consumed by the dataset and trainer:

    {out}/aud.wav            16 kHz mono audio
    {out}/aud_hu.npy         (T/2, 2, 1024) HuBERT features
    {out}/full_body_img/{i}.jpg
    {out}/landmarks/{i}.lms  (110, 2) int landmarks
    {out}/faces/{i}.jpg      160x160 mouth crops (debug/inspection)

Differences from the reference, by design:
  - decode via cv2.VideoCapture (PyAV is not in this image); frames stay
    BGR end to end (see vision/lip_detector.py channel-order note).
  - PFLD landmarks run batched on TPU instead of bs=1 per crop.
  - silence gate: mean frame-RMS in dB like librosa.feature.rms
    (reference :183-188), raises on < -150 dB.
"""

from __future__ import annotations

import os
import shutil
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import cv2
import numpy as np

from calipsync_tpu.config import CropConfig
from calipsync_tpu.vision.geometry import (center_160, crop_resize_168,
                                            save_landmarks_txt)


def frame_rms_db(audio: np.ndarray, frame_length: int = 2048,
                 hop_length: int = 512) -> float:
    """Mean of framed RMS in dB (librosa.feature.rms equivalent, centered)."""
    x = np.pad(audio.astype(np.float64), (frame_length // 2,
                                          frame_length // 2))
    n = 1 + (len(x) - frame_length) // hop_length
    idx = (np.arange(frame_length)[None, :]
           + hop_length * np.arange(n)[:, None])
    rms = np.sqrt(np.mean(np.square(x[idx]), axis=1))
    mean_rms = float(np.mean(rms))
    return 20.0 * np.log10(mean_rms) if mean_rms > 0 else -100.0


class TrainPreprocessor:
    def __init__(self, lip_detector, hubert_extractor,
                 batch_size: int = 64, crop: CropConfig = CropConfig(),
                 min_db: float = -150.0, long_audio: str = "auto"):
        """
        Args:
          lip_detector: vision.lip_detector.LipDetector
          hubert_extractor: audio.hubert_pipeline.HubertFeatureExtractor
          long_audio: which HuBERT path featurizes the training clip —
            'auto' (one-pass up to one 20 s chunk, overlap-chunked
            beyond; the default), 'one_pass' (reference-exact: the FULL
            clip in one forward, as step1_data_preprocess.py:191-192
            does via utils/hubert_extractor.py:67-77 — quadratic
            attention in clip length, a 5-min clip is 22,500 tokens),
            or 'chunked' (always the overlap-chunked path). The
            measured divergence between the two is recorded in
            HUBERT_DELTA_r05.json / PERF.md.
        """
        self.lip_detector = lip_detector
        self.hubert = hubert_extractor
        self.batch_size = batch_size
        self.crop = crop
        self.min_db = min_db
        if long_audio not in ("auto", "one_pass", "chunked"):
            raise ValueError(f"unknown long_audio mode: {long_audio}")
        self.long_audio = long_audio

    def _frame_batches(self, video_path: str):
        cap = cv2.VideoCapture(video_path)
        buf = []
        try:
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                buf.append(frame)
                if len(buf) >= self.batch_size:
                    yield buf
                    buf = []
            if buf:
                yield buf
        finally:
            cap.release()

    def fix_missing_landmarks(self, output_dir: str) -> None:
        """Copy the nearest existing .lms for any gap (reference :119-159,
        preferring the previous frame)."""
        lms_dir = os.path.join(output_dir, "landmarks")
        frames = os.listdir(os.path.join(output_dir, "full_body_img"))
        if not frames:
            return
        max_frame = max(int(f.split(".")[0]) for f in frames)
        for i in range(max_frame + 1):
            path = os.path.join(lms_dir, f"{i}.lms")
            if os.path.exists(path):
                continue
            ref = None
            prev_i, next_i = i - 1, i + 1
            while prev_i >= 0 or next_i <= max_frame:
                if prev_i >= 0:
                    c = os.path.join(lms_dir, f"{prev_i}.lms")
                    if os.path.exists(c):
                        ref = c
                        break
                if next_i <= max_frame:
                    c = os.path.join(lms_dir, f"{next_i}.lms")
                    if os.path.exists(c):
                        ref = c
                        break
                prev_i -= 1
                next_i += 1
            if ref:
                shutil.copy2(ref, path)

    def process_video(self, video_path: str, output_dir: str,
                      audio_path: Optional[str] = None) -> dict:
        """``audio_path``: optional side-car wav with the video's audio
        track. Without ffmpeg on the host, cv2 cannot demux audio from the
        container, so a side-car (or a .wav next to the video) is required;
        with ffmpeg present it is extracted automatically."""
        # detect_stride carry is only valid within one frame stream
        # (plug-in detectors without stride state need no reset)
        getattr(self.lip_detector, "reset_stride", lambda: None)()
        os.makedirs(output_dir, exist_ok=True)
        for d in ("landmarks", "faces", "full_body_img"):
            os.makedirs(os.path.join(output_dir, d), exist_ok=True)

        # --- audio ---
        from calipsync_tpu.audio.io import (extract_wav, have_ffmpeg,
                                            load_audio, save_wav)

        out_wav = os.path.join(output_dir, "aud.wav")
        if audio_path is None:
            side_car = os.path.splitext(video_path)[0] + ".wav"
            if os.path.exists(side_car):
                audio_path = side_car
            elif have_ffmpeg():
                extract_wav(video_path, out_wav)
                audio_path = out_wav
            else:
                raise RuntimeError(
                    "no ffmpeg on host: provide audio_path= or a .wav "
                    "side-car next to the video")
        audio = load_audio(audio_path, 16_000)
        if os.path.abspath(audio_path) != os.path.abspath(out_wav):
            save_wav(out_wav, audio, 16_000)
        if frame_rms_db(audio) < self.min_db:
            raise RuntimeError("audio level too low: no speaker detected")

        extract = {
            "auto": getattr(self.hubert, "extract_auto",
                            self.hubert.extract),
            "one_pass": self.hubert.extract,
            "chunked": getattr(self.hubert, "extract_features",
                               self.hubert.extract),
        }[self.long_audio]
        feats = extract(audio)
        np.save(os.path.join(output_dir, "aud_hu.npy"), feats)

        # --- frames ---
        start = time.time()
        total = 0
        pool = ThreadPoolExecutor(max_workers=16)
        from calipsync_tpu.data.dataset import Prefetcher

        from collections import deque

        pf = Prefetcher(self._frame_batches(video_path), depth=2)
        # detection one batch ahead on its own thread (same shape as
        # step3): device dispatch/transfer waits of batch k+1 overlap
        # the host-side crop/encode work of batch k
        det_ex = ThreadPoolExecutor(max_workers=1)
        inflight: deque = deque()

        def handle(batch, indices, landmarks_list):
            for i, frame, lms in zip(indices, batch, landmarks_list):
                if lms is None or len(lms) == 0:
                    continue
                lm = lms[0]
                save_landmarks_txt(
                    os.path.join(output_dir, "landmarks", f"{i}.lms"),
                    lm, fmt="%d")
                xmin, ymin = int(lm[1][0]), int(lm[52][1])
                xmax = int(lm[31][0])
                ymax = ymin + (xmax - xmin)
                face = frame[ymin:ymax, xmin:xmax]
                if face.size > 0:
                    face = center_160(
                        crop_resize_168(frame, ymin, ymax, xmin, xmax,
                                        self.crop), self.crop)
                    pool.submit(cv2.imwrite,
                                os.path.join(output_dir, "faces",
                                             f"{i}.jpg"), face)

        try:
            # decode-ahead: the capture thread reads batch k+1 while the
            # detector/PFLD run batch k (the reference is decode-bound,
            # SURVEY.md section 7 hard part (5))
            for batch in pf:
                indices = list(range(total, total + len(batch)))
                for i, frame in zip(indices, batch):
                    pool.submit(cv2.imwrite,
                                os.path.join(output_dir, "full_body_img",
                                             f"{i}.jpg"), frame)
                inflight.append(
                    (det_ex.submit(self.lip_detector.detect_landmarks,
                                   batch), batch, indices))
                if len(inflight) >= 2:
                    fut, b, ix = inflight.popleft()
                    handle(b, ix, fut.result())
                total += len(batch)
            while inflight:
                fut, b, ix = inflight.popleft()
                handle(b, ix, fut.result())
        finally:
            pf.close()    # joins the decode thread; generator's finally
            det_ex.shutdown(wait=True)
            pool.shutdown(wait=True)    # then releases the capture

        self.fix_missing_landmarks(output_dir)
        return {"total_frames": total,
                "process_time": time.time() - start,
                "output_dir": output_dir}
