"""Offline inference: audio file -> lip-synced video file.

Rebuild of /root/reference/inference.py:24-133 (the batch VideoStreamManager):
HuBERT features from the audio (chunked long-audio path), frame synthesis
through infer/synthesizer.py, cv2.VideoWriter at 25 fps, ffmpeg mux with
the source audio.

The reference runs the three host/device phases strictly in sequence:
extract ALL features (:64), synthesize ALL frames (:72), encoding each
frame inline in the synthesis loop (:90-104). Here the default is a
three-stage pipeline instead — HuBERT featurization (device-bound),
frame synthesis (link/host-bound) and mp4 encoding (host-bound) overlap,
so end-to-end wall time approaches max(stage) instead of sum(stage).
Output frames are bit-identical to the sequential path: synthesis spans
are multiples of the synthesizer batch size (the ping-pong sequencer
partition is unchanged) and feature slices carry the 8-row audio-window
margin (see FrameSynthesizer.iterate_synthesized_frames ``row_range``).
"""

from __future__ import annotations

import os
import queue
import tempfile
import threading
import time
from typing import Optional

import cv2
import numpy as np

from calipsync_tpu.infer.synthesizer import FrameSynthesizer

_MARGIN = 8  # audio-window radius in feature rows (audio/windows.py)


def _gather_rows(blocks, lo: int, hi: int) -> np.ndarray:
    """Rows [lo, hi) from an ordered list of (n_i, 2, hidden) blocks."""
    parts, pos = [], 0
    for b in blocks:
        n = len(b)
        s, e = max(lo - pos, 0), min(hi - pos, n)
        if s < e:
            parts.append(b[s:e])
        pos += n
        if pos >= hi:
            break
    if not parts:
        shape = (0,) + (tuple(blocks[0].shape[1:]) if blocks
                        else (2, 1024))
        return np.zeros(shape, np.float32)
    return np.concatenate(parts, axis=0)


class _FrameWriter:
    """Encode thread: pulls frames off a bounded queue into VideoWriter.

    cv2's mp4 encode releases the GIL, so encoding batch k overlaps the
    tunnel wait for batch k+1's predictions.
    """

    def __init__(self, fps: int):
        self.fps = fps
        self.writer: Optional[cv2.VideoWriter] = None
        self.tmp_video: Optional[str] = None
        self.n = 0
        self.q: queue.Queue = queue.Queue(maxsize=64)
        self.error: Optional[BaseException] = None
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        try:
            while True:
                frame = self.q.get()
                if frame is None:
                    return
                if self.writer is None:
                    h, w = frame.shape[:2]
                    fd, self.tmp_video = tempfile.mkstemp(suffix=".mp4")
                    os.close(fd)
                    self.writer = cv2.VideoWriter(
                        self.tmp_video, cv2.VideoWriter_fourcc(*"mp4v"),
                        self.fps, (w, h))
                self.writer.write(frame)
                self.n += 1
        except BaseException as e:  # surfaced to the producer in close()
            self.error = e
            while True:  # drain so the producer never blocks on put
                if self.q.get() is None:
                    return

    def put(self, frame) -> None:
        if self.error is not None:
            raise RuntimeError("frame writer failed") from self.error
        self.q.put(frame)

    def close(self) -> None:
        self.q.put(None)
        self.thread.join()
        if self.writer is not None:
            self.writer.release()
        if self.error is not None:
            raise RuntimeError("frame writer failed") from self.error


class VideoStreamManager:
    """Batch (file-to-file) manager, reference-compatible interface."""

    def __init__(self, synthesizer: FrameSynthesizer, hubert_extractor,
                 fps: int = 25, pipelined: Optional[bool] = None,
                 span_rows: Optional[int] = None):
        """``pipelined=None`` auto-enables the pipelined path when the
        extractor exposes ``extract_from_file_stream``. ``span_rows``
        overrides the feature rows synthesized per pipelined call (must
        be a multiple of the synthesizer batch size)."""
        self.synthesizer = synthesizer
        self.hubert = hubert_extractor
        self.fps = fps
        self.pipelined = pipelined
        if span_rows is not None and span_rows % synthesizer.batch_size:
            raise ValueError("span_rows must be a multiple of the "
                             "synthesizer batch size")
        self.span_rows = span_rows

    def process_single_file(self, audio_path: str, output_path: str,
                            is_generate_sync_frame: bool = True) -> dict:
        pipelined = self.pipelined
        if pipelined is None:
            pipelined = hasattr(self.hubert, "extract_from_file_stream")
        if pipelined:
            n, tmp_video, ttff = self._run_pipelined(
                audio_path, is_generate_sync_frame)
        else:
            n, tmp_video, ttff = self._run_sequential(
                audio_path, is_generate_sync_frame)

        if tmp_video is None:
            raise RuntimeError("no frames generated")
        from calipsync_tpu.audio.io import mux_audio

        side_car = mux_audio(tmp_video, audio_path, output_path)
        os.remove(tmp_video)
        # ttff_s: seconds from call start to the FIRST synthesized frame
        # — the pipelined path's structural win on long clips (synthesis
        # starts after the first 20 s feature chunk instead of after
        # full-clip featurization); recorded so it is measurable
        # (tools/bench_offline.py; VERDICT r3 item 4).
        return {"frames": n, "output": output_path,
                "audio_side_car": side_car,
                "ttff_s": None if ttff is None else round(ttff, 3)}

    # ---------------- sequential (reference flow) ----------------

    def _run_sequential(self, audio_path: str,
                        is_generate_sync_frame: bool):
        t0 = time.perf_counter()
        ttff = None
        features = self.hubert.extract_from_file(audio_path)
        writer = _FrameWriter(self.fps)
        try:
            for item in self.synthesizer.iterate_synthesized_frames(
                    features, 0, is_generate_sync_frame):
                if ttff is None:
                    ttff = time.perf_counter() - t0
                writer.put(item["frame"])
        finally:
            writer.close()
        return writer.n, writer.tmp_video, ttff

    # ---------------- pipelined (featurize || synth || encode) -------

    def _run_pipelined(self, audio_path: str,
                       is_generate_sync_frame: bool):
        blocks: list = []  # (n_i, 2, hidden) feature blocks, in order
        state = {"rows": 0, "done": False, "error": None}
        cond = threading.Condition()

        def featurize():
            try:
                for block in self.hubert.extract_from_file_stream(
                        audio_path):
                    with cond:
                        if state.get("cancel"):
                            return
                        blocks.append(block)
                        state["rows"] += len(block)
                        cond.notify()
            except BaseException as e:
                state["error"] = e
            finally:
                with cond:
                    state["done"] = True
                    cond.notify()

        producer = threading.Thread(target=featurize, daemon=True)
        producer.start()

        bs = self.synthesizer.batch_size
        # span: rows synthesized per call. Multiple of batch_size (keeps
        # the sequencer partition identical to one full-array call) and
        # sized so slice + 2*margin fits one 256-row jit bucket. For
        # batch_size > 240 the smallest legal span (= batch_size) already
        # overflows into the 512-row bucket — one extra compile per
        # process, deterministic thereafter.
        span = self.span_rows or bs * max(1, 240 // bs)
        writer = _FrameWriter(self.fps)
        cursor = 0  # absolute feature rows synthesized so far
        t0 = time.perf_counter()
        ttff = None
        try:
            while True:
                with cond:
                    cond.wait_for(
                        lambda: state["done"]
                        or state["rows"] >= cursor + span + _MARGIN)
                    rows, done = state["rows"], state["done"]
                    snapshot = list(blocks)
                if state["error"] is not None:
                    raise RuntimeError("feature extraction failed") \
                        from state["error"]
                # span-sized steps even when more rows are already
                # available: the call partition (and so the jit bucket
                # shapes) stays deterministic under any thread timing
                hi = min(rows, cursor + span)
                if hi <= cursor:
                    break
                ctx_lo = max(0, cursor - _MARGIN)
                ctx_hi = min(rows, hi + _MARGIN)
                feats = _gather_rows(snapshot, ctx_lo, ctx_hi)
                for item in self.synthesizer.iterate_synthesized_frames(
                        feats, cursor, is_generate_sync_frame,
                        row_range=(cursor - ctx_lo, hi - ctx_lo)):
                    if ttff is None:
                        ttff = time.perf_counter() - t0
                    writer.put(item["frame"])
                cursor = hi
        finally:
            with cond:
                state["cancel"] = True
            producer.join()
            writer.close()
        return writer.n, writer.tmp_video, ttff
