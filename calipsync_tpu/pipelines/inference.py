"""Offline inference: audio file -> lip-synced video file.

Rebuild of /root/reference/inference.py:24-133 (the batch VideoStreamManager):
HuBERT features from the audio (chunked long-audio path), frame synthesis
through infer/synthesizer.py, cv2.VideoWriter at 25 fps, ffmpeg mux with
the source audio.
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

import cv2

from calipsync_tpu.infer.synthesizer import FrameSynthesizer


class VideoStreamManager:
    """Batch (file-to-file) manager, reference-compatible interface."""

    def __init__(self, synthesizer: FrameSynthesizer, hubert_extractor,
                 fps: int = 25):
        self.synthesizer = synthesizer
        self.hubert = hubert_extractor
        self.fps = fps

    def process_single_file(self, audio_path: str, output_path: str,
                            is_generate_sync_frame: bool = True) -> dict:
        features = self.hubert.extract_from_file(audio_path)

        writer: Optional[cv2.VideoWriter] = None
        tmp_video = None
        n = 0
        try:
            for item in self.synthesizer.iterate_synthesized_frames(
                    features, 0, is_generate_sync_frame):
                frame = item["frame"]
                if writer is None:
                    h, w = frame.shape[:2]
                    fd, tmp_video = tempfile.mkstemp(suffix=".mp4")
                    os.close(fd)
                    writer = cv2.VideoWriter(
                        tmp_video, cv2.VideoWriter_fourcc(*"mp4v"),
                        self.fps, (w, h))
                writer.write(frame)
                n += 1
        finally:
            if writer is not None:
                writer.release()

        if tmp_video is None:
            raise RuntimeError("no frames generated")
        from calipsync_tpu.audio.io import mux_audio

        side_car = mux_audio(tmp_video, audio_path, output_path)
        os.remove(tmp_video)
        return {"frames": n, "output": output_path,
                "audio_side_car": side_car}
