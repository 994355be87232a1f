"""Stream players: consume {'frame','audio','index'} dicts in real time.

Rebuild of the reference player trio
(/root/reference/image_infer_v1/tools/frame_player/): there the PyAudio
callback is the A/V clock (player_main.py:156-174); on this Linux image we
pace with a monotonic wall clock at fps and treat the audio chunk as
payload. All players implement the same interface the stream manager uses:

    start_playing() / stop_playing() / running
    upload_frame(dict) / get_queue_length() / get_last_queue_item()

Backends:
  - NullPlayer: pacing + callbacks only (tests, benchmarks).
  - FilePlayer: append frames/audio; finalize() muxes an .mp4 via ffmpeg.
  - WindowPlayer: cv2.imshow GUI (gated on a display being available).
  - RTMPPlayer: raw BGR + f32 audio piped to ffmpeg flv push over named
    pipes — the Linux equivalent of the reference's win32 pipe + NVENC
    pusher (player_rtmp_windows.py:10-184).
  - VirtualCamPlayer: interface stub (pyvirtualcam is not in this image;
    reference player_cam.py).
"""

from __future__ import annotations

import os
import queue
import subprocess
import tempfile
import threading
import time
from typing import Callable, Optional

import numpy as np


class BasePlayer:
    """Queue + clock core shared by all backends."""

    def __init__(self, width: int = 0, height: int = 0, fps: int = 25,
                 sample_rate: int = 24_000,
                 on_frame: Optional[Callable[[dict], None]] = None):
        self.width = width
        self.height = height
        self.fps = fps
        self.SAMPLE_RATE = sample_rate
        self.samples_per_frame = sample_rate // fps
        self.running = False
        self._queue: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        self._last_item: Optional[dict] = None
        self._thread: Optional[threading.Thread] = None
        self._on_frame = on_frame

    # -- manager interface --

    def upload_frame(self, frame_info: dict) -> None:
        with self._lock:
            self._last_item = frame_info
        self._queue.put(frame_info)

    def get_queue_length(self) -> int:
        return self._queue.qsize()

    def get_last_queue_item(self) -> Optional[dict]:
        with self._lock:
            return self._last_item

    def start_playing(self) -> None:
        if self.running:
            return
        self.running = True
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop_playing(self) -> None:
        self.running = False
        if self._thread is not None:
            self._thread.join(timeout=2.0)
            self._thread = None

    # -- pacing loop --

    def _run(self) -> None:
        period = 1.0 / self.fps
        next_t = time.monotonic()
        while self.running:
            try:
                item = self._queue.get(timeout=period)
            except queue.Empty:
                next_t = time.monotonic()
                continue
            try:
                self._render(item)
                if self._on_frame is not None:
                    self._on_frame(item)
            except Exception as e:  # keep the clock alive (ref resilience)
                print(f"player render error: {e}")
            next_t += period
            delay = next_t - time.monotonic()
            if delay > 0:
                time.sleep(delay)
            else:
                next_t = time.monotonic()

    def _render(self, item: dict) -> None:  # backend hook
        pass


class NullPlayer(BasePlayer):
    """Pacing and callbacks only — for tests and headless benchmarks."""


class FilePlayer(BasePlayer):
    """Collects frames + audio; finalize() writes an A/V-muxed mp4."""

    def __init__(self, output_path: str, realtime: bool = False, **kw):
        super().__init__(**kw)
        self.output_path = output_path
        self.realtime = realtime
        self.frames: list[np.ndarray] = []
        self.audio: list[np.ndarray] = []

    def _run(self) -> None:
        if self.realtime:
            super()._run()
            return
        while self.running:  # drain as fast as frames arrive
            try:
                item = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            self._render(item)
            if self._on_frame is not None:
                self._on_frame(item)

    def _render(self, item: dict) -> None:
        self.frames.append(item["frame"])
        if item.get("audio") is not None:
            self.audio.append(np.asarray(item["audio"], np.float32))

    def finalize(self) -> str:
        import cv2

        if not self.frames:
            raise RuntimeError("no frames played")
        h, w = self.frames[0].shape[:2]
        fd, tmp_v = tempfile.mkstemp(suffix=".mp4")
        os.close(fd)
        vw = cv2.VideoWriter(tmp_v, cv2.VideoWriter_fourcc(*"mp4v"),
                             self.fps, (w, h))
        for f in self.frames:
            vw.write(f)
        vw.release()
        if self.audio:
            from scipy.io import wavfile

            from calipsync_tpu.audio.io import mux_audio

            fd, tmp_a = tempfile.mkstemp(suffix=".wav")
            os.close(fd)
            wavfile.write(tmp_a, self.SAMPLE_RATE,
                          np.concatenate(self.audio))
            mux_audio(tmp_v, tmp_a, self.output_path)
            os.remove(tmp_a)
            if os.path.exists(tmp_v):
                os.remove(tmp_v)
        else:
            os.replace(tmp_v, self.output_path)
        return self.output_path


class WindowPlayer(BasePlayer):
    """GUI window playback (reference player_main.py CVPlayer)."""

    def __init__(self, window_name: str = "calipsync", **kw):
        super().__init__(**kw)
        self.window_name = window_name

    def _render(self, item: dict) -> None:
        import cv2

        frame = item["frame"]
        if self.width and self.height:
            frame = cv2.resize(frame, (self.width, self.height))
        cv2.imshow(self.window_name, frame)
        cv2.waitKey(1)

    def stop_playing(self) -> None:
        super().stop_playing()
        try:
            import cv2

            cv2.destroyWindow(self.window_name)
        except Exception:
            pass


class RTMPPlayer(BasePlayer):
    """ffmpeg RTMP/FLV push fed by raw video on stdin + audio via a named
    pipe (Linux equivalent of player_rtmp_windows.py:65-93; x264 instead of
    NVENC)."""

    def __init__(self, push_url: str, width: int, height: int, **kw):
        super().__init__(width=width, height=height, **kw)
        self.push_url = push_url
        self._proc: Optional[subprocess.Popen] = None
        self._audio_fifo: Optional[str] = None
        self._audio_fh = None

    def start_playing(self) -> None:
        import shutil as _sh

        if _sh.which("ffmpeg") is None:
            raise RuntimeError("RTMP push requires an ffmpeg binary")
        self._audio_fifo = tempfile.mktemp(suffix=".fifo")
        os.mkfifo(self._audio_fifo)
        cmd = [
            "ffmpeg", "-v", "error",
            "-f", "rawvideo", "-pix_fmt", "bgr24",
            "-s", f"{self.width}x{self.height}", "-r", str(self.fps),
            "-i", "pipe:0",
            "-f", "f32le", "-ar", str(self.SAMPLE_RATE), "-ac", "1",
            "-i", self._audio_fifo,
            "-c:v", "libx264", "-preset", "veryfast", "-tune",
            "zerolatency", "-pix_fmt", "yuv420p",
            "-c:a", "aac", "-ar", "44100",
            "-f", "flv", self.push_url,
        ]
        self._proc = subprocess.Popen(cmd, stdin=subprocess.PIPE)
        self._audio_fh = open(self._audio_fifo, "wb")
        super().start_playing()

    def _render(self, item: dict) -> None:
        import cv2

        if self._proc is None or self._proc.stdin is None:
            return
        frame = item["frame"]
        if frame.shape[0] != self.height or frame.shape[1] != self.width:
            frame = cv2.resize(frame, (self.width, self.height))
        try:
            self._proc.stdin.write(frame.tobytes())
            audio = item.get("audio")
            if audio is not None and self._audio_fh is not None:
                self._audio_fh.write(
                    np.asarray(audio, np.float32).tobytes())
        except BrokenPipeError:
            self.running = False

    def stop_playing(self) -> None:
        super().stop_playing()
        for fh in (self._audio_fh,
                   self._proc.stdin if self._proc else None):
            try:
                if fh:
                    fh.close()
            except Exception:
                pass
        if self._proc is not None:
            self._proc.wait(timeout=5)
            self._proc = None
        if self._audio_fifo and os.path.exists(self._audio_fifo):
            os.remove(self._audio_fifo)


class VirtualCamPlayer(BasePlayer):
    """Interface stub: pyvirtualcam is not available in this image
    (reference player_cam.py:16-126). Raises on start."""

    def start_playing(self) -> None:
        raise NotImplementedError(
            "pyvirtualcam backend not available on this image; use "
            "WindowPlayer, RTMPPlayer or FilePlayer")
