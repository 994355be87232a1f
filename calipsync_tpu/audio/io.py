"""Host audio IO: ffmpeg-backed decode/resample.

The reference shells out to ffmpeg for 16 kHz mono conversion
(/root/reference/utils/hubert_extractor.py:13-16, step1:172-177). We do the
same but stream raw f32 PCM over a pipe instead of writing temp wav files.
"""

from __future__ import annotations

import subprocess
from typing import Optional

import numpy as np


def load_audio(path: str, sample_rate: int = 16_000,
               channels: int = 1) -> np.ndarray:
    """Decode any A/V file to float32 PCM at the given rate (mono by default)."""
    cmd = ["ffmpeg", "-v", "error", "-i", path, "-vn",
           "-ar", str(sample_rate), "-ac", str(channels),
           "-f", "f32le", "-"]
    out = subprocess.run(cmd, capture_output=True, check=True).stdout
    audio = np.frombuffer(out, dtype=np.float32)
    if channels > 1:
        audio = audio.reshape(-1, channels)
    return np.array(audio)


def extract_wav(video_path: str, wav_path: str,
                sample_rate: int = 16_000) -> None:
    """Extract a mono wav from a video (reference step1:172-177)."""
    subprocess.run(["ffmpeg", "-v", "error", "-y", "-i", video_path, "-vn",
                    "-ar", str(sample_rate), "-ac", "1", wav_path],
                   check=True)


def save_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    from scipy.io import wavfile

    wavfile.write(path, sample_rate, audio.astype(np.float32))


def rms_db(audio: np.ndarray) -> float:
    """Mean RMS energy in dB (the reference's librosa-based silence gate,
    step1_data_preprocess.py:180-188)."""
    rms = np.sqrt(np.mean(np.square(audio.astype(np.float64))))
    return float(20.0 * np.log10(max(rms, 1e-10)))


def mux_audio(video_path: str, audio_path: str, out_path: str,
              audio_codec: str = "aac") -> None:
    """Mux generated frames' video with the source audio
    (reference inference.py:108-110)."""
    subprocess.run(["ffmpeg", "-v", "error", "-y", "-i", video_path,
                    "-i", audio_path, "-c:v", "copy", "-c:a", audio_codec,
                    "-shortest", out_path], check=True)
