"""Audio slicing into 5-12 s speech segments.

The reference slices training audio with a funasr ASR + VAD + punctuation
stack (/root/reference/utils/get_srt/slice_origin_audio.py:7-122; its
pipeline caller ships disabled, step3:143-152). funasr is not in this
image, so the same interface is provided with two backends:

  - ``asr_fn`` hook: plug in any callable returning
    [(start_s, end_s, text)] sentence spans (funasr-equivalent).
  - energy VAD fallback: frame-RMS thresholding with hangover, merged into
    random-length 5-12 s segments like the reference's grouping.

Outputs per segment: ``{out}/{i}.wav`` + ``{out}/{i}.txt`` transcript
(empty text under the VAD fallback).
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Tuple

import numpy as np

Span = Tuple[float, float, str]


def energy_vad(audio: np.ndarray, sample_rate: int,
               frame_ms: float = 30.0, threshold_db: float = -40.0,
               hangover_frames: int = 10) -> List[Tuple[float, float]]:
    """Speech spans by frame-RMS thresholding with hangover smoothing."""
    frame = int(sample_rate * frame_ms / 1000)
    n = len(audio) // frame
    if n == 0:
        return []
    x = audio[:n * frame].reshape(n, frame).astype(np.float64)
    rms_db = 20 * np.log10(np.sqrt(np.mean(x * x, axis=1)) + 1e-10)
    active = rms_db > threshold_db
    # hangover: keep active for a few frames after speech ends
    out = np.zeros_like(active)
    run = 0
    for i, a in enumerate(active):
        run = hangover_frames if a else max(0, run - 1)
        out[i] = run > 0
    spans = []
    start = None
    for i, a in enumerate(out):
        if a and start is None:
            start = i
        elif not a and start is not None:
            spans.append((start * frame_ms / 1000, i * frame_ms / 1000))
            start = None
    if start is not None:
        spans.append((start * frame_ms / 1000, n * frame_ms / 1000))
    return spans


def group_spans(spans: List[Span], min_seconds: float, max_seconds: float,
                rng: np.random.Generator) -> List[Span]:
    """Greedily merge sentence spans into random-length 5-12 s segments
    (the reference's grouping policy, slice_origin_audio.py:60-104)."""
    segments: List[Span] = []
    cur_start: Optional[float] = None
    cur_end = 0.0
    cur_text: List[str] = []
    target = float(rng.uniform(min_seconds, max_seconds))
    for s, e, text in spans:
        if cur_start is None:
            cur_start = s
        cur_end = e
        cur_text.append(text)
        if cur_end - cur_start >= target:
            segments.append((cur_start, cur_end, " ".join(cur_text).strip()))
            cur_start = None
            cur_text = []
            target = float(rng.uniform(min_seconds, max_seconds))
    if cur_start is not None and cur_end - cur_start >= min_seconds:
        segments.append((cur_start, cur_end, " ".join(cur_text).strip()))
    return segments


def process_and_split_audio(audio_path: str, output_dir: str,
                            min_seconds: float = 5.0,
                            max_seconds: float = 12.0,
                            asr_fn: Optional[Callable[[np.ndarray, int],
                                                      List[Span]]] = None,
                            sample_rate: int = 16_000,
                            seed: int = 0) -> List[Span]:
    """Slice an audio file into speech segments; writes wav+txt pairs."""
    from calipsync_tpu.audio.io import load_audio, save_wav

    os.makedirs(output_dir, exist_ok=True)
    audio = load_audio(audio_path, sample_rate)
    if asr_fn is not None:
        spans = asr_fn(audio, sample_rate)
    else:
        spans = [(s, e, "") for s, e in energy_vad(audio, sample_rate)]
    segments = group_spans(spans, min_seconds, max_seconds,
                           np.random.default_rng(seed))
    for i, (s, e, text) in enumerate(segments):
        piece = audio[int(s * sample_rate):int(e * sample_rate)]
        save_wav(os.path.join(output_dir, f"{i}.wav"), piece, sample_rate)
        with open(os.path.join(output_dir, f"{i}.txt"), "w") as f:
            f.write(text)
    return segments
