"""Container-level media IO (no codec work, no ffmpeg binary)."""

from calipsync_tpu.media.mp4 import (has_pcm_audio, mux_pcm_audio,
                                     read_pcm_audio)

__all__ = ["mux_pcm_audio", "read_pcm_audio", "has_pcm_audio"]
