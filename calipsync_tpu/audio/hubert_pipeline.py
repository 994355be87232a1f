"""HuBERT feature extraction pipeline (one-pass and chunked long-audio).

TPU-native equivalent of the reference's HubertExtractor
(/root/reference/utils/hubert_extractor.py:18-77):

  - ``extract``: normalize -> one forward -> trim odd row -> (T/2, 2, 1024).
  - ``extract_features``: the chunked long-audio path with the reference's
    exact chunk boundaries (20 s clips of ``stride*1000`` samples, each
    extended by ``kernel - stride`` so chunk features align with a single
    pass), final pad/trim to ``expected_T = (L - 80) // 320``.

XLA needs static shapes; arbitrary audio lengths are handled by padding up
to a bucket multiple and running the model with ``num_valid_frames`` masking
(see nn/hubert.py docstring for why this is *exact*, not approximate). Full
chunks all share one compiled shape; remainders compile once per bucket.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from calipsync_tpu.nn.hubert import HubertConfig, HubertModel, normalize_wav

KERNEL = 400
STRIDE = 320
CLIP_SAMPLES = STRIDE * 1000          # 20 s at 16 kHz
CHUNK_LEN = CLIP_SAMPLES - STRIDE + KERNEL  # 320080 -> exactly 1000 frames


class HubertFeatureExtractor:
    """Wraps a flax HubertModel + variables for host-driven extraction."""

    def __init__(self, variables: dict,
                 config: Optional[HubertConfig] = None,
                 dtype=None, bucket_samples: int = 32_000,
                 kernel: int = KERNEL, stride: int = STRIDE,
                 clip_samples: int = CLIP_SAMPLES,
                 mesh=None, model_axis: str = "model"):
        """kernel/stride/clip_samples parameterize the chunk math (the
        reference hard-codes 400/320/320000 for HuBERT-large,
        utils/hubert_extractor.py:26-28); overriding them lets tests run
        the identical chunk semantics on tiny configs.

        ``mesh``: optional jax Mesh with a ``model_axis`` axis — shards the
        encoder tensor-parallel (core/tp.py) so HuBERT-large's 315M params
        split across chips; the call site is unchanged (GSPMD inserts the
        Megatron all-reduces over ICI)."""
        self.config = config or HubertConfig.large()
        if mesh is not None:
            from calipsync_tpu.core.tp import shard_hubert_variables

            variables = shard_hubert_variables(
                variables, mesh, axis=model_axis, config=self.config)
        self.variables = variables
        self.model = HubertModel(self.config, dtype=dtype)
        self.bucket = bucket_samples
        self.kernel = kernel
        self.stride = stride
        self.clip_samples = clip_samples
        self.chunk_len = clip_samples - stride + kernel

        @functools.partial(jax.jit, static_argnums=())
        def _fwd(variables, wav, n_valid):
            return self.model.apply(variables, wav,
                                    num_valid_frames=n_valid)

        self._fwd = _fwd

    def _forward_padded(self, normalized: np.ndarray) -> np.ndarray:
        """(L,) normalized wav -> (num_frames(L), hidden) fp32."""
        length = int(normalized.shape[0])
        n_frames = self.config.num_frames(length)
        if n_frames <= 0:
            return np.zeros((0, self.config.hidden_size), np.float32)
        padded_len = -(-length // self.bucket) * self.bucket
        wav = np.zeros((1, padded_len), np.float32)
        wav[0, :length] = normalized
        out = self._fwd(self.variables, jnp.asarray(wav),
                        jnp.asarray([n_frames], jnp.int32))
        return np.asarray(out[0, :n_frames], dtype=np.float32)

    def extract(self, speech_16k: np.ndarray) -> np.ndarray:
        """One-pass path (reference .extract): wav -> (T/2, 2, 1024)."""
        if speech_16k.ndim == 2:
            speech_16k = speech_16k[:, 0]
        normalized = np.asarray(normalize_wav(speech_16k))
        feats = self._forward_padded(normalized)
        t = feats.shape[0] - (feats.shape[0] % 2)
        return feats[:t].reshape(-1, 2, self.config.hidden_size)

    def extract_features(self, speech_16k: np.ndarray) -> np.ndarray:
        """Chunked long-audio path (reference .extract_features)."""
        if speech_16k.ndim == 2:
            speech_16k = speech_16k[:, 0]
        normalized = np.asarray(normalize_wav(speech_16k))
        total = normalized.shape[0]
        num_iter = total // self.clip_samples
        expected_t = (total - (self.kernel - self.stride)) // self.stride

        pieces = []
        for i in range(num_iter):
            start = self.clip_samples * i
            pieces.append(self._forward_padded(
                normalized[start:start + self.chunk_len]))
        remaining = normalized[self.clip_samples * num_iter:]
        if remaining.shape[0] >= self.kernel:
            pieces.append(self._forward_padded(remaining))

        if not pieces:
            return np.zeros((0, 2, self.config.hidden_size), np.float32)
        feats = np.concatenate(pieces, axis=0)
        if feats.shape[0] < expected_t:
            feats = np.pad(feats,
                           ((0, expected_t - feats.shape[0]), (0, 0)))
        else:
            feats = feats[:expected_t]
        t = feats.shape[0] - (feats.shape[0] % 2)
        return feats[:t].reshape(-1, 2, self.config.hidden_size)

    def extract_features_stream(self, speech_16k: np.ndarray):
        """Chunked long-audio path as a generator of (n_i, 2, hidden)
        blocks; ``np.concatenate(list(...))`` equals
        :meth:`extract_features` row-for-row.

        Each full 20 s chunk becomes one block as soon as its forward
        finishes, so a consumer (the pipelined offline manager,
        pipelines/inference.py) can start synthesizing frames while later
        audio is still being featurized instead of waiting for the whole
        clip (the reference extracts everything up front,
        /root/reference/inference.py:64-72)."""
        if speech_16k.ndim == 2:
            speech_16k = speech_16k[:, 0]
        normalized = np.asarray(normalize_wav(speech_16k))
        total = normalized.shape[0]
        num_iter = total // self.clip_samples
        expected_t = (total - (self.kernel - self.stride)) // self.stride
        t_even = max(0, expected_t - expected_t % 2)
        hidden = self.config.hidden_size

        def pieces():
            for i in range(num_iter):
                start = self.clip_samples * i
                yield self._forward_padded(
                    normalized[start:start + self.chunk_len])
            remaining = normalized[self.clip_samples * num_iter:]
            if remaining.shape[0] >= self.kernel:
                yield self._forward_padded(remaining)

        got_piece = False
        emitted = 0  # frames paired off so far (always even)
        buf = np.zeros((0, hidden), np.float32)
        for piece in pieces():
            got_piece = True
            buf = piece if buf.shape[0] == 0 else np.concatenate(
                [buf, piece], axis=0)
            take = min(buf.shape[0], t_even - emitted)
            n2 = take - take % 2
            if n2 > 0:
                yield np.ascontiguousarray(
                    buf[:n2].reshape(-1, 2, hidden))
                emitted += n2
                buf = buf[n2:]
        if not got_piece:
            return  # reference returns an empty array here
        if emitted < t_even:  # pad up to expected_T (reference :52-54)
            yield np.zeros(((t_even - emitted) // 2, 2, hidden),
                           np.float32)

    def extract_from_file_stream(self, audio_path: str):
        from calipsync_tpu.audio.io import load_audio

        return self.extract_features_stream(load_audio(audio_path, 16_000))

    def extract_auto(self, speech_16k: np.ndarray) -> np.ndarray:
        """One-pass for clips up to one chunk (exact), chunked beyond.

        A 1-5 min clip one-pass would mean a 4500-22500-token quadratic
        attention (the reference's own long-audio answer is its chunked
        path); up to 20 s the single pass is used for bit-exactness with
        the reference's step1 behavior."""
        if len(speech_16k) <= self.chunk_len:
            return self.extract(speech_16k)
        return self.extract_features(speech_16k)

    def extract_from_file(self, audio_path: str) -> np.ndarray:
        from calipsync_tpu.audio.io import load_audio

        return self.extract_features(load_audio(audio_path, 16_000))


def load_hf_checkpoint(hubert_path: str, dtype=None,
                       ) -> HubertFeatureExtractor:
    """Build an extractor from a local HF checkpoint directory (the same
    layout the reference points at, utils/hubert_extractor.py:84)."""
    import json
    import pathlib

    from calipsync_tpu.nn.hubert import import_hubert

    p = pathlib.Path(hubert_path)
    cfg_json = json.loads((p / "config.json").read_text())

    class _NS:
        def __init__(self, d):
            self.__dict__.update(d)

    config = HubertConfig.from_hf(_NS(cfg_json))

    sd = None
    bin_path = p / "pytorch_model.bin"
    st_path = p / "model.safetensors"
    if st_path.exists():
        from safetensors.numpy import load_file

        sd = load_file(str(st_path))
    elif bin_path.exists():
        import torch

        sd = {k: v.numpy() for k, v in
              torch.load(bin_path, map_location="cpu").items()}
    else:
        raise FileNotFoundError(f"no model weights under {hubert_path}")
    variables = import_hubert(sd, config)
    return HubertFeatureExtractor(variables, config, dtype=dtype)
