"""TPU-native CTC speech recognition for the training-audio slicer.

The reference slices training audio with a funasr Paraformer ASR stack
(/root/reference/utils/get_srt/slice_origin_audio.py:7-122; its pipeline
caller ships disabled, step3_prepare_infer_data.py:143-152). funasr is
not portable to this stack, but the in-repo JAX HuBERT encoder
(nn/hubert.py) IS the Wav2Vec2-family transformer — a CTC recognizer is
that trunk plus a vocab head. So C18 gets a real, TPU-native ASR:

  - ``import_wav2vec2_ctc``: HF ``Wav2Vec2ForCTC`` checkpoint ->
    (trunk variables via import_hubert, lm head) — the state_dict layout
    is the HuBERT one under a ``wav2vec2.`` prefix plus ``lm_head.*``.
  - ``CTCRecognizer``: jitted bucket-padded forward (exact masked
    padding, same trick as the feature extractor) -> per-frame logits ->
    greedy CTC decode with word timestamps from the conv-stride frame
    rate (20 ms at 16 kHz for the standard config).
  - ``as_asr_fn()`` adapts it to the slicer's
    ``(audio, sr) -> [(start_s, end_s, text)]`` span contract; nearby
    words merge into one span so group_spans sees sentence-like units.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from calipsync_tpu.nn.hubert import HubertConfig, HubertModel, import_hubert

Span = Tuple[float, float, str]


def import_wav2vec2_ctc(sd, config: HubertConfig):
    """HF Wav2Vec2ForCTC state_dict (numpy values) -> (trunk variables,
    {'kernel','bias'} lm head). The trunk reuses import_hubert on the
    de-prefixed keys (identical module layout in transformers)."""
    trunk_sd = {k[len("wav2vec2."):]: v for k, v in sd.items()
                if k.startswith("wav2vec2.")}
    variables = import_hubert(trunk_sd, config)
    head = {"kernel": jnp.asarray(np.asarray(sd["lm_head.weight"]).T),
            "bias": jnp.asarray(np.asarray(sd["lm_head.bias"]))}
    return variables, head


def greedy_ctc_spans(ids: np.ndarray, id_to_token: Dict[int, str],
                     frame_dt: float, blank_id: int = 0,
                     word_delimiter: str = "|",
                     max_word_gap_s: Optional[float] = 0.5) -> List[Span]:
    """Per-frame argmax ids -> word spans.

    Standard CTC collapse (drop repeats, drop blanks), char timestamps
    from frame indices; words split on the delimiter token; consecutive
    words closer than ``max_word_gap_s`` merge into one span (sentence-
    like units for the slicer's grouping). ``max_word_gap_s=None``
    returns the raw word spans unmerged (for punctuation-aware sentence
    segmentation downstream, ``slicer.sentences_from_spans``)."""
    events = []  # (frame, token)
    prev = blank_id
    for t, i in enumerate(ids):
        i = int(i)
        if i != prev and i != blank_id:
            events.append((t, id_to_token.get(i, "")))
        prev = i

    words: List[Span] = []
    chars: List[str] = []
    start_f = end_f = 0
    for f, tok in events + [(len(ids), word_delimiter)]:
        if tok == word_delimiter:
            if chars:
                words.append((start_f * frame_dt, (end_f + 1) * frame_dt,
                              "".join(chars)))
                chars = []
            continue
        if not chars:
            start_f = f
        end_f = f
        chars.append(tok)

    if max_word_gap_s is None:
        return words
    spans: List[Span] = []
    for s, e, w in words:
        if spans and s - spans[-1][1] <= max_word_gap_s:
            ps, pe, pt = spans[-1]
            spans[-1] = (ps, e, f"{pt} {w}")
        else:
            spans.append((s, e, w))
    return spans


class CTCRecognizer:
    """Wav2Vec2-CTC inference on the JAX HuBERT trunk."""

    def __init__(self, variables: dict, head: dict, config: HubertConfig,
                 vocab: Dict[str, int], dtype=None,
                 bucket_samples: int = 32_000, blank_id: int = 0,
                 word_delimiter: str = "|", do_normalize: bool = True):
        self.config = config
        self.variables = variables
        self.head = head
        self.id_to_token = {i: t for t, i in vocab.items()}
        self.blank_id = blank_id
        self.word_delimiter = word_delimiter
        self.bucket = bucket_samples
        self.do_normalize = do_normalize
        # seconds per encoder frame = conv stride product / sample rate
        stride = int(np.prod(config.conv_stride))
        self.frame_dt = stride / 16_000.0
        model = HubertModel(config, dtype=dtype)

        @jax.jit
        def fwd(variables, head, wav, n_valid):
            h = model.apply(variables, wav, num_valid_frames=n_valid)
            return (h @ head["kernel"] + head["bias"]).astype(jnp.float32)

        self._fwd = fwd

    def logits(self, audio: np.ndarray) -> np.ndarray:
        """(L,) 16 kHz float audio -> (frames, vocab) fp32 logits."""
        x = np.asarray(audio, np.float32)
        if self.do_normalize:
            x = (x - x.mean()) / np.sqrt(x.var() + 1e-7)
        n_valid = self.config.num_frames(len(x))
        padded = max(self.bucket,
                     -(-len(x) // self.bucket) * self.bucket)
        buf = np.zeros((1, padded), np.float32)
        buf[0, :len(x)] = x
        out = self._fwd(self.variables, self.head, jnp.asarray(buf),
                        jnp.asarray([n_valid], jnp.int32))
        return np.asarray(out)[0, :n_valid]

    def recognize(self, audio: np.ndarray) -> List[Span]:
        """Punctuation-aware sentence spans (funasr ``sentence_info``
        analogue): raw CTC word spans re-segmented at punctuation / long
        gaps. For punctuation-free vocabs (e.g. wav2vec2-base-960h) this
        reduces to the previous 0.5 s word-gap merge."""
        from calipsync_tpu.audio.slicer import sentences_from_spans

        logits = self.logits(audio)
        ids = logits.argmax(axis=-1)
        words = greedy_ctc_spans(ids, self.id_to_token, self.frame_dt,
                                 self.blank_id, self.word_delimiter,
                                 max_word_gap_s=None)
        return sentences_from_spans(words)

    def as_asr_fn(self):
        """Adapter for audio.slicer.process_and_split_audio(asr_fn=...)."""
        def asr_fn(audio: np.ndarray, sample_rate: int) -> List[Span]:
            if sample_rate != 16_000:
                from calipsync_tpu.audio.io import resample

                audio = resample(np.asarray(audio, np.float32),
                                 sample_rate, 16_000)
            return self.recognize(audio)

        return asr_fn


def load_hf_ctc_checkpoint(model_dir: str, dtype=None) -> CTCRecognizer:
    """Local HF Wav2Vec2ForCTC checkpoint dir -> CTCRecognizer (torch only
    needed here, mirroring audio/hubert_pipeline.load_hf_checkpoint)."""
    from transformers import Wav2Vec2ForCTC, Wav2Vec2Processor

    model = Wav2Vec2ForCTC.from_pretrained(model_dir)
    processor = Wav2Vec2Processor.from_pretrained(model_dir)
    sd = {k: v.detach().cpu().numpy()
          for k, v in model.state_dict().items()}
    cfg = HubertConfig.from_hf(model.config)
    variables, head = import_wav2vec2_ctc(sd, cfg)
    tok = processor.tokenizer
    return CTCRecognizer(
        variables, head, cfg, tok.get_vocab(), dtype=dtype,
        blank_id=tok.pad_token_id,
        word_delimiter=getattr(tok, "word_delimiter_token", "|"),
        do_normalize=getattr(processor.feature_extractor,
                             "do_normalize", True))
