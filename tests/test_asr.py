"""TPU-native CTC ASR: logits parity vs HF Wav2Vec2ForCTC, greedy decode
with word timestamps, importer key coverage, slicer integration."""

import numpy as np
import pytest

import jax

from calipsync_tpu.audio.asr import (CTCRecognizer, greedy_ctc_spans,
                                     import_wav2vec2_ctc)
from calipsync_tpu.nn.hubert import HubertConfig

pytest.importorskip("torch")

VOCAB = {"<pad>": 0, "|": 1, "a": 2, "b": 3, "c": 4, "d": 5, "e": 6,
         "f": 7}


@pytest.fixture(scope="module")
def tiny_ctc_pair():
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2ForCTC

    hf_cfg = Wav2Vec2Config(
        vocab_size=len(VOCAB), hidden_size=24, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        conv_dim=[16, 16, 16], conv_kernel=[10, 3, 2],
        conv_stride=[5, 2, 2], conv_bias=True,
        feat_extract_norm="layer", do_stable_layer_norm=True,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        layerdrop=0.0)
    torch.manual_seed(0)
    hf = Wav2Vec2ForCTC(hf_cfg).eval()
    cfg = HubertConfig.from_hf(hf_cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    variables, head = import_wav2vec2_ctc(sd, cfg)
    rec = CTCRecognizer(variables, head, cfg, VOCAB,
                        bucket_samples=2000, blank_id=0)
    return hf, rec


def test_ctc_logits_match_hf(tiny_ctc_pair):
    """Full Wav2Vec2ForCTC forward (trunk + lm head) at the reference
    parity bar, including the bucket-padded masked path."""
    import torch

    hf, rec = tiny_ctc_pair
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(1790).astype(np.float32)

    norm = (audio - audio.mean()) / np.sqrt(audio.var() + 1e-7)
    with torch.no_grad():
        want = hf(torch.from_numpy(norm[None])).logits.numpy()[0]

    got = rec.logits(audio)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_importer_consumes_every_ctc_key(tiny_ctc_pair):
    from test_importer_key_schema import TrackingDict

    hf, rec = tiny_ctc_pair
    sd = TrackingDict({k: v.detach().numpy()
                       for k, v in hf.state_dict().items()})
    import_wav2vec2_ctc(sd, rec.config)
    assert sd.unconsumed(("num_batches_tracked",
                          "masked_spec_embed")) == []


def test_greedy_ctc_decode_words_and_timestamps():
    """CTC collapse (repeats, blanks) + word split on the delimiter +
    frame-index timestamps + nearby-word merging."""
    id_to_token = {i: t for t, i in VOCAB.items()}
    # frames: a a <pad> b | | c <pad> c d
    ids = np.array([2, 2, 0, 3, 1, 1, 4, 0, 4, 5])
    spans = greedy_ctc_spans(ids, id_to_token, frame_dt=0.02,
                             blank_id=0, word_delimiter="|",
                             max_word_gap_s=0.0)
    assert len(spans) == 2
    (s1, e1, w1), (s2, e2, w2) = spans
    assert w1 == "ab" and w2 == "ccd"
    assert s1 == pytest.approx(0.0) and e1 == pytest.approx(0.08)
    assert s2 == pytest.approx(0.12) and e2 == pytest.approx(0.20)

    # with a generous gap the two words merge into one sentence-like span
    merged = greedy_ctc_spans(ids, id_to_token, frame_dt=0.02,
                              blank_id=0, word_delimiter="|",
                              max_word_gap_s=0.5)
    assert merged == [(pytest.approx(0.0), pytest.approx(0.20), "ab ccd")]


def test_asr_fn_drives_the_slicer(tiny_ctc_pair, tmp_path, monkeypatch):
    """as_asr_fn plugs into process_and_split_audio: segments are cut at
    the ASR spans and transcripts land in the .txt side-cars."""
    import os

    from calipsync_tpu.audio.io import save_wav
    from calipsync_tpu.audio.slicer import process_and_split_audio

    _, rec = tiny_ctc_pair
    # deterministic spans instead of random-weight logits
    monkeypatch.setattr(
        rec, "recognize",
        lambda audio: [(0.1, 2.2, "hello world"), (2.4, 4.8, "again")])
    path = str(tmp_path / "in.wav")
    save_wav(path, np.random.default_rng(0).standard_normal(
        16_000 * 5).astype(np.float32) * 0.1, 16_000)
    out = str(tmp_path / "srt")
    segs = process_and_split_audio(path, out, min_seconds=4.0,
                                   max_seconds=5.0,
                                   asr_fn=rec.as_asr_fn())
    assert len(segs) == 1
    s, e, text = segs[0]
    assert (s, e) == (0.1, 4.8)
    assert "hello world" in text and "again" in text
    assert os.path.exists(os.path.join(out, "0.wav"))
    assert open(os.path.join(out, "0.txt")).read() == text


def test_sentences_from_spans_punctuation_and_gaps():
    """Sentence segmentation mirrors funasr's sentence_info semantics
    (reference slice_origin_audio.py:35-46): close at sentence-ending
    punctuation, close at long gaps (the VAD role), merge otherwise."""
    from calipsync_tpu.audio.slicer import sentences_from_spans

    words = [(0.0, 0.3, "ni"), (0.35, 0.6, "hao。"),      # punct close
             (0.7, 1.0, "zai"), (1.05, 1.3, "jian"),       # gap close ->
             (2.5, 2.8, "ok!"),                            # punct close
             (2.9, 3.1, "tail")]                           # trailing
    sents = sentences_from_spans(words, max_gap_s=0.5)
    assert [t for _, _, t in sents] == ["ni hao。", "zai jian", "ok!",
                                        "tail"]
    assert sents[0][:2] == (0.0, 0.6)
    assert sents[1][:2] == (0.7, 1.3)
    assert sents[2][:2] == (2.5, 2.8)

    # punctuation-free input with generous gaps reduces to one sentence
    plain = [(0.0, 0.3, "a"), (0.4, 0.7, "b"), (0.8, 1.1, "c")]
    assert sentences_from_spans(plain) == [(0.0, 1.1, "a b c")]


def test_group_spans_matches_reference_grouping_oracle():
    """Row-for-row parity with the reference's accumulation loop
    (slice_origin_audio.py:55-106) on random sentence sets: same target
    draws -> same segment boundaries and texts."""
    from calipsync_tpu.audio.slicer import group_spans

    def reference_grouping(sentences, min_s, max_s, targets_ms):
        # verbatim port of the reference's while loop (ms domain),
        # with random.randint replaced by the recorded draw sequence
        segments = []
        i, seg = 0, 0
        while i < len(sentences):
            target_length_ms = targets_ms[seg]
            accumulated_text = ""
            start_sentence_index = i
            segment_start_ms = sentences[i]["start"]
            segment_end_ms = segment_start_ms
            while i < len(sentences):
                sentence = sentences[i]
                current_end_ms = sentence["end"]
                current_duration_ms = current_end_ms - segment_start_ms
                if (current_duration_ms >= target_length_ms
                        and i > start_sentence_index):
                    break
                accumulated_text += ("" if not accumulated_text else " ") \
                    + sentence["text"]
                segment_end_ms = current_end_ms
                i += 1
            segments.append((segment_start_ms / 1000.0,
                             segment_end_ms / 1000.0, accumulated_text))
            seg += 1
        return segments

    rng = np.random.default_rng(7)
    t = 0.0
    spans = []
    for k in range(40):
        t += float(rng.uniform(0.05, 2.0))          # inter-sentence gap
        dur = float(rng.uniform(0.5, 6.0))
        spans.append((round(t, 3), round(t + dur, 3), f"s{k}"))
        t += dur

    min_s, max_s = 5.0, 12.0
    # replay the exact target draws group_spans will make
    draw = np.random.default_rng(123)
    targets_ms = [int(draw.integers(5000, 12000, endpoint=True))
                  for _ in range(len(spans))]
    ours = group_spans(spans, min_s, max_s, np.random.default_rng(123))
    ref = reference_grouping(
        [{"start": s * 1000.0, "end": e * 1000.0, "text": txt}
         for s, e, txt in spans], min_s, max_s, targets_ms)
    assert len(ours) == len(ref)
    for (s1, e1, t1), (s2, e2, t2) in zip(ours, ref):
        assert s1 == pytest.approx(s2, abs=1e-9)
        assert e1 == pytest.approx(e2, abs=1e-9)
        assert t1 == t2
