"""Multi-stream serving: cross-stream batching parity and isolation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from calipsync_tpu.infer.synthesizer import FrameSynthesizer
from calipsync_tpu.nn.unet import Generator
from calipsync_tpu.serve.multi_stream import MultiStreamSynthesizer


@pytest.fixture(scope="module")
def gen_variables():
    model = Generator()
    return model, jax.jit(model.init)(jax.random.key(0),
                                      jnp.zeros((1, 160, 160, 6)),
                                      jnp.zeros((1, 32, 32, 32)))


def test_multistream_matches_single_stream(synthetic_step3_dir,
                                           gen_variables):
    """A stream served through the shared batcher produces exactly the
    frames a dedicated FrameSynthesizer would."""
    model, variables = gen_variables
    feats = np.random.default_rng(3).standard_normal(
        (6, 2, 1024)).astype(np.float32)

    solo = FrameSynthesizer(variables, str(synthetic_step3_dir),
                            model=model, batch_size=8, seed=123)
    want = [it["frame"] for it in solo.iterate_synthesized_frames(feats)]

    ms = MultiStreamSynthesizer(variables, [str(synthetic_step3_dir)],
                                model=model, batch_size=8)
    ms.add_stream("a", speaker=0, seed=123)
    got = ms.synthesize_windows({"a": feats})["a"]
    assert [g["index"] for g in got] == list(range(6))
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g["frame"])


def test_two_streams_batched_together(synthetic_step3_dir, gen_variables):
    """Two streams in one tick: identical per-stream results to two solo
    ticks (no cross-stream audio-window leak, correct frame routing)."""
    model, variables = gen_variables
    rng = np.random.default_rng(7)
    fa = rng.standard_normal((5, 2, 1024)).astype(np.float32)
    fb = rng.standard_normal((3, 2, 1024)).astype(np.float32)

    ms1 = MultiStreamSynthesizer(variables, [str(synthetic_step3_dir)],
                                 model=model, batch_size=16)
    ms1.add_stream("a", seed=1)
    ms1.add_stream("b", seed=2)
    joint = ms1.synthesize_windows({"a": fa, "b": fb})

    ms2 = MultiStreamSynthesizer(variables, [str(synthetic_step3_dir)],
                                 model=model, batch_size=16)
    ms2.add_stream("a", seed=1)
    ms2.add_stream("b", seed=2)
    solo_a = ms2.synthesize_windows({"a": fa})["a"]
    solo_b = ms2.synthesize_windows({"b": fb})["b"]

    assert len(joint["a"]) == 5 and len(joint["b"]) == 3
    for w, g in zip(solo_a, joint["a"]):
        np.testing.assert_array_equal(w["frame"], g["frame"])
    for w, g in zip(solo_b, joint["b"]):
        np.testing.assert_array_equal(w["frame"], g["frame"])


def test_consecutive_windows_continue_streams(synthetic_step3_dir,
                                              gen_variables):
    model, variables = gen_variables
    ms = MultiStreamSynthesizer(variables, [str(synthetic_step3_dir)],
                                model=model, batch_size=8)
    ms.add_stream("a", seed=5)
    f = np.random.default_rng(0).standard_normal(
        (4, 2, 1024)).astype(np.float32)
    first = ms.synthesize_windows({"a": f})["a"]
    second = ms.synthesize_windows({"a": f})["a"]
    assert [x["index"] for x in first] == [0, 1, 2, 3]
    assert [x["index"] for x in second] == [4, 5, 6, 7]
    # ping-pong walk continues (physical indices adjacent across windows)
    assert abs(second[0]["physical_index"]
               - first[-1]["physical_index"]) == 1


def test_multistream_yuv420_transfer(synthetic_step3_dir, gen_variables):
    """yuv420 packing works through the shared batcher too: frames match
    the bgr multi-stream output at high PSNR."""
    from calipsync_tpu.eval import batch_psnr

    model, variables = gen_variables
    feats = np.random.default_rng(9).standard_normal(
        (6, 2, 1024)).astype(np.float32)
    frames = {}
    for fmt in ("bgr", "yuv420"):
        ms = MultiStreamSynthesizer(variables, [str(synthetic_step3_dir)],
                                    model=model, batch_size=8,
                                    transfer_format=fmt)
        ms.add_stream("a", speaker=0, seed=7)
        frames[fmt] = [g["frame"]
                       for g in ms.synthesize_windows({"a": feats})["a"]]
    scores = batch_psnr(np.stack(frames["bgr"]), np.stack(frames["yuv420"]))
    assert scores.min() > 38.0, scores
