"""Pipeline-parallel HuBERT encoder (core/pp.py) vs the sequential model.

GPipe over a 4-stage mesh must match ``HubertModel.apply`` exactly
(same layers, same order, microbatching only re-tiles the batch axis):
asserted at fp32 tolerances for both encoder norm modes and for the
bucket-padded masking contract of nn/hubert.py:246-273.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from calipsync_tpu.core.pp import hubert_pp_apply, stack_encoder_layers
from calipsync_tpu.nn.hubert import HubertConfig, HubertModel


def tiny_config(stable: bool) -> HubertConfig:
    return HubertConfig(hidden_size=32, num_hidden_layers=4,
                        num_attention_heads=4, intermediate_size=64,
                        conv_dim=(16, 16), conv_kernel=(10, 3),
                        conv_stride=(5, 2),
                        feat_extract_norm="layer" if stable else "group",
                        do_stable_layer_norm=stable)


def make_mesh(n: int, axis: str = "model") -> Mesh:
    return Mesh(np.asarray(jax.devices()[:n]), (axis,))


@pytest.mark.parametrize("stable", [True, False])
def test_pp_matches_sequential(stable):
    cfg = tiny_config(stable)
    model = HubertModel(cfg)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal(
        (8, 800)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.key(0), wav[:1])

    want = jax.jit(model.apply)(variables, wav)
    mesh = make_mesh(4)
    got = jax.jit(lambda v, w: hubert_pp_apply(
        cfg, v, w, mesh, num_microbatches=4))(variables, wav)

    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_pp_masked_matches_sequential():
    """Bucket-padded masking travels with the microbatch schedule."""
    cfg = tiny_config(True)
    model = HubertModel(cfg)
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.standard_normal((8, 800)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.key(0), wav[:1])
    nvalid = jnp.asarray(rng.integers(20, 79, size=(8,)), jnp.int32)

    want = jax.jit(model.apply)(variables, wav, nvalid)
    mesh = make_mesh(4)
    got = jax.jit(lambda v, w, n: hubert_pp_apply(
        cfg, v, w, mesh, num_microbatches=4, num_valid_frames=n))(
        variables, wav, nvalid)

    # Only real frames are contractual (pad rows are trimmed by callers,
    # nn/hubert.py:249-254).
    want_np, got_np = np.asarray(want), np.asarray(got)
    for b, n in enumerate(np.asarray(nvalid)):
        np.testing.assert_allclose(got_np[b, :n], want_np[b, :n],
                                   rtol=2e-5, atol=2e-6)


def test_pp_more_microbatches_than_stages():
    """M > S exercises the steady-state pipeline (smaller bubble)."""
    cfg = tiny_config(True)
    model = HubertModel(cfg)
    wav = jnp.asarray(np.random.default_rng(2).standard_normal(
        (8, 800)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.key(0), wav[:1])

    want = jax.jit(model.apply)(variables, wav)
    mesh = make_mesh(2)
    got = jax.jit(lambda v, w: hubert_pp_apply(
        cfg, v, w, mesh, num_microbatches=8))(variables, wav)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_stacked_layers_shape():
    cfg = tiny_config(True)
    model = HubertModel(cfg)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 800)))
    stacked = stack_encoder_layers(variables)
    kern = stacked["attention"]["q_proj"]["kernel"]
    assert kern.shape[0] == cfg.num_hidden_layers


def test_pp_extractor_end_to_end():
    """The production featurizer runs PP (audio/hubert_pipeline.py
    parallel='pp'): chunked long-audio extraction over a 4-stage GPipe
    mesh equals the sequential extractor, 20 s chunks riding as the
    microbatches; single-row calls pad with masked rows."""
    from calipsync_tpu.audio.hubert_pipeline import HubertFeatureExtractor

    cfg = tiny_config(True)  # HuBERT-large is stable-LN in production
    model = HubertModel(cfg)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 400)))
    rng = np.random.default_rng(1)
    wav = rng.standard_normal((3210,)).astype(np.float32)

    kw = dict(bucket_samples=1600, kernel=10, stride=5, clip_samples=1000)
    plain = HubertFeatureExtractor(variables, cfg, **kw)
    pp = HubertFeatureExtractor(variables, cfg, mesh=make_mesh(4),
                                parallel="pp", **kw)
    a = plain.extract_features(wav)
    b = pp.extract_features(wav)
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-6)

    # one-pass path: a single row pads the PP batch with masked zero rows
    short = rng.standard_normal((900,)).astype(np.float32)
    np.testing.assert_allclose(pp.extract(short), plain.extract(short),
                               rtol=2e-5, atol=2e-6)


def test_pp_extractor_stream_equals_batch_and_groups():
    """The STREAMING path (the pipelined offline manager's route) must
    both match the sequential extractor row-for-row and actually group
    chunks into GPipe microbatch dispatches — a per-chunk dispatch in PP
    mode pads every batch to _pp_rows and pays S x the compute."""
    from calipsync_tpu.audio.hubert_pipeline import HubertFeatureExtractor

    cfg = tiny_config(True)
    model = HubertModel(cfg)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 400)))
    rng = np.random.default_rng(7)
    wav = rng.standard_normal((5230,)).astype(np.float32)  # 5 chunks+tail

    kw = dict(bucket_samples=1600, kernel=10, stride=5, clip_samples=1000)
    plain = HubertFeatureExtractor(variables, cfg, **kw)
    pp = HubertFeatureExtractor(variables, cfg, mesh=make_mesh(4),
                                parallel="pp", **kw)
    want = plain.extract_features(wav)
    blocks = list(pp.extract_features_stream(wav))
    np.testing.assert_allclose(np.concatenate(blocks, axis=0), want,
                               rtol=2e-5, atol=2e-6)

    # grouping contract: chunks ride in groups of the microbatch count
    group_sizes = []
    orig = pp._forward_rows
    pp._forward_rows = lambda rows: (group_sizes.append(len(rows))
                                     or orig(rows))
    list(pp.extract_features_stream(wav))
    assert max(group_sizes) == pp._pp_rows == 4, group_sizes


def test_pp_extractor_rejects_bad_microbatches():
    from calipsync_tpu.audio.hubert_pipeline import HubertFeatureExtractor

    cfg = tiny_config(True)
    model = HubertModel(cfg)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 400)))
    with pytest.raises(ValueError, match="multiple"):
        HubertFeatureExtractor(variables, cfg, mesh=make_mesh(4),
                               parallel="pp", pp_microbatches=6)


def test_pp_validates_divisibility():
    cfg = tiny_config(True)
    model = HubertModel(cfg)
    wav = jnp.zeros((8, 800))
    variables = jax.jit(model.init)(jax.random.key(0), wav[:1])
    with pytest.raises(ValueError, match="not divisible"):
        hubert_pp_apply(cfg, variables, wav, make_mesh(3))
    with pytest.raises(ValueError, match="microbatches"):
        hubert_pp_apply(cfg, variables, wav, make_mesh(4),
                        num_microbatches=3)


@pytest.mark.heavy
def test_pp_inside_data_parallel_outer_axis():
    """DP x PP composed in ONE mesh (VERDICT r4 #8): a ('data', 'model')
    = (2, 4) mesh runs the GPipe schedule over 'model' while the batch
    inside each microbatch shards over 'data' — the composition a real
    multi-host serving deployment uses (hosts = DP over DCN, stages =
    PP over ICI). Must equal the sequential single-device forward."""
    cfg = tiny_config(True)
    model = HubertModel(cfg)
    rng = np.random.default_rng(5)
    wav = jnp.asarray(rng.standard_normal((8, 800)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.key(0), wav[:1])

    want = jax.jit(model.apply)(variables, wav)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("model", "data"))
    got = jax.jit(lambda v, w: hubert_pp_apply(
        cfg, v, w, mesh, num_microbatches=4, data_axis="data"))(
        variables, wav)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)

    # masked variant: the bucket-padding contract survives the
    # composition too
    n_valid = jnp.asarray([7, 5, 9, 3, 8, 6, 2, 4], jnp.int32)
    want_m = jax.jit(model.apply)(variables, wav,
                                  num_valid_frames=n_valid)
    got_m = jax.jit(lambda v, w, nv: hubert_pp_apply(
        cfg, v, w, mesh, num_microbatches=4, num_valid_frames=nv,
        data_axis="data"))(variables, wav, n_valid)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               rtol=2e-5, atol=2e-6)

    # microbatch-batch not divisible by the data axis -> loud error
    with pytest.raises(ValueError, match="not divisible by data axis"):
        hubert_pp_apply(cfg, variables, wav[:4], mesh,
                        num_microbatches=4, data_axis="data")
