"""Tensor-parallel HuBERT: sharded == single-device, params actually split.

The reference runs HuBERT whole on one GPU; TP over a ``model`` mesh axis
is a TPU-only addition (core/tp.py). GSPMD derives the Megatron
all-reduce schedule from the weight shardings, so the only thing to test
is placement + numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from calipsync_tpu.core.tp import hubert_tp_specs, shard_hubert_variables
from calipsync_tpu.nn.hubert import HubertConfig, HubertModel

TINY = HubertConfig(
    hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=128, conv_dim=(32, 32), conv_kernel=(10, 3),
    conv_stride=(5, 2))


def _model_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("model",))


def test_tp_specs_cover_hot_params():
    model = HubertModel(TINY)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 400)))
    specs = hubert_tp_specs(variables)
    p = specs["params"]["encoder"]["layers_0"]
    assert p["attention"]["q_proj"]["kernel"] == P(None, "model", None)
    assert p["attention"]["q_proj"]["bias"] == P("model", None)
    assert p["attention"]["out_proj"]["kernel"] == P("model", None, None)
    assert p["attention"]["out_proj"]["bias"] == P()
    assert p["feed_forward"]["intermediate_dense"]["kernel"] == \
        P(None, "model")
    assert p["feed_forward"]["output_dense"]["kernel"] == P("model", None)
    # frontend stays replicated
    assert specs["params"]["feature_extractor"]["conv0"]["kernel"] == P()


def test_tp_forward_matches_single_device():
    """4-way TP forward == single-device forward (same fp32 math up to
    collective reduction order)."""
    model = HubertModel(TINY)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 400)))
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 800)).astype(np.float32)
    n_valid = jnp.asarray([TINY.num_frames(800), 3], jnp.int32)

    ref = jax.jit(model.apply)(variables, jnp.asarray(wav),
                               num_valid_frames=n_valid)

    mesh = _model_mesh(4)
    sharded = shard_hubert_variables(variables, mesh, config=TINY)
    qk = sharded["params"]["encoder"]["layers_0"]["attention"]["q_proj"][
        "kernel"]
    assert len(qk.sharding.device_set) == 4        # genuinely split
    assert qk.sharding.shard_shape(qk.shape)[1] == 1  # 4 heads / 4 dev

    x = jax.device_put(jnp.asarray(wav), NamedSharding(mesh, P()))
    out = jax.jit(model.apply)(sharded, x, num_valid_frames=n_valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_tp_rejects_indivisible_heads():
    model = HubertModel(TINY)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 400)))
    mesh = _model_mesh(3)
    with pytest.raises(ValueError, match="not divisible"):
        shard_hubert_variables(variables, mesh, config=TINY)


def test_tp_extractor_end_to_end():
    """HubertFeatureExtractor(mesh=...) produces the same features as the
    unsharded extractor, through the padded/masked bucket path."""
    from calipsync_tpu.audio.hubert_pipeline import HubertFeatureExtractor

    model = HubertModel(TINY)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 400)))
    rng = np.random.default_rng(1)
    wav = rng.standard_normal((3210,)).astype(np.float32)

    plain = HubertFeatureExtractor(variables, TINY, bucket_samples=1600,
                                   kernel=10, stride=5, clip_samples=1000)
    tp = HubertFeatureExtractor(variables, TINY, bucket_samples=1600,
                                kernel=10, stride=5, clip_samples=1000,
                                mesh=_model_mesh(4))
    a = plain.extract_features(wav)
    b = tp.extract_features(wav)
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-6)
