"""HuBERT speech encoder in JAX/flax.

The reference drives HF's PyTorch ``HubertModel``
(facebook/hubert-large-ls960-ft) for audio features
(/root/reference/utils/hubert_extractor.py:5-11). This is a TPU-native flax
implementation of the same architecture (conv feature extractor + 24-layer
transformer), numerically matching HF for both config families:

  - ``feat_extract_norm='layer'`` + ``do_stable_layer_norm=True``  (large)
  - ``feat_extract_norm='group'`` + ``do_stable_layer_norm=False`` (base)

plus an importer from HF torch state_dicts (weight-norm on the positional
conv is materialized at import). Exact (erf) GELU throughout, matching HF.

The Wav2Vec2Processor step for this checkpoint is just per-utterance
zero-mean/unit-variance normalization (:func:`normalize_wav`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    conv_dim: Sequence[int] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = True
    feat_extract_norm: str = "layer"      # 'layer' | 'group'
    do_stable_layer_norm: bool = True
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5

    @classmethod
    def large(cls) -> "HubertConfig":
        """facebook/hubert-large-ls960-ft."""
        return cls()

    @classmethod
    def base(cls) -> "HubertConfig":
        """facebook/hubert-base-ls960."""
        return cls(hidden_size=768, num_hidden_layers=12,
                   num_attention_heads=12, intermediate_size=3072,
                   conv_bias=False, feat_extract_norm="group",
                   do_stable_layer_norm=False)

    @classmethod
    def from_hf(cls, hf_config) -> "HubertConfig":
        return cls(
            hidden_size=hf_config.hidden_size,
            num_hidden_layers=hf_config.num_hidden_layers,
            num_attention_heads=hf_config.num_attention_heads,
            intermediate_size=hf_config.intermediate_size,
            conv_dim=tuple(hf_config.conv_dim),
            conv_kernel=tuple(hf_config.conv_kernel),
            conv_stride=tuple(hf_config.conv_stride),
            conv_bias=hf_config.conv_bias,
            feat_extract_norm=hf_config.feat_extract_norm,
            do_stable_layer_norm=hf_config.do_stable_layer_norm,
            num_conv_pos_embeddings=hf_config.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=(
                hf_config.num_conv_pos_embedding_groups),
            layer_norm_eps=hf_config.layer_norm_eps,
        )

    def num_frames(self, num_samples: int) -> int:
        """Output frame count for a waveform length (conv stride chain)."""
        n = num_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            n = (n - k) // s + 1
        return n


def normalize_wav(speech: jax.Array | np.ndarray) -> jax.Array:
    """Per-utterance zero-mean unit-variance (Wav2Vec2FeatureExtractor with
    do_normalize=True, eps 1e-7)."""
    speech = jnp.asarray(speech, dtype=jnp.float32)
    mean = jnp.mean(speech, axis=-1, keepdims=True)
    var = jnp.var(speech, axis=-1, keepdims=True)
    return (speech - mean) / jnp.sqrt(var + 1e-7)


class ConvFeatureExtractor(nn.Module):
    """Raw wav (B, T) -> (B, frames, conv_dim[-1]). Channels-last conv1d."""

    config: HubertConfig
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        x = x[..., None].astype(self.dtype or jnp.float32)  # (B, T, 1)
        for i, (dim, k, s) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel,
                                            cfg.conv_stride)):
            use_bias = cfg.conv_bias if cfg.feat_extract_norm == "layer" \
                else (cfg.conv_bias and i == 0)
            x = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                        use_bias=use_bias, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv{i}")(x)
            if cfg.feat_extract_norm == "layer":
                x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                 dtype=self.dtype, name=f"ln{i}")(x)
            elif i == 0:  # group mode: GroupNorm on the first layer only
                x = nn.GroupNorm(num_groups=dim,
                                 epsilon=cfg.layer_norm_eps,
                                 dtype=self.dtype, name="gn0")(x)
            x = gelu(x)
        return x


class FeatureProjection(nn.Module):
    config: HubertConfig
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm")(x)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype,
                        param_dtype=jnp.float32, name="projection")(x)


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding with even-kernel pad trim."""

    config: HubertConfig
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        k = cfg.num_conv_pos_embeddings
        pad = k // 2
        y = nn.Conv(cfg.hidden_size, (k,), padding=((pad, pad),),
                    feature_group_count=cfg.num_conv_pos_embedding_groups,
                    use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        if k % 2 == 0:  # HubertSamePadLayer removes the trailing frame
            y = y[:, :-1, :]
        return gelu(y)


class SelfAttention(nn.Module):
    config: HubertConfig
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array,
                 key_mask: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.config
        h = cfg.num_attention_heads
        d = cfg.hidden_size // h
        dense = lambda name: nn.DenseGeneral(
            (h, d), axis=-1, use_bias=True, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        q = dense("q_proj")(x) * (d ** -0.5)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if key_mask is not None:  # (B, L) True = attend
            logits = jnp.where(key_mask[:, None, None, :], logits, -1e30)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return nn.DenseGeneral(cfg.hidden_size, axis=(-2, -1), use_bias=True,
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name="out_proj")(out)


class FeedForward(nn.Module):
    config: HubertConfig
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        x = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     param_dtype=jnp.float32, name="intermediate_dense")(x)
        x = gelu(x)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype,
                        param_dtype=jnp.float32, name="output_dense")(x)


class EncoderLayer(nn.Module):
    config: HubertConfig
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array,
                 key_mask: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.config
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=self.dtype, name=name)
        if cfg.do_stable_layer_norm:  # pre-LN (large)
            x = x + SelfAttention(cfg, self.dtype, name="attention")(
                ln("layer_norm")(x), key_mask)
            x = x + FeedForward(cfg, self.dtype, name="feed_forward")(
                ln("final_layer_norm")(x))
        else:  # post-LN (base)
            x = ln("layer_norm")(x + SelfAttention(
                cfg, self.dtype, name="attention")(x, key_mask))
            x = ln("final_layer_norm")(
                x + FeedForward(cfg, self.dtype, name="feed_forward")(x))
        return x


class HubertEncoder(nn.Module):
    config: HubertConfig
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array,
                 key_mask: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.config
        x = x + PositionalConvEmbedding(cfg, self.dtype,
                                        name="pos_conv_embed")(x)
        if not cfg.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                             name="layer_norm")(x)
        for i in range(cfg.num_hidden_layers):
            x = EncoderLayer(cfg, self.dtype, name=f"layers_{i}")(x, key_mask)
        if cfg.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                             name="layer_norm")(x)
        return x


class HubertModel(nn.Module):
    """(B, num_samples) normalized wav -> (B, frames, hidden) last states.

    ``num_valid_frames`` (B,) enables exact variable-length inference with
    bucket-padded static shapes: post-projection features at pad frames are
    zeroed (the positional conv then sees exactly the zero-padding an
    unpadded run would) and pad keys are masked out of attention, so real
    frames match an unpadded forward bit-for-bit. Trim the output to
    ``config.num_frames(true_samples)`` rows.
    """

    config: HubertConfig
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, input_values: jax.Array,
                 num_valid_frames: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.config
        x = ConvFeatureExtractor(cfg, self.dtype,
                                 name="feature_extractor")(input_values)
        x = FeatureProjection(cfg, self.dtype, name="feature_projection")(x)
        key_mask = None
        if num_valid_frames is not None:
            frames = x.shape[1]
            key_mask = (jnp.arange(frames)[None, :]
                        < num_valid_frames[:, None])
            x = jnp.where(key_mask[..., None], x, 0.0)
        return HubertEncoder(cfg, self.dtype, name="encoder")(x, key_mask)


# ---------------------------------------------------------------------------
# HF torch -> flax importer
# ---------------------------------------------------------------------------

def import_hubert(sd, config: HubertConfig) -> dict:
    """HF ``HubertModel`` state_dict (numpy values) -> flax variables.

    Handles both weight-norm parametrizations of the positional conv
    (``weight_g``/``weight_v`` and ``parametrizations.weight.original0/1``)
    by materializing the effective kernel.
    """
    def arr(k):
        return np.asarray(sd[k])

    def conv1d(k):  # torch (O, I/g, K) -> flax (K, I/g, O)
        return np.ascontiguousarray(arr(k).transpose(2, 1, 0))

    def dense(prefix):
        return {"kernel": np.ascontiguousarray(arr(f"{prefix}.weight").T),
                "bias": arr(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": arr(f"{prefix}.weight"),
                "bias": arr(f"{prefix}.bias")}

    p: dict = {}

    fe: dict = {}
    for i in range(len(config.conv_dim)):
        base = f"feature_extractor.conv_layers.{i}"
        conv = {"kernel": conv1d(f"{base}.conv.weight")}
        if f"{base}.conv.bias" in sd:
            conv["bias"] = arr(f"{base}.conv.bias")
        fe[f"conv{i}"] = conv
        if config.feat_extract_norm == "layer":
            fe[f"ln{i}"] = ln(f"{base}.layer_norm")
        elif i == 0:
            fe["gn0"] = ln(f"{base}.layer_norm")
    p["feature_extractor"] = fe

    p["feature_projection"] = {
        "layer_norm": ln("feature_projection.layer_norm"),
        "projection": dense("feature_projection.projection"),
    }

    enc: dict = {}
    pc = "encoder.pos_conv_embed.conv"
    if f"{pc}.weight_g" in sd:
        g, v = arr(f"{pc}.weight_g"), arr(f"{pc}.weight_v")
    elif f"{pc}.parametrizations.weight.original0" in sd:
        g = arr(f"{pc}.parametrizations.weight.original0")
        v = arr(f"{pc}.parametrizations.weight.original1")
    else:
        g, v = None, arr(f"{pc}.weight")
    if g is not None:
        # torch weight_norm(dim=2): norm over dims (0, 1) per kernel index
        norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
        w = g * v / norm
    else:
        w = v
    enc["pos_conv_embed"] = {
        "conv": {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0)),
                 "bias": arr(f"{pc}.bias")}}
    enc["layer_norm"] = ln("encoder.layer_norm")
    for i in range(config.num_hidden_layers):
        base = f"encoder.layers.{i}"
        h = config.num_attention_heads
        d = config.hidden_size // h

        def qkv(name):
            w = arr(f"{base}.attention.{name}.weight")  # (H*d, hidden)
            b = arr(f"{base}.attention.{name}.bias")
            return {"kernel": np.ascontiguousarray(
                        w.T.reshape(config.hidden_size, h, d)),
                    "bias": b.reshape(h, d)}

        out_w = arr(f"{base}.attention.out_proj.weight")  # (hidden, H*d)
        enc[f"layers_{i}"] = {
            "attention": {
                "q_proj": qkv("q_proj"),
                "k_proj": qkv("k_proj"),
                "v_proj": qkv("v_proj"),
                "out_proj": {
                    "kernel": np.ascontiguousarray(
                        out_w.T.reshape(h, d, config.hidden_size)),
                    "bias": arr(f"{base}.attention.out_proj.bias")},
            },
            "layer_norm": ln(f"{base}.layer_norm"),
            "final_layer_norm": ln(f"{base}.final_layer_norm"),
            "feed_forward": {
                "intermediate_dense": dense(
                    f"{base}.feed_forward.intermediate_dense"),
                "output_dense": dense(f"{base}.feed_forward.output_dense"),
            },
        }
    p["encoder"] = enc

    return {"params": jax.tree.map(jnp.asarray, p)}
