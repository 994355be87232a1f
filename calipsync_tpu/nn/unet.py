"""CALipSync-TPU generator: audio-conditioned cross-attention UNet.

TPU-native re-design of the reference generator
(/root/reference/module/unet.py:109-345). Same math, different layout and
execution model:

  - NHWC everywhere (XLA's native TPU conv layout).
  - Audio conditioning tensors are NHWC too: HuBERT windows enter as
    (B, 32, 32, 32) with channels last (see calipsync_tpu/audio/windows.py
    for the packing that matches the reference's NCHW reshape).
  - The 100-token cross-attention runs either as plain XLA einsums (always
    correct, well fused) or as a fused Pallas kernel on TPU
    (calipsync_tpu/kernels/cross_attention.py) selected via ``attn_impl``.
  - BatchNorm running stats live in the flax ``batch_stats`` collection;
    pass ``axis_name='data'`` for cross-replica sync-BN under shard_map.

Forward contract (fp32 eval parity vs torch at rtol 1e-3 / atol 1e-5):
    x:     (B, 160, 160, 6)  masked mouth crop + reference crop, [0,1]
    audio: (B, 32, 32, 32)   HuBERT window, NHWC
    ->     (B, 160, 160, 3)  sigmoid RGB mouth crop
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import (BatchNorm, ConvBNAct, DoubleConvDW, Down, InConvDw,
                     InvertedResidual, OutConv, Up, leaky_relu)

Dtype = Any

CH = (32, 64, 128, 256, 512)  # reference channel plan (module/unet.py:277)


class AudioConvHubert(nn.Module):
    """HuBERT-window encoder: (B,32,32,32) NHWC -> (B,10,10,512).

    Mirrors /root/reference/module/unet.py:147-194. conv5 uses padding 3
    with stride 2 (16 -> 10 spatial).
    """

    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None
    ir_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        ir_kw = dict(ir_impl=self.ir_impl, **kw)
        x = InvertedResidual(CH[1], stride=1, use_res_connect=False,
                             expand_ratio=2, name="conv1", **ir_kw)(x, train)
        x = InvertedResidual(CH[2], stride=1, use_res_connect=False,
                             expand_ratio=2, name="conv2", **ir_kw)(x, train)
        x = ConvBNAct(CH[3], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                      name="conv3", **kw)(x, train)
        x = InvertedResidual(CH[3], stride=1, use_res_connect=True,
                             expand_ratio=2, name="conv4", **ir_kw)(x, train)
        x = ConvBNAct(CH[4], (3, 3), strides=(2, 2), padding=((3, 3), (3, 3)),
                      name="conv5", **kw)(x, train)
        x = InvertedResidual(CH[4], stride=1, use_res_connect=True,
                             expand_ratio=2, name="conv6", **ir_kw)(x, train)
        x = InvertedResidual(CH[4], stride=1, use_res_connect=True,
                             expand_ratio=2, name="conv7", **ir_kw)(x, train)
        x = BatchNorm(use_running_average=not train,
                      axis_name=self.axis_name if train else None,
                      dtype=self.dtype, name="bn7")(x)
        return leaky_relu(x)


class AudioConvWenet(nn.Module):
    """WeNet-feature encoder: (B,16,32,256) NHWC -> (B,10,10,512).

    Mirrors /root/reference/module/unet.py:109-144 (note: its conv3/conv5
    activations are plain ReLU, unlike the LeakyReLU used elsewhere).
    """

    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None
    ir_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        ir_kw = dict(ir_impl=self.ir_impl, **kw)
        x = InvertedResidual(CH[3], stride=1, use_res_connect=True,
                             expand_ratio=2, name="conv1", **ir_kw)(x, train)
        x = InvertedResidual(CH[3], stride=1, use_res_connect=True,
                             expand_ratio=2, name="conv2", **ir_kw)(x, train)
        x = ConvBNAct(CH[3], (3, 3), strides=(1, 2), padding=((1, 1), (1, 1)),
                      act=False, name="conv3", **kw)(x, train)
        x = jax.nn.relu(x)
        x = InvertedResidual(CH[3], stride=1, use_res_connect=True,
                             expand_ratio=2, name="conv4", **ir_kw)(x, train)
        x = ConvBNAct(CH[4], (3, 3), strides=(2, 2), padding=((3, 3), (3, 3)),
                      act=False, name="conv5", **kw)(x, train)
        x = jax.nn.relu(x)
        x = InvertedResidual(CH[4], stride=1, use_res_connect=True,
                             expand_ratio=2, name="conv6", **ir_kw)(x, train)
        x = InvertedResidual(CH[4], stride=1, use_res_connect=True,
                             expand_ratio=2, name="conv7", **ir_kw)(x, train)
        return x


class CrossAttention(nn.Module):
    """Single-head spatial cross-attention over H*W tokens.

    Mirrors /root/reference/module/unet.py:198-218: q from x, k/v from y,
    1x1 projections (q/k to C/8, v to C), softmax(QK^T) (no 1/sqrt(d)
    scaling, as in the reference), gamma-gated residual.

    ``impl='xla'`` uses einsums (XLA fuses these well at 100 tokens);
    ``impl='pallas'`` calls the fused TPU kernel.
    """

    dtype: Optional[Dtype] = None
    impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        n = h * w
        q = nn.Conv(c // 8, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="query")(x)
        k = nn.Conv(c // 8, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="key")(y)
        v = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="value")(y)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)

        q = q.reshape(b, n, c // 8)
        k = k.reshape(b, n, c // 8)
        v = v.reshape(b, n, c)

        if self.impl == "pallas":
            from calipsync_tpu.kernels.cross_attention import cross_attention
            out = cross_attention(q, k, v)
        else:
            energy = jnp.einsum("bqd,bkd->bqk", q, k,
                                preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(energy, axis=-1).astype(v.dtype)
            out = jnp.einsum("bqk,bkc->bqc", attn, v,
                             preferred_element_type=jnp.float32)
        out = out.reshape(b, h, w, c).astype(x.dtype)
        return gamma.astype(x.dtype) * out + x


class MLPFusion(nn.Module):
    """Token-wise MLP fusion of visual and audio features.

    Mirrors /root/reference/module/unet.py:224-249: flatten both maps to
    (B, H*W, C), concat channels, Linear->BN1d->LeakyReLU->Linear->BN1d,
    reshape back to a (B, H, W, out) map. BatchNorm1d(C) over (B, C, L)
    normalizes each channel across batch AND tokens, which is exactly flax
    BatchNorm on a (B, L, C) tensor.
    """

    hidden: int
    features: int
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array,
                 train: bool = False) -> jax.Array:
        b, h, w, c = x.shape
        fused = jnp.concatenate([x.reshape(b, h * w, c),
                                 y.reshape(b, h * w, c)], axis=-1)
        fused = nn.Dense(self.hidden, dtype=self.dtype,
                         param_dtype=jnp.float32, name="fc1")(fused)
        fused = BatchNorm(use_running_average=not train,
                          axis_name=self.axis_name if train else None,
                          dtype=self.dtype, name="bn1")(fused)
        fused = leaky_relu(fused)
        fused = nn.Dense(self.features, dtype=self.dtype,
                         param_dtype=jnp.float32, name="fc2")(fused)
        fused = BatchNorm(use_running_average=not train,
                          axis_name=self.axis_name if train else None,
                          dtype=self.dtype, name="bn2")(fused)
        return fused.reshape(b, h, w, self.features)


class AttentionBlock(nn.Module):
    """1x1 down-proj -> cross-attention -> 1x1 up-proj -> +tx -> BN -> LReLU.

    Mirrors /root/reference/module/unet.py:252-270.
    """

    inner: int  # in_channels (512)
    features: int  # out_channels (1024)
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, audio: jax.Array, tx: jax.Array,
                 train: bool = False) -> jax.Array:
        ox = nn.Conv(self.inner, (1, 1), use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj_in")(x)
        ox = CrossAttention(dtype=self.dtype, impl=self.attn_impl,
                            name="attn")(ox, audio)
        ox = nn.Conv(self.features, (1, 1), use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj_out")(ox)
        ox = ox + tx
        ox = BatchNorm(use_running_average=not train,
                       axis_name=self.axis_name if train else None,
                       dtype=self.dtype, name="bn")(ox)
        return leaky_relu(ox)


class Generator(nn.Module):
    """The 19.8M-param lip-sync generator (ref module/unet.py:273-345).

    Encoder 160->10 at widths (32,64,128,256,512); audio encoder to
    (10,10,512); concat+MLP fusion to 1024 channels; 4 cross-attention
    blocks with dense residual accumulation; fuse conv back to 256; skip
    decoder back to 160; 1x1 + BN + sigmoid.
    """

    n_channels: int = 6
    mode: str = "hubert"
    n_blocks: int = 4
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None
    attn_impl: str = "xla"
    ir_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, audio: jax.Array,
                 train: bool = False) -> jax.Array:
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        ir_kw = dict(ir_impl=self.ir_impl, **kw)
        x = x.astype(self.dtype or x.dtype)
        audio = audio.astype(self.dtype or audio.dtype)

        x1 = InConvDw(CH[0], name="inc", **ir_kw)(x, train)
        x2 = Down(CH[1], name="down1", **ir_kw)(x1, train)
        x3 = Down(CH[2], name="down2", **ir_kw)(x2, train)
        x4 = Down(CH[3], name="down3", **ir_kw)(x3, train)
        x5 = Down(CH[4], name="down4", **ir_kw)(x4, train)

        if self.mode == "hubert":
            af = AudioConvHubert(name="audio_model", **ir_kw)(audio, train)
        elif self.mode == "wenet":
            af = AudioConvWenet(name="audio_model", **ir_kw)(audio, train)
        else:
            raise ValueError(f"unknown audio mode: {self.mode}")

        tx = jnp.concatenate([x5, af], axis=-1)
        fused = MLPFusion(CH[4] * 2, CH[4] * 2, name="mlp_fusion",
                          **kw)(x5, af, train)
        tx = tx + fused
        tx = BatchNorm(use_running_average=not train,
                       axis_name=self.axis_name if train else None,
                       dtype=self.dtype, name="bn_tx")(tx)

        ox = tx
        kx = tx
        for i in range(self.n_blocks):
            ox = AttentionBlock(CH[4], CH[4] * 2, attn_impl=self.attn_impl,
                                name=f"attention_blocks_{i}",
                                **kw)(ox, af, tx, train)
            kx = ox + kx
        kx = BatchNorm(use_running_average=not train,
                       axis_name=self.axis_name if train else None,
                       dtype=self.dtype, name="bn_kx")(kx)
        kx = leaky_relu(kx)

        x5 = DoubleConvDW(CH[4], stride=1, name="fuse_conv1",
                          **ir_kw)(kx, train)
        x5 = DoubleConvDW(CH[3], stride=1, name="fuse_conv2",
                          **ir_kw)(x5, train)

        x = Up(CH[3] // 2, name="up1", **ir_kw)(x5, x4, train)
        x = Up(CH[2] // 2, name="up2", **ir_kw)(x, x3, train)
        x = Up(CH[1] // 2, name="up3", **ir_kw)(x, x2, train)
        x = Up(CH[0], name="up4", **ir_kw)(x, x1, train)

        out = OutConv(3, dtype=self.dtype, name="outc")(x)
        out = BatchNorm(use_running_average=not train,
                        axis_name=self.axis_name if train else None,
                        dtype=self.dtype, name="outc_bn")(out)
        return jax.nn.sigmoid(out.astype(jnp.float32))


# Alias matching the reference class name (module/unet.py:273).
Model = Generator
