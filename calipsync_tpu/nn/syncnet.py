"""SyncNet lip-sync evaluator (contrastive audio/face embeddings).

Rebuild of /root/reference/module/syncnet.py:110-246 in flax NHWC: VGG-ish
Conv-BN-ReLU stacks (with identity residuals) encoding a 160x160 face crop
and a HuBERT (32,32,32) / WeNet (16,32,256) window into L2-normalized,
LeakyReLU'd embeddings; cosine-similarity BCE loss (:357-361).

Note: the reference flattens encoder outputs raw, which leaves the audio
embedding (512*3*3) and face embedding (512) with different sizes in
hubert mode — its own trainer cannot run as shipped. ``pool='avg'``
(default) global-average-pools spatial dims first so both embeddings are
(B, 512) and training works; ``pool='flatten'`` reproduces the reference
byte-for-byte for weight-import parity.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ConvBNReLU(nn.Module):
    features: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    residual: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding=(self.padding[0:1] * 2, self.padding[1:2] * 2),
                    use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(y)
        if self.residual:
            y = y + x
        return jax.nn.relu(y)


# (features, kernel, stride, padding, residual)
_FACE_PLAN = (
    (32, 7, 1, 3, False),
    (64, 5, 2, 1, False), (64, 3, 1, 1, True), (64, 3, 1, 1, True),
    (128, 3, 2, 1, False), (128, 3, 1, 1, True), (128, 3, 1, 1, True),
    (128, 3, 1, 1, True),
    (256, 3, 2, 1, False), (256, 3, 1, 1, True), (256, 3, 1, 1, True),
    (512, 3, 2, 1, False), (512, 3, 1, 1, True), (512, 3, 1, 1, True),
    (512, 3, 2, 1, False), (512, 3, 1, 0, False), (512, 1, 1, 0, False),
)


def _audio_plan(mode: str):
    p2 = (2, 2) if mode == "hubert" else (1, 2)
    return (
        (256, 3, (1, 1), 1, False), (256, 3, (1, 1), 1, True),
        (256, 3, (1, 1), 1, True),
        (256, 3, p2, 1, False), (256, 3, (1, 1), 1, True),
        (256, 3, (1, 1), 1, True),
        (256, 3, (2, 2), 2, False), (256, 3, (1, 1), 1, True),
        (256, 3, (1, 1), 1, True),
        (512, 3, (2, 2), 1, False), (512, 3, (1, 1), 1, True),
        (512, 3, (1, 1), 1, True),
        (512, 3, (1, 1), 0, False), (512, 1, (1, 1), 0, False),
    )


class SyncNet(nn.Module):
    """forward(face (B,160,160,3), audio NHWC window) ->
    (audio_embedding, face_embedding)."""

    mode: str = "hubert"
    pool: str = "avg"  # 'avg' (usable) | 'flatten' (reference-exact)
    dtype: Optional[Any] = None

    def _encode(self, plan, x, train, prefix):
        for i, (f, k, s, p, res) in enumerate(plan):
            stride = s if isinstance(s, tuple) else (s, s)
            x = ConvBNReLU(f, (k, k), stride, (p, p), residual=res,
                           dtype=self.dtype, name=f"{prefix}{i}")(x, train)
        return x

    @nn.compact
    def __call__(self, face: jax.Array, audio: jax.Array,
                 train: bool = False):
        f = self._encode(_FACE_PLAN, face, train, "face")
        a = self._encode(_audio_plan(self.mode), audio, train, "audio")
        if self.pool == "avg":
            f = jnp.mean(f, axis=(1, 2))
            a = jnp.mean(a, axis=(1, 2))
        else:  # reference-exact: torch flattens NCHW order
            f = jnp.transpose(f, (0, 3, 1, 2)).reshape(f.shape[0], -1)
            a = jnp.transpose(a, (0, 3, 1, 2)).reshape(a.shape[0], -1)
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-12)
        f = f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True), 1e-12)
        a = jax.nn.leaky_relu(a, 0.01)
        f = jax.nn.leaky_relu(f, 0.01)
        return a, f


def cosine_bce_loss(audio_emb: jax.Array, face_emb: jax.Array,
                    y: jax.Array) -> jax.Array:
    """BCE(cosine_similarity(a, v), y) (reference :357-361)."""
    a = audio_emb / jnp.maximum(
        jnp.linalg.norm(audio_emb, axis=1, keepdims=True), 1e-8)
    v = face_emb / jnp.maximum(
        jnp.linalg.norm(face_emb, axis=1, keepdims=True), 1e-8)
    d = jnp.sum(a * v, axis=1)
    d = jnp.clip(d, 1e-7, 1 - 1e-7)
    y = y.reshape(-1)
    return -jnp.mean(y * jnp.log(d) + (1 - y) * jnp.log(1 - d))


def import_syncnet(sd, mode: str = "hubert") -> dict:
    """Reference SyncNet_color state_dict -> flax variables.

    torch Sequential indices map 1:1 to our plan order
    (face_encoder.{i}.conv_block.{0,1}, audio_encoder.{i}...).
    """
    def conv_bn(tp):
        k = np.asarray(sd[f"{tp}.conv_block.0.weight"])
        params = {"conv": {"kernel": np.ascontiguousarray(
                      k.transpose(2, 3, 1, 0)),
                      "bias": np.asarray(sd[f"{tp}.conv_block.0.bias"])},
                  "bn": {"scale": np.asarray(sd[f"{tp}.conv_block.1.weight"]),
                         "bias": np.asarray(sd[f"{tp}.conv_block.1.bias"])}}
        stats = {"bn": {"mean": np.asarray(
                     sd[f"{tp}.conv_block.1.running_mean"]),
                     "var": np.asarray(
                         sd[f"{tp}.conv_block.1.running_var"])}}
        return params, stats

    params, stats = {}, {}
    for i in range(len(_FACE_PLAN)):
        params[f"face{i}"], stats[f"face{i}"] = conv_bn(f"face_encoder.{i}")
    for i in range(len(_audio_plan(mode))):
        params[f"audio{i}"], stats[f"audio{i}"] = conv_bn(
            f"audio_encoder.{i}")
    to_j = lambda t: jax.tree.map(jnp.asarray, t)
    return {"params": to_j(params), "batch_stats": to_j(stats)}
