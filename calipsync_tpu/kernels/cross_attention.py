"""Fused spatial cross-attention Pallas TPU kernel.

The generator runs 4 cross-attention blocks over 100 spatial tokens per
forward (/root/reference/module/unet.py:198-218, SURVEY.md section 3.3
"Pallas targets"). The unfused XLA lowering materializes the (B, N, N)
attention matrix in HBM between the two matmuls and the softmax; this
kernel keeps QK^T, the (unscaled, reference-exact) softmax and attn@V in
VMEM per batch element — one HBM round-trip instead of three.

Shapes: q (B, N, D), k (B, N, D), v (B, N, C) with N=100, D=64, C=512.
Tokens are padded to 128 lanes inside; padded key columns are masked to
-inf before the softmax, so results are exact. fp32 accumulation on the
MXU regardless of input dtype.

Backward runs as plain JAX ops via custom_vjp (attention backward is a
few small matmuls XLA fuses well at this size; the win here is the
forward, which serving calls thousands of times per second).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _attention_kernel(n_valid: int, q_ref, k_ref, v_ref, out_ref):
    q = q_ref[0].astype(jnp.float32)      # (Np, D)
    k = k_ref[0].astype(jnp.float32)      # (Np, D)
    v = v_ref[0].astype(jnp.float32)      # (Np, C)

    energy = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (Np, Np)
    np_tokens = energy.shape[-1]
    if n_valid < np_tokens:
        col = jax.lax.broadcasted_iota(jnp.int32,
                                       (np_tokens, np_tokens), 1)
        energy = jnp.where(col < n_valid, energy, -jnp.inf)
    # reference semantics: plain softmax, no 1/sqrt(d) scaling
    energy = energy - jnp.max(energy, axis=-1, keepdims=True)
    p = jnp.exp(energy)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(
        out_ref.dtype)


def _attention_fwd_pallas(q: jax.Array, k: jax.Array,
                          v: jax.Array) -> jax.Array:
    b, n, d = q.shape
    c = v.shape[-1]
    n_pad = _round_up(n, LANE)
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    out = pl.pallas_call(
        functools.partial(_attention_kernel, n),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * n_pad * (d + c),
            bytes_accessed=b * n_pad * (2 * d + 2 * c) * 4,
            transcendentals=b * n_pad * n_pad,
        ),
    )(q, k, v)
    return out[:, :n, :]


def _attention_reference(q, k, v):
    energy = jnp.einsum("bqd,bkd->bqk", q, k,
                        preferred_element_type=jnp.float32)
    p = jax.nn.softmax(energy, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkc->bqc", p, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


@jax.custom_vjp
def cross_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """softmax(q @ k^T) @ v over tokens (no scaling — reference-exact)."""
    return _attention_fwd_pallas(q, k, v)


def _fwd(q, k, v):
    return _attention_fwd_pallas(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    energy = jnp.einsum("bqd,bkd->bqk", qf, kf)
    p = jax.nn.softmax(energy, axis=-1)
    dv = jnp.einsum("bqk,bqc->bkc", p, gf)
    dp = jnp.einsum("bqc,bkc->bqk", gf, vf)
    de = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq = jnp.einsum("bqk,bkd->bqd", de, kf)
    dk = jnp.einsum("bqk,bqd->bkd", de, qf)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


cross_attention.defvjp(_fwd, _bwd)
