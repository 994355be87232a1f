"""Pipeline-parallel HuBERT encoder over a named mesh axis (GPipe).

HuBERT-large's 24 transformer layers hold >90% of its 315M parameters;
the reference runs the whole model on one GPU
(/root/reference/utils/hubert_extractor.py:5-11). Tensor parallelism
(core/tp.py) shards each layer's matmuls; pipeline parallelism instead
shards LAYERS: over a named ``model`` mesh axis of size S, stage ``s``
holds layers ``[s*L/S, (s+1)*L/S)`` and activations hop stage→stage over
ICI with ``ppermute`` on a GPipe microbatch schedule. PP trades TP's two
all-reduces per layer for one neighbour hop per stage — the right choice
when the batch is deep enough to amortise the ``S-1`` bubble ticks and
the interconnect is point-to-point-cheap (ICI rings).

TPU-native shape: the WHOLE schedule — ``M + S - 1`` pipeline ticks,
each running that stage's local ``lax.scan`` over its layer slice — is
one jitted XLA program (a ``lax.scan`` inside ``shard_map``); no
per-tick host round trips, static shapes throughout. The layer stack is
stored as one stacked ``(L, ...)`` pytree whose leading axis is sharded
over the mesh, so each chip materialises only its own ``L/S`` layers.

Exactness: microbatching is over the batch axis only and every
microbatch runs the same layers in the same order, so the result equals
the sequential encoder bit-for-bit modulo fp reassociation (parity is
asserted at fp32 tolerances in tests/test_pp.py, both norm modes, with
and without bucket-pad masking).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P

from calipsync_tpu.nn.hubert import (ConvFeatureExtractor, EncoderLayer,
                                     FeatureProjection, HubertConfig,
                                     PositionalConvEmbedding)


def stack_encoder_layers(variables: dict) -> dict:
    """Stack the encoder's per-layer param subtrees into one (L, ...) pytree.

    The ``layers_i`` subtrees of ``nn/hubert.py``'s encoder are
    structurally identical; stacking gives every leaf a leading layer
    axis that a mesh can shard (PP here; the same layout serves a
    scanned/remat encoder).
    """
    enc = variables["params"]["encoder"]
    n = sum(1 for k in enc if k.startswith("layers_"))
    layers = [enc[f"layers_{i}"] for i in range(n)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def hubert_pp_apply(config: HubertConfig, variables: dict, wav: jax.Array,
                    mesh: Mesh, axis: str = "model",
                    num_microbatches: Optional[int] = None,
                    num_valid_frames: Optional[jax.Array] = None,
                    dtype: Optional[Any] = None,
                    data_axis: Optional[str] = None) -> jax.Array:
    """HuBERT forward with the encoder layer stack pipelined over ``axis``.

    Matches ``HubertModel.apply`` (nn/hubert.py:246-273) including the
    bucket-padded masking contract. The conv frontend, feature
    projection, positional conv and final norm stay replicated (they are
    <10% of parameters and run once per clip).

    Args:
      config: HubertConfig; ``num_hidden_layers`` must divide evenly
        into ``mesh.shape[axis]`` stages.
      variables: flax variables from ``HubertModel.init`` /
        ``import_hubert``.
      wav: (B, num_samples) normalized waveform; B must divide into
        ``num_microbatches``.
      num_microbatches: GPipe microbatch count M (default: one per
        stage); must be a multiple of S — the input stream is sharded
        over stages, M/S microbatches per device, and ring-shifted to
        stage 0 one per tick. Bubble fraction is (S-1)/(M+S-1).
      num_valid_frames: optional (B,) true-frame counts, same semantics
        as ``HubertModel.__call__``.
      data_axis: optional second mesh axis carrying DATA parallelism
        OVER the pipeline: each data shard runs the full GPipe schedule
        on its 1/D of every microbatch, layers replicated across it —
        the DP(hosts) x PP(stages) composition a multi-host serving
        deployment uses (VERDICT r4 #8). Per-shard batch B/M must
        divide by ``mesh.shape[data_axis]``. The pipeline body is
        unchanged: DP needs no cross-shard communication, so the only
        difference is the in/out shardings.
    """
    S = mesh.shape[axis]
    p = variables["params"]
    enc = p["encoder"]
    L = sum(1 for k in enc if k.startswith("layers_"))
    if L % S:
        raise ValueError(f"{L} layers not divisible by {S} stages")
    M = int(num_microbatches or S)
    B = wav.shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    if M % S:
        raise ValueError(f"{M} microbatches not divisible by {S} stages "
                         "(the input stream shards over stages)")

    # Replicated frontend (mirrors HubertModel.__call__ order).
    x = ConvFeatureExtractor(config, dtype).apply(
        {"params": p["feature_extractor"]}, wav)
    x = FeatureProjection(config, dtype).apply(
        {"params": p["feature_projection"]}, x)
    key_mask = None
    if num_valid_frames is not None:
        frames = x.shape[1]
        key_mask = (jnp.arange(frames)[None, :]
                    < num_valid_frames[:, None])
        x = jnp.where(key_mask[..., None], x, 0.0)
    x = x + PositionalConvEmbedding(config, dtype).apply(
        {"params": enc["pos_conv_embed"]}, x)
    ln = nn.LayerNorm(epsilon=config.layer_norm_eps, dtype=dtype)
    if not config.do_stable_layer_norm:
        x = ln.apply({"params": enc["layer_norm"]}, x)

    stacked = stack_encoder_layers(variables)  # (L, ...) leaves
    mb = x.reshape(M, B // M, *x.shape[1:])
    mb_mask = (None if key_mask is None
               else key_mask.reshape(M, B // M, key_mask.shape[1]))
    layer = EncoderLayer(config, dtype)

    def run_stage(local_layers, h, km):
        def body(h, lp):
            return layer.apply({"params": lp}, h, km), None
        h, _ = jax.lax.scan(body, h, local_layers)
        return h

    fwd = [(i, i + 1) for i in range(S - 1)]
    back = [(i, i - 1) for i in range(1, S)]

    def pipelined(local_layers, local_mb, mb_mask):
        # local_layers: this stage's (L/S, ...) slice. local_mb: its
        # (M/S, B/M, F, H) slice of the microbatch stream — stage s
        # holds global microbatches [s*M/S, (s+1)*M/S), NOT a full
        # replica; each tick the stream shifts one microbatch toward
        # stage 0 over ICI (one extra ppermute, S x less input memory).
        # Only the per-frame bool mask stays replicated (it is tiny).
        # GPipe: stage s processes microbatch m at tick m + s.
        sidx = jax.lax.axis_index(axis)

        def tick(carry, t):
            h, inbuf, acc = carry
            # After t ring shifts the global stream is
            # [m_t, ..., m_{M-1}, 0...]: stage 0's head IS microbatch t
            # (zeros once t >= M — those ticks' outputs can only reach
            # stage S-1 after the schedule ends, so they never land in
            # a valid output slot).
            h_in = jnp.where(sidx == 0, inbuf[0], h)
            # The activation arrived by ppermute; its mask is
            # recomputed from the microbatch id this stage holds now.
            km = None
            if mb_mask is not None:
                km = jax.lax.dynamic_index_in_dim(
                    mb_mask, jnp.clip(t - sidx, 0, M - 1), axis=0,
                    keepdims=False)
            h_out = run_stage(local_layers, h_in, km)
            # Input ring shift: send my head back, append the next
            # stage's head (stage S-1 appends ppermute zeros).
            recv = jax.lax.ppermute(inbuf[0], axis, back)
            inbuf = jnp.concatenate([inbuf[1:], recv[None]], axis=0)
            # Stage S-1 finished microbatch t-(S-1) this tick: record
            # it in the accumulator (other stages write their own slot
            # back unchanged — a no-op update keeps shapes static).
            m_out = t - (S - 1)
            slot = jnp.clip(m_out, 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(acc, slot, 0,
                                               keepdims=False)
            write = jnp.logical_and(sidx == S - 1, m_out >= 0)
            acc = jax.lax.dynamic_update_index_in_dim(
                acc, jnp.where(write, h_out, cur), slot, 0)
            return (jax.lax.ppermute(h_out, axis, fwd), inbuf, acc), None

        acc0 = jnp.zeros((M,) + local_mb.shape[1:], local_mb.dtype)
        (_, _, acc), _ = jax.lax.scan(
            tick, (jnp.zeros_like(local_mb[0]), local_mb, acc0),
            jnp.arange(M + S - 1))
        # Only stage S-1 wrote acc (everyone else carried zeros): the
        # psum is a broadcast replicating the result to every stage —
        # the replicated-output contract of this function.
        return jax.lax.psum(acc, axis)

    if data_axis is not None:
        D = mesh.shape[data_axis]
        if (B // M) % D:
            raise ValueError(f"per-microbatch batch {B // M} not "
                             f"divisible by data axis {D}")
        in_specs = (P(axis), P(axis, data_axis), P(None, data_axis))
        out_specs = P(None, data_axis)
    else:
        in_specs = (P(axis), P(axis), P())
        out_specs = P()
    out = jax.shard_map(pipelined, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs, check_vma=False)(
        stacked, mb, mb_mask)
    x = out.reshape(B, *x.shape[1:])
    if config.do_stable_layer_norm:
        x = ln.apply({"params": enc["layer_norm"]}, x)
    return x
