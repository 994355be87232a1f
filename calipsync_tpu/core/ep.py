"""Expert parallelism: MoE feed-forward sharded over an ``expert`` axis.

The reference system has no mixture-of-experts (its largest model,
HuBERT-large, is dense — /root/reference/utils/hubert_extractor.py:5-11),
so this module is a framework capability, not a ported component: it
completes the parallelism axes (DP/TP/PP/SP in core/mesh.py, core/tp.py,
core/pp.py) with EP, the axis you reach for when scaling the audio
encoder's FFN capacity without scaling per-token FLOPs.

Design (GShard dispatch, Switch top-1 routing), TPU-first:

  - Routing, dispatch and combine are DENSE one-hot einsums over a
    static per-group capacity C — no gathers with data-dependent shapes,
    so the whole layer jits to static-shape MXU work.
  - ``moe_ffn`` is the single-device semantics: tokens are split into G
    groups, each group routes independently with capacity
    ``ceil(capacity_factor * tokens_per_group / E)``; over-capacity
    tokens contribute zero (the caller's residual keeps them).
  - ``moe_ffn_ep`` executes the same math over a named mesh axis of
    size S with ``shard_map``: each device owns one token group and
    E/S experts; one ``all_to_all`` carries dispatched tokens to their
    expert's device and a second carries outputs back — the canonical
    EP collective pattern, riding ICI.

Exactness: ``moe_ffn_ep`` on S devices equals ``moe_ffn(groups=S)``
bit-for-bit modulo fp reassociation; with ``num_experts=1`` the layer
equals the dense ``nn/hubert.py`` FeedForward exactly (softmax over one
logit is 1.0). Both are asserted in tests/test_ep.py.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P

from calipsync_tpu.nn.hubert import HubertConfig, gelu


def init_moe_params(key: jax.Array, hidden: int, intermediate: int,
                    num_experts: int) -> dict:
    """Parameter pytree for a top-1 MoE FFN.

    Experts are stacked on a leading ``(E, ...)`` axis so a mesh can
    shard them (same layout trick as core/pp.py's layer stack).
    """
    kr, ki, ko = jax.random.split(key, 3)
    scale_in = 1.0 / math.sqrt(hidden)
    scale_out = 1.0 / math.sqrt(intermediate)
    return {
        "router": jax.random.normal(kr, (hidden, num_experts),
                                    jnp.float32) * 0.02,
        "w_in": jax.random.uniform(ki, (num_experts, hidden, intermediate),
                                   jnp.float32, -scale_in, scale_in),
        "b_in": jnp.zeros((num_experts, intermediate), jnp.float32),
        "w_out": jax.random.uniform(ko, (num_experts, intermediate, hidden),
                                    jnp.float32, -scale_out, scale_out),
        "b_out": jnp.zeros((num_experts, hidden), jnp.float32),
    }


def upcycle_ffn_to_moe(ffn_params: dict, num_experts: int,
                       key: jax.Array) -> dict:
    """Sparse-upcycle a dense FeedForward (nn/hubert.py:188-199 layout)
    into E identical experts with a fresh (near-uniform) router."""
    w_in = jnp.broadcast_to(ffn_params["intermediate_dense"]["kernel"][None],
                            (num_experts,
                             *ffn_params["intermediate_dense"]["kernel"].shape))
    w_out = jnp.broadcast_to(ffn_params["output_dense"]["kernel"][None],
                             (num_experts,
                              *ffn_params["output_dense"]["kernel"].shape))
    hidden = w_in.shape[1]
    return {
        "router": jax.random.normal(key, (hidden, num_experts),
                                    jnp.float32) * 0.02,
        "w_in": jnp.asarray(w_in),
        "b_in": jnp.broadcast_to(ffn_params["intermediate_dense"]["bias"][None],
                                 (num_experts, w_in.shape[2])) + 0.0,
        "w_out": jnp.asarray(w_out),
        "b_out": jnp.broadcast_to(ffn_params["output_dense"]["bias"][None],
                                  (num_experts, hidden)) + 0.0,
    }


def capacity(tokens_per_group: int, num_experts: int,
             capacity_factor: float) -> int:
    return max(1, math.ceil(capacity_factor * tokens_per_group / num_experts))


def _route(tokens: jax.Array, router: jax.Array, cap: int):
    """Top-1 routing for one group: (dispatch (n,E,C), gate (n,)).

    Routing math runs in fp32 regardless of the compute dtype (the
    standard MoE numerics split: a bf16 softmax can flip argmaxes), but
    the returned dispatch tensor is cast to the token dtype so the
    dispatch/combine einsums and the expert matmuls downstream run at
    the repo's compute dtype (CLAUDE.md: bf16 serving) on the MXU."""
    probs = jax.nn.softmax(tokens.astype(jnp.float32) @ router, axis=-1)
    eidx = jnp.argmax(probs, axis=-1)                      # (n,)
    gate = jnp.take_along_axis(probs, eidx[:, None], -1)[:, 0]
    onehot = jax.nn.one_hot(eidx, router.shape[1], dtype=jnp.int32)
    pos = (jnp.cumsum(onehot, axis=0) - 1) * onehot        # 0-based slot
    pos_tok = jnp.sum(pos, axis=-1)                        # (n,)
    keep = pos_tok < cap
    dispatch = (jax.nn.one_hot(eidx, router.shape[1])
                * keep[:, None].astype(jnp.float32))[:, :, None] \
        * jax.nn.one_hot(pos_tok, cap)[:, None, :]
    return dispatch.astype(tokens.dtype), gate.astype(tokens.dtype)


def _experts_apply(expert_in: jax.Array, params: dict) -> jax.Array:
    """(E, C, H) -> (E, C, H): each expert's FFN on its capacity rows,
    computed at the activation dtype (params cast down, flax-Dense
    style)."""
    dt = expert_in.dtype
    h = gelu(jnp.einsum("ech,ehf->ecf", expert_in,
                        params["w_in"].astype(dt))
             + params["b_in"].astype(dt)[:, None, :])
    return (jnp.einsum("ecf,efh->ech", h, params["w_out"].astype(dt))
            + params["b_out"].astype(dt)[:, None, :])


def _moe_group(tokens: jax.Array, params: dict, cap: int) -> jax.Array:
    dispatch, gate = _route(tokens, params["router"], cap)
    expert_in = jnp.einsum("nec,nh->ech", dispatch, tokens)
    out = _experts_apply(expert_in, params)
    return jnp.einsum("nec,ech->nh", dispatch * gate[:, None, None], out)


def moe_ffn(params: dict, x: jax.Array, *, capacity_factor: float = 1.25,
            groups: int = 1) -> jax.Array:
    """Single-device MoE FFN on ``x`` of shape (..., hidden).

    ``groups`` fixes the routing granularity: tokens are flattened and
    split into G equal groups, each routed with its own capacity — G
    must match the device count of any EP run this is compared against
    (capacity is per-group, so G changes which tokens drop).
    """
    lead, hidden = x.shape[:-1], x.shape[-1]
    tokens = x.reshape(-1, hidden)
    n = tokens.shape[0]
    if n % groups:
        raise ValueError(f"{n} tokens not divisible into {groups} groups")
    e = params["router"].shape[1]
    cap = capacity(n // groups, e, capacity_factor)
    grouped = tokens.reshape(groups, n // groups, hidden)
    y = jax.vmap(lambda t: _moe_group(t, params, cap))(grouped)
    return y.reshape(*lead, hidden).astype(x.dtype)


def moe_ffn_ep(params: dict, x: jax.Array, mesh: Mesh, axis: str = "expert",
               *, capacity_factor: float = 1.25) -> jax.Array:
    """Expert-parallel MoE FFN over ``mesh.shape[axis]`` devices.

    Token groups shard over ``axis`` (one group per device) and so do
    the expert stacks (E/S experts per device); router weights are
    replicated. Dispatched capacity rows ride one ``all_to_all`` out to
    their expert's device and one back — each device runs ONLY its own
    experts' matmuls, which is the EP FLOP win.
    """
    s = mesh.shape[axis]
    e = params["router"].shape[1]
    if e % s:
        raise ValueError(f"{e} experts not divisible over {axis}={s}")
    lead, hidden = x.shape[:-1], x.shape[-1]
    tokens = x.reshape(-1, hidden)
    n = tokens.shape[0]
    if n % s:
        raise ValueError(f"{n} tokens not divisible over {axis}={s}")
    cap = capacity(n // s, e, capacity_factor)
    grouped = tokens.reshape(s, n // s, hidden)

    def shard_fn(tg, router, w_in, b_in, w_out, b_out):
        tg = tg[0]                                         # (n/S, H)
        dispatch, gate = _route(tg, router, cap)
        expert_in = jnp.einsum("nec,nh->ech", dispatch, tg)
        # (E, C, H) -> (E/S, S*C, H): device d keeps experts
        # [d*E/S, (d+1)*E/S) and receives their capacity rows from
        # every group; rows [g*C, (g+1)*C) came from group g.
        expert_in = jax.lax.all_to_all(
            expert_in.reshape(s, e // s, cap, hidden), axis,
            split_axis=0, concat_axis=1, tiled=False).reshape(
                e // s, s * cap, hidden)
        local = {"w_in": w_in, "b_in": b_in, "w_out": w_out, "b_out": b_out}
        out = _experts_apply(expert_in, local)
        # inverse all_to_all: send each group's C rows home, rebuild
        # the (E, C, H) buffer in expert order.
        out = jax.lax.all_to_all(
            out.reshape(e // s, s, cap, hidden), axis,
            split_axis=1, concat_axis=0, tiled=False)
        out = out.reshape(e, cap, hidden)
        y = jnp.einsum("nec,ech->nh", dispatch * gate[:, None, None], out)
        return y[None]

    espec = P(axis)                                        # experts shard
    y = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(), espec, espec, espec, espec),
        out_specs=P(axis), check_vma=False)(
            grouped, params["router"], params["w_in"], params["b_in"],
            params["w_out"], params["b_out"])
    return y.reshape(*lead, hidden).astype(x.dtype)


def ep_param_specs(axis: str = "expert") -> dict:
    """PartitionSpecs matching init_moe_params' layout (router replicated,
    expert stacks sharded on their leading E axis) — for device_put
    placement before jit, mirroring core/tp.py's contract."""
    return {
        "router": P(),
        "w_in": P(axis), "b_in": P(axis),
        "w_out": P(axis), "b_out": P(axis),
    }


class MoEFeedForward(nn.Module):
    """Drop-in MoE replacement for nn/hubert.py's FeedForward.

    Holds the stacked-expert params as flax params (so they train and
    checkpoint like everything else) and applies ``moe_ffn``; EP
    placement is done by sharding the param pytree with
    :func:`ep_param_specs` — GSPMD then executes the einsums with the
    same all_to_all pattern ``moe_ffn_ep`` spells out explicitly.
    """
    config: HubertConfig
    num_experts: int = 8
    capacity_factor: float = 1.25
    groups: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        params = {
            "router": self.param(
                "router", nn.initializers.normal(0.02),
                (cfg.hidden_size, self.num_experts), jnp.float32),
            "w_in": self.param(
                "w_in", nn.initializers.lecun_uniform(),
                (self.num_experts, cfg.hidden_size, cfg.intermediate_size),
                jnp.float32),
            "b_in": self.param(
                "b_in", nn.initializers.zeros,
                (self.num_experts, cfg.intermediate_size), jnp.float32),
            "w_out": self.param(
                "w_out", nn.initializers.lecun_uniform(),
                (self.num_experts, cfg.intermediate_size, cfg.hidden_size),
                jnp.float32),
            "b_out": self.param(
                "b_out", nn.initializers.zeros,
                (self.num_experts, cfg.hidden_size), jnp.float32),
        }
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return moe_ffn(params, x, capacity_factor=self.capacity_factor,
                       groups=self.groups)


class MoEEncoderLayer(nn.Module):
    """nn/hubert.py EncoderLayer with the FFN swapped for MoE.

    Same pre/post-LN wiring as EncoderLayer (nn/hubert.py:202-222); with
    ``num_experts=1`` it reproduces the dense layer exactly (tested).
    """
    config: HubertConfig
    num_experts: int = 8
    capacity_factor: float = 1.25
    groups: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array,
                 key_mask: Optional[jax.Array] = None) -> jax.Array:
        from calipsync_tpu.nn.hubert import SelfAttention

        cfg = self.config
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=self.dtype, name=name)
        moe = MoEFeedForward(cfg, self.num_experts, self.capacity_factor,
                             self.groups, self.dtype, name="moe")
        if cfg.do_stable_layer_norm:
            x = x + SelfAttention(cfg, self.dtype, name="attention")(
                ln("layer_norm")(x), key_mask)
            x = x + moe(ln("final_layer_norm")(x))
        else:
            x = ln("layer_norm")(x + SelfAttention(
                cfg, self.dtype, name="attention")(x, key_mask))
            x = ln("final_layer_norm")(x + moe(x))
        return x
