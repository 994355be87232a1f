"""Expert parallelism (core/ep.py): routing oracle, dense parity, EP == 1-dev.

The reference has no MoE (its models are dense); EP is a framework
capability completing the parallelism axes, so the golden standard here
is (a) a per-token numpy oracle of the Switch top-1 routing + GShard
capacity semantics, (b) exact degeneration to the dense FeedForward at
num_experts=1, and (c) the shard_map all_to_all executor matching the
single-device math bit-for-bit-ish (fp reassociation only).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from calipsync_tpu.core.ep import (MoEEncoderLayer, MoEFeedForward, capacity,
                                   ep_param_specs, init_moe_params, moe_ffn,
                                   moe_ffn_ep, upcycle_ffn_to_moe)
from calipsync_tpu.nn.hubert import (EncoderLayer, FeedForward, HubertConfig,
                                     gelu)

CFG = HubertConfig(hidden_size=16, num_hidden_layers=2,
                   num_attention_heads=2, intermediate_size=32,
                   do_stable_layer_norm=True)


def _params(key, hidden=16, inter=32, experts=4):
    return init_moe_params(jax.random.key(key), hidden, inter, experts)


def _oracle(params, x, capacity_factor, groups):
    """Per-token loop implementing the documented routing semantics."""
    p = jax.tree.map(np.asarray, params)
    hidden = x.shape[-1]
    tokens = np.asarray(x, np.float32).reshape(-1, hidden)
    n_g = tokens.shape[0] // groups
    e = p["router"].shape[1]
    cap = capacity(n_g, e, capacity_factor)
    y = np.zeros_like(tokens)
    for g in range(groups):
        counts = np.zeros(e, np.int64)
        for i in range(n_g):
            t = tokens[g * n_g + i]
            logits = t @ p["router"]
            probs = np.exp(logits - logits.max())
            probs /= probs.sum()
            eix = int(np.argmax(probs))
            if counts[eix] >= cap:
                continue
            counts[eix] += 1
            h = np.asarray(gelu(jnp.asarray(t @ p["w_in"][eix]
                                            + p["b_in"][eix])))
            y[g * n_g + i] = probs[eix] * (h @ p["w_out"][eix]
                                           + p["b_out"][eix])
    return y.reshape(x.shape)


def test_moe_matches_routing_oracle():
    """Dense-einsum dispatch/combine == per-token oracle, including
    capacity drops (cf=0.5 forces overflow at 12 tokens / 3 experts)."""
    params = init_moe_params(jax.random.key(0), 16, 32, 3)
    x = jax.random.normal(jax.random.key(1), (2, 6, 16), jnp.float32)
    got = jax.jit(lambda p, v: moe_ffn(p, v, capacity_factor=0.5,
                                       groups=2))(params, x)
    want = _oracle(params, x, 0.5, groups=2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
    # the capacity really dropped something (else the test is vacuous)
    full = moe_ffn(params, x, capacity_factor=4.0, groups=2)
    assert not np.allclose(np.asarray(got), np.asarray(full))


def test_single_expert_equals_dense_ffn():
    """E=1 upcycled MoE == nn/hubert.py FeedForward exactly (softmax over
    one logit is 1.0 and capacity >= tokens at cf>=1)."""
    ffn = FeedForward(CFG)
    x = jax.random.normal(jax.random.key(2), (3, 5, 16), jnp.float32)
    vs = ffn.init(jax.random.key(3), x)
    moe_params = upcycle_ffn_to_moe(vs["params"], 1, jax.random.key(4))
    got = jax.jit(lambda p, v: moe_ffn(p, v, capacity_factor=1.25))(
        moe_params, x)
    want = jax.jit(ffn.apply)(vs, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_upcycled_experts_scale_by_gate():
    """E identical experts: output == gate * dense(x) for every token (no
    drops at high capacity), the Switch scaling contract."""
    ffn = FeedForward(CFG)
    x = jax.random.normal(jax.random.key(5), (4, 16), jnp.float32)
    vs = ffn.init(jax.random.key(6), x)
    moe_params = upcycle_ffn_to_moe(vs["params"], 4, jax.random.key(7))
    dense = np.asarray(jax.jit(ffn.apply)(vs, x))
    probs = jax.jit(lambda p, v: jax.nn.softmax(v @ p["router"], axis=-1))(
        moe_params, x)
    gate = np.asarray(jnp.max(probs, axis=-1))
    got = np.asarray(jax.jit(
        lambda p, v: moe_ffn(p, v, capacity_factor=4.0))(moe_params, x))
    np.testing.assert_allclose(got, gate[:, None] * dense,
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n_dev", [4, 8])
def test_ep_matches_single_device(n_dev):
    """shard_map all_to_all EP over n_dev devices == moe_ffn(groups=n_dev)."""
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual device mesh")
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("expert",))
    params = init_moe_params(jax.random.key(8), 16, 32, 8)
    x = jax.random.normal(jax.random.key(9), (n_dev * 6, 16), jnp.float32)
    want = moe_ffn(params, x, capacity_factor=1.0, groups=n_dev)
    got = jax.jit(lambda p, v: moe_ffn_ep(p, v, mesh, "expert",
                                          capacity_factor=1.0))(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_gspmd_sharded_params_match():
    """moe_ffn under jit with ep_param_specs-placed params (the
    MoEFeedForward deployment path: GSPMD derives the collectives) ==
    unsharded run."""
    n_dev = 4
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual device mesh")
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("expert",))
    params = init_moe_params(jax.random.key(10), 16, 32, 8)
    x = jax.random.normal(jax.random.key(11), (24, 16), jnp.float32)
    want = moe_ffn(params, x, capacity_factor=1.25, groups=4)
    placed = jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
        params, ep_param_specs("expert"))
    got = jax.jit(lambda p, v: moe_ffn(p, v, capacity_factor=1.25,
                                       groups=4))(placed, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_moe_encoder_layer_dense_parity():
    """MoEEncoderLayer(E=1) == EncoderLayer with the same attention/LN
    params and the FFN upcycled — both norm modes."""
    for stable in (True, False):
        cfg = HubertConfig(hidden_size=16, num_hidden_layers=2,
                           num_attention_heads=2, intermediate_size=32,
                           do_stable_layer_norm=stable)
        x = jax.random.normal(jax.random.key(12), (2, 7, 16), jnp.float32)
        dense = EncoderLayer(cfg)
        vd = dense.init(jax.random.key(13), x)
        moe = MoEEncoderLayer(cfg, num_experts=1, capacity_factor=1.25)
        pd = dict(vd["params"])
        moe_ffn_params = upcycle_ffn_to_moe(pd.pop("feed_forward"), 1,
                                            jax.random.key(14))
        pm = {**pd, "moe": moe_ffn_params}
        got = jax.jit(moe.apply)({"params": pm}, x)
        want = jax.jit(dense.apply)(vd, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_moe_bf16_computes_at_bf16():
    """bf16 tokens run the expert matmuls at bf16 (routing stays fp32):
    output dtype is bf16 and values track the fp32 run at bf16 tolerance
    — the repo's 'compute dtype per-config' convention (CLAUDE.md)."""
    params = init_moe_params(jax.random.key(20), 16, 32, 4)
    x = jax.random.normal(jax.random.key(21), (8, 16), jnp.float32)
    f32 = jax.jit(lambda p, v: moe_ffn(p, v, capacity_factor=2.0))(params, x)
    bf16 = jax.jit(lambda p, v: moe_ffn(p, v, capacity_factor=2.0))(
        params, x.astype(jnp.bfloat16))
    assert bf16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(bf16, np.float32),
                               np.asarray(f32), rtol=0.05, atol=0.05)
    # routing itself is dtype-independent: the same experts were picked
    # (outputs are nonzero in the same token rows)
    nz32 = np.abs(np.asarray(f32)).sum(-1) > 0
    nzbf = np.abs(np.asarray(bf16, np.float32)).sum(-1) > 0
    assert (nz32 == nzbf).all()


def test_moe_feed_forward_module_trains():
    """MoEFeedForward params live in the flax tree and carry gradients
    (router included), so the layer trains/checkpoints like the rest."""
    m = MoEFeedForward(CFG, num_experts=4, groups=1)
    x = jax.random.normal(jax.random.key(15), (8, 16), jnp.float32)
    vs = m.init(jax.random.key(16), x)

    def loss(p):
        return jnp.mean(m.apply({"params": p}, x) ** 2)

    g = jax.jit(jax.grad(loss))(vs["params"])
    leaves = {k: float(jnp.sum(jnp.abs(v)))
              for k, v in jax.tree.leaves_with_path(g)
              for k, v in [("/".join(str(q) for q in k), v)]}
    nonzero = [k for k, v in leaves.items() if v > 0]
    assert any("w_in" in k for k in nonzero)
    assert any("router" in k for k in nonzero), leaves
