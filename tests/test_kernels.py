"""Pallas kernels: numeric parity vs XLA reference (interpret mode on CPU)."""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Run Pallas kernels in interpreter mode on the CPU test backend."""
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def test_cross_attention_matches_xla():
    from calipsync_tpu.kernels.cross_attention import (_attention_reference,
                                                       cross_attention)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((3, 100, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 100, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((3, 100, 512)).astype(np.float32))

    out = cross_attention(q, k, v)
    ref = _attention_reference(q, k, v)
    assert out.shape == (3, 100, 512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_cross_attention_grads_match_xla():
    from calipsync_tpu.kernels.cross_attention import (_attention_reference,
                                                       cross_attention)

    rng = np.random.default_rng(1)
    # moderate logit scale: with unscaled (no 1/sqrt(d)) attention, unit-
    # normal q/k make the softmax near-one-hot and ulp noise dominates grads
    q = jnp.asarray(0.2 * rng.standard_normal((2, 100, 64)).astype(
        np.float32))
    k = jnp.asarray(0.2 * rng.standard_normal((2, 100, 64)).astype(
        np.float32))
    v = jnp.asarray(rng.standard_normal((2, 100, 512)).astype(np.float32))

    def loss_pallas(q, k, v):
        return jnp.sum(jnp.square(cross_attention(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(_attention_reference(q, k, v)))

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape,stride", [
    ((2, 160, 160, 12), 1),   # InConvDw depthwise (expand 6*2)
    ((2, 80, 80, 64), 2),     # Down stage
    ((1, 10, 10, 1024), 1),   # fuse_conv stage
    ((1, 32, 32, 64), 1),     # audio encoder
    ((1, 21, 33, 40), 2),     # odd spatial + non-aligned channels
])
def test_depthwise3x3_matches_xla(shape, stride):
    from calipsync_tpu.kernels.depthwise import (depthwise3x3,
                                                 depthwise3x3_reference)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    c = shape[-1]
    k = jnp.asarray(rng.standard_normal((3, 3, c)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))

    out = depthwise3x3(x, k, s, b, stride=stride)
    ref = depthwise3x3_reference(x, k, s, b, stride=stride)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_depthwise_fold_bn_matches_batchnorm():
    from calipsync_tpu.kernels.depthwise import (depthwise3x3_reference,
                                                 fold_bn)

    rng = np.random.default_rng(1)
    c = 16
    x = jnp.asarray(rng.standard_normal((1, 8, 8, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, c)).astype(np.float32))
    bn_p = {"scale": rng.standard_normal(c).astype(np.float32),
            "bias": rng.standard_normal(c).astype(np.float32)}
    bn_s = {"mean": rng.standard_normal(c).astype(np.float32),
            "var": (rng.random(c) + 0.5).astype(np.float32)}
    s, b = fold_bn(bn_p, bn_s)
    fused = depthwise3x3_reference(x, k, s, b, apply_act=False)

    conv = depthwise3x3_reference(x, k, apply_act=False)
    manual = ((np.asarray(conv) - bn_s["mean"])
              / np.sqrt(bn_s["var"] + 1e-5) * bn_p["scale"] + bn_p["bias"])
    np.testing.assert_allclose(np.asarray(fused), manual, rtol=1e-4,
                               atol=1e-5)


def test_generator_with_pallas_attention_matches_xla_impl():
    """Full generator forward: attn_impl='pallas' == attn_impl='xla'."""
    from calipsync_tpu.nn.unet import Generator

    x = jnp.asarray(np.random.default_rng(2).random(
        (1, 160, 160, 6), dtype=np.float32))
    a = jnp.asarray(np.random.default_rng(3).random(
        (1, 32, 32, 32), dtype=np.float32))
    base = Generator(attn_impl="xla")
    variables = jax.jit(base.init)(jax.random.key(0), x, a)
    out_xla = base.apply(variables, x, a, train=False)
    out_pl = Generator(attn_impl="pallas").apply(variables, x, a,
                                                 train=False)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-5)


def test_fused_ir_matches_flax_block():
    """Fused IR kernel == flax InvertedResidual (eval), fp32, randomized
    BN stats, incl. multi-row-block halo paths (KERNELS_r03 kernel)."""
    from calipsync_tpu.kernels.fused_ir import (fold_ir_params,
                                                fused_inverted_residual)
    from calipsync_tpu.nn.blocks import InvertedResidual

    rng = np.random.default_rng(0)
    cases = [  # (B, H, W, Cin, features, residual, block_h)
        (2, 16, 16, 8, 8, True, None),
        (2, 10, 10, 16, 8, False, None),
        (1, 20, 16, 4, 4, True, 4),
        (2, 16, 12, 8, 8, True, 2),
    ]
    for b, h, w, cin, feat, res, bh in cases:
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(
            np.float32))
        mod = InvertedResidual(feat, stride=1, use_res_connect=res,
                               expand_ratio=2)
        variables = mod.init(jax.random.key(0), jnp.zeros((1, h, w, cin)))
        stats = jax.tree.map(
            lambda a: a + 0.3 * jnp.asarray(
                rng.standard_normal(a.shape), a.dtype) ** 2,
            variables["batch_stats"])
        variables = {"params": variables["params"], "batch_stats": stats}
        want = jax.jit(partial(mod.apply, train=False))(variables, x)
        folded = fold_ir_params(variables["params"],
                                variables["batch_stats"])
        got = fused_inverted_residual(x, *folded, residual=res, block_h=bh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=str((b, h, w, cin, feat, res)))


def test_fused_ir_bf16_close_to_flax():
    from calipsync_tpu.kernels.fused_ir import (fold_ir_params,
                                                fused_inverted_residual)
    from calipsync_tpu.nn.blocks import InvertedResidual

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.bfloat16)
    mod = InvertedResidual(8, stride=1, use_res_connect=True,
                           expand_ratio=2, dtype=jnp.bfloat16)
    variables = mod.init(jax.random.key(0), jnp.zeros((1, 16, 16, 8)))
    want = np.asarray(jax.jit(partial(mod.apply, train=False))(
        variables, x)).astype(np.float32)
    folded = fold_ir_params(variables["params"], variables["batch_stats"])
    got = np.asarray(fused_inverted_residual(
        x, *folded, residual=True)).astype(np.float32)
    # one-ulp bf16 tolerance: the fold pre-multiplies BN scale into the
    # conv weights, so rounding points differ from conv-then-BN
    assert np.max(np.abs(got - want)) < 0.05, np.max(np.abs(got - want))


def test_double_conv_ir_impl_pallas_matches_xla():
    """DoubleConvDW with ir_impl='pallas' == 'xla' above the size gate."""
    from calipsync_tpu.nn.blocks import PALLAS_IR_MIN_HW, DoubleConvDW

    h, w = 48, 40
    assert h * w >= PALLAS_IR_MIN_HW
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, h, w, 8)).astype(np.float32))
    base = DoubleConvDW(8, stride=1)
    variables = base.init(jax.random.key(0), jnp.zeros((1, h, w, 8)))
    want = jax.jit(partial(base.apply, train=False))(variables, x)
    got = jax.jit(partial(DoubleConvDW(8, stride=1, ir_impl="pallas").apply,
                          train=False))(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    # train mode must keep the flax path (batch-stat updates + autodiff)
    out, mutated = DoubleConvDW(8, stride=1, ir_impl="pallas").apply(
        variables, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mutated
